"""Generated protobuf bindings (see index.proto; regenerate with
``protoc --python_out=gulon_tpu/proto --proto_path=gulon_tpu/proto
gulon_tpu/proto/index.proto``)."""
