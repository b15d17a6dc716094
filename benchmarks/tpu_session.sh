#!/bin/bash
# Round-4 TPU measurement session (run when the tunnel is up).
# One TPU process at a time; each step logs to $OUT. Order = capture
# priority under an uncertain tunnel window (it flaps for hours):
#   1. full bench.py matrix with a long manual deadline (VERDICT items
#      2/8) — also primes .jax_cache so the driver's end-of-round
#      1380 s run captures the matrix warm (item 1's artifact)
#   2. g300_quality: post-tie-break-fix bisection + the DEFAULT
#      (auto-knob) FlatIndex measurement (item 3 acceptance)
#   3. decode-mode A/B (item 4): base / pipe / bf16cmp / take /
#      pipe+bf16cmp — novel kernels, 20-40 min tunnel compiles each,
#      so they run last where a mid-session outage costs least
set -u
OUT=${OUT:-/tmp/tpu_session}
mkdir -p "$OUT"
cd "$(dirname "$0")/.."

run() {  # run <name> <timeout_s> <cmd...>
  local name=$1 to=$2; shift 2
  echo "=== $name ($(date +%H:%M:%S)) ==="
  timeout "$to" "$@" >"$OUT/$name.log" 2>&1
  echo "--- rc=$? tail:"; tail -25 "$OUT/$name.log"
}

run bench_full       4400 env GULON_BENCH_DEADLINE_S=4200 python bench.py

run g300_quality     2400 python benchmarks/g300_quality.py

# XLA-only noise bisection of the g300 gap (no novel kernel compiles)
run g300_bisect      2400 python benchmarks/g300_bisect.py

run decode_base      1800 python benchmarks/kernel_ab.py decode
run decode_pipe      1800 env GULON_ADC_PIPE=1 \
    python benchmarks/kernel_ab.py decode
run decode_bf16cmp   1800 env GULON_ADC_DECODE=bf16cmp \
    python benchmarks/kernel_ab.py decode
run decode_take      1800 env GULON_ADC_DECODE=take \
    python benchmarks/kernel_ab.py decode
run decode_pipe_bf16 1800 env GULON_ADC_PIPE=1 GULON_ADC_DECODE=bf16cmp \
    python benchmarks/kernel_ab.py decode

echo "=== session done ($(date +%H:%M:%S)) ==="
