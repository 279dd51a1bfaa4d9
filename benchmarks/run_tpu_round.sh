#!/bin/bash
# Sequential TPU measurement round: run each step ALONE (the axon tunnel
# serializes concurrent TPU processes and doubles latencies — see
# CLAUDE.md), with generous timeouts (tunnel latency swings 3x+) and
# -k 9 on the kills (a process stuck in a tunnel read ignores SIGTERM).
#
# Usage: bash benchmarks/run_tpu_round.sh [outdir]
set -u
cd "$(dirname "$0")/.."
OUT=${1:-/tmp/tpu_round_$(date +%H%M)}
mkdir -p "$OUT"
echo "logging to $OUT"

step() {
  local name=$1 tmo=$2; shift 2
  echo "=== $name ($(date +%H:%M:%S)) ==="
  timeout -k 10 "$tmo" "$@" > "$OUT/$name.log" 2>&1
  local rc=$?
  tail -3 "$OUT/$name.log"
  echo "--- $name rc=$rc"
}

# 1. smoke: every Pallas kernel on the chip (jacobi incl. n=700 warm +
#    complex, DC preconditioner, structured CG, tridiag, fused CG)
step smoke 1200 python benchmarks/tpu_smoke.py

# 2. DC hardware validation: G-invariant floors, guard behavior,
#    warm-vs-cold-vs-XLA throughput (VERDICT r2 item 1)
step dc_validate 2400 python benchmarks/dc_validate.py

# 3. BASELINE config 2 + gen_m + svd suites, with the torch reference
#    timed on the same matrices (VERDICT r2 items 4a, 6)
step symeig 2400 python benchmarks/bench_symeig.py --with-ref

# 4. the 12 single-matrix symeig grid points vs the torch reference
step grid_symeig 3600 python benchmarks/benchmarks_solve.py \
  --suite symeig --amortize 8 --out "$OUT/results_symeig_grid.jsonl"

# 5. mcquad multi-chain MH on the chip (VERDICT r2 item 4b)
step mcquad 1200 python benchmarks/bench_mcquad.py

# 6. TPU perf floors re-baseline (VERDICT r2 item 2b)
step floors 1800 python benchmarks/check_tpu_floors.py --update

# 7. headline sanity (driver metric)
step headline 1800 python bench.py

echo "done: $OUT"
