#!/bin/sh
# One-shot TPU perf session (docs/PERF.md queued measurements).
# Run from the repo root on a healthy TPU; tees everything to
# /tmp/tpu_perf_session.log.  ~30-60 min total.
set -x
cd "$(dirname "$0")/.." || exit 1
export PYTHONPATH="$PWD:/root/.axon_site"
{
  echo "=== ab_fft (transpose-free A/B) ==="
  timeout 1800 python tools/ab_fft.py --lines 32768 --n 3
  echo "=== stage_split ==="
  timeout 1800 python tools/stage_split.py --lines 32768 --n 5
  echo "=== ablate_remap ==="
  timeout 1800 python tools/ablate_remap.py --lines 32768 --n 5
  echo "=== ablate_remap --register ==="
  timeout 1800 python tools/ablate_remap.py --register --lines 32768 --n 3
  echo "=== bench (32768) ==="
  timeout 1800 env OIP_BENCH_DEADLINE=1500 python bench.py
  echo "=== bench (65536, stage-granular software pipelining) ==="
  timeout 2700 env OIP_BENCH_LINES=65536 OIP_BENCH_DEADLINE=2200 python bench.py
} 2>&1 | tee /tmp/tpu_perf_session.log
