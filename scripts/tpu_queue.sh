#!/bin/bash
# Run every TPU-gated benchmark sequentially once the tunnel is back.
# ONE process at a time: the remote compile helper serializes jobs, and
# parallel TPU-compiling processes queue 3-minute compiles into 20+.
#
#   bash scripts/tpu_queue.sh [logdir]
set -u
cd "$(dirname "$0")/.."
# scripts/*.py import frosting_tpu from the repo root; `python scripts/foo.py`
# puts scripts/ (not cwd) on sys.path, so the repo root must be added
# explicitly — WITHOUT clobbering the axon plugin path already there.
export PYTHONPATH="$PWD${PYTHONPATH:+:$PYTHONPATH}"
LOG=${1:-/tmp/tpu_queue}
mkdir -p "$LOG"

probe() {
  timeout 90 python -c "import jax; assert jax.devices()[0].platform != 'cpu'" 2>/dev/null
}

echo "[queue] probing tunnel..."
if ! probe; then
  echo "[queue] TPU tunnel not reachable; aborting" >&2
  exit 1
fi
echo "[queue] tunnel OK"

run() {
  name=$1; shift
  echo "[queue] === $name: $* ==="
  if command -v /usr/bin/time >/dev/null; then
    /usr/bin/time -v "$@" > "$LOG/$name.log" 2>&1
  else
    "$@" > "$LOG/$name.log" 2>&1
  fi
  rc=$?
  tail -3 "$LOG/$name.log"
  echo "[queue] $name exit=$rc"
}

# 1. Shelly-style object pipeline at full budgets (BASELINE config 3)
#    -> SHELLY_BENCH.json (longest: full 5-stage pipeline; FIRST because
#    it is the gating artifact)
run shelly timeout 14000 python scripts/benchmark_shelly.py
# 2. flagship bench (the driver-visible number)
run bench timeout 3000 python bench.py
# 3. occlusion-culled 2M refine step (BASELINE config 4) -> REFINE2M.json
run refine2m timeout 5400 python scripts/bench_refine2m.py
# 4. 1080p @ 1M production-scale raster -> BENCH_1080P.json
run bench1080 timeout 3000 python scripts/bench_1080p.py
# 5. full 3DGS 7k recipe, SOLO wall-clock -> PSNR_BENCH.json
run psnr timeout 5400 python scripts/benchmark_psnr.py
# 6. full-res extraction (auto Poisson depth -> 512^3 on host FFT)
#    -> EXTRACT_BENCH.json
run extract timeout 7200 python scripts/extract_fullres.py
echo "[queue] all done; artifacts: SHELLY_BENCH.json REFINE2M.json BENCH_1080P.json PSNR_BENCH.json EXTRACT_BENCH.json + $LOG/bench.log"
