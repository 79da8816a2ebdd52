#!/bin/bash
# Hardware measurement batch for a TPU-tunnel window.  Runs the highest-
# value measurements first (HEAD validation, then A/Bs), one TPU process
# at a time, everything under timeout, appending to the log.
# Usage: bash scripts/hw_session.sh [logfile]
LOG=${1:-/tmp/hw_session.log}
cd /root/repo || exit 1
export PYTHONPATH=/root/.axon_site:/root/repo

run() {
  echo "=== $(date +%H:%M:%S) $*" >> "$LOG"
  timeout "$T" "$@" >> "$LOG" 2>&1
  echo "--- exit $? ---" >> "$LOG"
}

echo "###### hw session start $(date) ######" >> "$LOG"

# 0. probe
T=60 run python -c "
import jax, jax.numpy as jnp
a = jnp.ones((256,256)); print('probe ok', float((a@a)[0,0]), jax.devices()[0].device_kind)"
grep -q "probe ok" "$LOG" || { echo "probe failed, aborting" >> "$LOG"; exit 1; }

# 1. validate HEAD on the driver's default bench (poisson3d mixed)
T=400 run python bench.py --reps 5
# 2. the modified 2D kernels end-to-end
T=400 run python bench.py --problem lyapunov2d --reps 5
# 3. ode1d sanity
T=300 run python bench.py --problem ode1d --reps 5
# 4. T A/B with fits (validated 2026-08-19: T=8 won; default now 8)
T=1200 run python scripts/ab_split2d_t.py 2049 5 4 8
# 5. MIN_Y2 A/B (validated 2026-08-19: 256 won; default now 256)
T=900 run python scripts/ab_split2d_min_y2.py 2049 8 512 256
# 6. component breakdown
T=900 run python scripts/profile_lyap.py 2049 100
# 7. 257^3 with exact coarsest
T=600 run python bench.py --n 257 --nu 20 --reps 3
# 8. poisson fit (fixed/slope) for the record
T=900 run python scripts/fit_problem.py poisson3d 129 5
# 9. defect v_zero A/B (validated 2026-08-19: identical residual, perf
#    at parity; default is now ON — this re-checks on new hardware)
T=800 run python scripts/ab_defect_vzero.py 129 100 10

echo "###### hw session end $(date) ######" >> "$LOG"
