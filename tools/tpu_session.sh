#!/bin/bash
# One-command TPU measurement session (run when the axon tunnel is up).
# Order matters: correctness gate first, then tuning sweeps (which persist
# winners into icicle_tpu/data/msm_tuning.json), then headline benches.
# Every MSM timing inside is bit-exactness-gated against a host oracle.
#
#   PYTHONPATH=/root/repo:/root/.axon_site bash tools/tpu_session.sh
#
# Logs to /tmp/tpu_session_<ts>.log; safe to re-run (compile caches persist).
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH=${PYTHONPATH:-/root/repo:/root/.axon_site}
LOG=/tmp/tpu_session_$(date +%s).log
echo "logging to $LOG"

run() {
  echo "=== $*" | tee -a "$LOG"
  "$@" 2>&1 | tee -a "$LOG"
}

# 0. device sanity
run python -c "import jax; print(jax.devices())"

# 1. quick correctness gate at 2^16 (v3 u32): fast fail if kernels broke
run env TUNE_LOGNS=16 TUNE_CS=14 TUNE_TS=4096 TUNE_PIPE=v3:u32 \
    python tools/msm_autotune.py

# 2. tuning sweeps: v3 u32 at 2^20/2^24, nu=1
run env TUNE_LOGNS=20,24 TUNE_CS=12,14,16 TUNE_TS=4096,8192 TUNE_PIPE=v3:u32 \
    python tools/msm_autotune.py

# 3. precompute sweeps (nu=4): fewer windows, needs explicit c
run env TUNE_LOGNS=20,24 TUNE_CS=14,16 TUNE_TS=4096,8192 TUNE_PIPE=v3:u32 \
    TUNE_NU=4 python tools/msm_autotune.py

# 4. r12 engine comparison at 2^20
run env TUNE_LOGNS=20 TUNE_CS=12,14 TUNE_TS=4096 TUNE_PIPE=v3:r12 \
    python tools/msm_autotune.py

# 5. headline benches (driver configs)
run env BENCH_KERNEL=ntt BENCH_LOGN=26 python bench.py
run env BENCH_KERNEL=msm BENCH_LOGN=24 python bench.py

# 6. best-of: if the tuning table now holds a nu=4 winner, bench it
best=$(python - <<'EOF'
from icicle_tpu.ops.msm_tuning import tuned_params
tp = tuned_params("v3:u32", "bn254", 1 << 24, 4)
print(f"{tp['c']}" if tp else "")
EOF
)
if [ -n "$best" ]; then
  run env BENCH_KERNEL=msm BENCH_LOGN=24 BENCH_MSM_NU=4 BENCH_MSM_C="$best" \
      python bench.py
fi

echo "=== session done; review $LOG and commit icicle_tpu/data/msm_tuning.json"
