#!/bin/bash
# Round-5 TPU measurement session: W=26 window-formula numbers, GLV and
# precompute (nu) measured entries, winner at 2^24, headline bench.
# Every timed point is bit-exactness-gated (tools/msm_autotune.py).
#
#   PYTHONPATH=/root/repo:/root/.axon_site bash tools/tpu_session5.sh
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH=${PYTHONPATH:-/root/repo:/root/.axon_site}
LOG=/tmp/tpu_session5_$(date +%s).log
echo "logging to $LOG"

run() {
  echo "=== $*" | tee -a "$LOG"
  "$@" 2>&1 | tee -a "$LOG"
}

run python -c "import jax; print(jax.devices())"

# 1. correctness gate at 2^16 (fast fail if the W=26 change broke the chip
#    path; CPU tests already pass)
run env TUNE_LOGNS=16 TUNE_CS=10 TUNE_TS=4096 TUNE_PIPE=v3:r12 \
    python tools/msm_autotune.py

# 2. nu=1 r12 sweep at 2^20: c=10 (W=26, the r4 winner shape), c=11 (W=24),
#    c=12 (W=22) — larger c trades scan slots against extraction M
run env TUNE_LOGNS=20 TUNE_CS=10,11,12 TUNE_TS=4096 TUNE_PIPE=v3:r12 \
    python tools/msm_autotune.py

# 3. GLV toggle, measured honestly (slot-neutral analysis: performance.md)
run env TUNE_LOGNS=20 TUNE_CS=10,12 TUNE_TS=4096 TUNE_PIPE=v3:r12 \
    TUNE_GLV=1 python tools/msm_autotune.py

# 4. precompute nu=2/nu=4 (digit-remap merge; measured honestly)
run env TUNE_LOGNS=20 TUNE_CS=12 TUNE_TS=4096 TUNE_PIPE=v3:r12 TUNE_NU=2 \
    python tools/msm_autotune.py
run env TUNE_LOGNS=20 TUNE_CS=13 TUNE_TS=4096 TUNE_PIPE=v3:r12 TUNE_NU=4 \
    python tools/msm_autotune.py

# 5. best-of sweep at 2^24 with the 2^20 winner (edit after step 2-4 if a
#    non-default c wins): default-table path
run env TUNE_LOGNS=24 TUNE_CS=10,11 TUNE_TS=4096 TUNE_PIPE=v3:r12 \
    python tools/msm_autotune.py

# 6. headline bench lines (tuning table picks the plan)
run python bench.py

echo "session log: $LOG"
