#!/usr/bin/env bash
# Outage-tolerant TPU training wrapper.
#
# The axon TPU tunnel intermittently drops for minutes-to-hours (one
# measured outage >5 h; every backend init died UNAVAILABLE). Training
# checkpoints `last` every epoch, so the safe pattern is: run, and on any
# non-zero exit re-invoke with --resume_ckpt once a checkpoint exists.
# This wrapper loops that until the run completes or the attempt budget
# is exhausted.
#
# Usage:
#   bash scripts/retry_train.sh <config.yaml> <ckpt_dir> <logfile> \
#       [extra run.py args for the FIRST attempt only, e.g. --warm_start_ckpt ...]
#
# Retries always use --resume_ckpt (resume disables warm-start by design,
# run.py:15-16) so a mid-run crash never re-applies the warm start.
#
# Hardening (learned the hard way, r3):
# - Holds an flock on <ckpt_dir>.lock: two wrappers on one checkpoint dir
#   race orbax's delete+rename of `last` (truncated-Zstd restores,
#   FileNotFoundError mid-rename) and can reset a 200-epoch run to scratch.
# - Resume prefers `last` only when its _CHECKPOINT_METADATA exists (a
#   crash mid-save leaves a bare last.orbax-checkpoint-tmp, or worse a
#   partial dir); otherwise falls back to the NEWEST epochNNN keep-all
#   checkpoint. From-scratch happens only when no checkpoint exists at all.

set -u
CONFIG="$1"; CKPT_DIR="$2"; LOG="$3"; shift 3
FIRST_ARGS=("$@")
MAX_ATTEMPTS="${MAX_ATTEMPTS:-30}"
SLEEP_S="${SLEEP_S:-120}"

. "$(dirname "${BASH_SOURCE[0]}")/lib_lock.sh"
if ! acquire_lock "${CKPT_DIR}.lock.d"; then
  echo "[retry_train] another wrapper holds ${CKPT_DIR}.lock.d; refusing" >> "${LOG}"
  exit 1
fi

pick_resume () {
  if [ -e "${CKPT_DIR}/last/_CHECKPOINT_METADATA" ]; then
    echo "${CKPT_DIR}/last"
    return
  fi
  ls -d "${CKPT_DIR}"/epoch* 2>/dev/null | sort -V | tail -1 || true
}

for attempt in $(seq 1 "${MAX_ATTEMPTS}"); do
  RESUME="$(pick_resume)"
  if [ -n "${RESUME}" ]; then
    ARGS=(--resume_ckpt "${RESUME}")
  else
    ARGS=("${FIRST_ARGS[@]+"${FIRST_ARGS[@]}"}")
  fi
  echo "[retry_train] attempt ${attempt}: python run.py -c ${CONFIG} ${ARGS[*]:-}" >> "${LOG}"
  # -u: unbuffered stdout — block buffering makes the log lag many minutes
  # behind real progress when redirected to a file
  python -u run.py -c "${CONFIG}" "${ARGS[@]+"${ARGS[@]}"}" >> "${LOG}" 2>&1
  rc=$?
  if [ $rc -eq 0 ]; then
    echo "[retry_train] completed on attempt ${attempt}" >> "${LOG}"
    # Golden export after EVERY completed leg (VERDICT r4 #5): the best
    # state must survive machine recycling even when the next chain leg
    # never runs. CPU process — avoids the 200-870s TPU backend init —
    # and never fails the chain.
    FINAL="$(pick_resume)"
    GOLD="golden/$(basename "${CKPT_DIR}").npz"
    if [ -n "${FINAL}" ]; then
      env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu PVT_NO_COMPILE_CACHE=1 \
        python scripts/export_golden.py --ckpt "${FINAL}" \
          --config "${CONFIG}" --out "${GOLD}" >> "${LOG}" 2>&1 \
        && echo "[retry_train] golden exported: ${GOLD}" >> "${LOG}" \
        || echo "[retry_train] WARNING: golden export failed (non-fatal)" >> "${LOG}"
    fi
    exit 0
  fi
  echo "[retry_train] exit ${rc}; sleeping ${SLEEP_S}s before resume" >> "${LOG}"
  sleep "${SLEEP_S}"
done
echo "[retry_train] attempt budget exhausted" >> "${LOG}"
exit 1
