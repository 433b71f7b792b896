#!/usr/bin/env bash
# Training-only rebuild of the round-3 stage-1 checkpoint line after a
# machine recycle (checkpoints/, data/, logs/ are gitignored and die with
# the machine), followed by the pending worst-pair A/B.
#
#   corpora  seed 7 (3276/820) + seed 11 bankx (8192) + union (list files)
#   base     configs/synth_ae.yaml      260 ep   from scratch
#   ft2      configs/synth_ae_ft2.yaml  100 ep   warm-start base
#   ft5      configs/synth_ae_ft5.yaml   80 ep   warm-start ft2
#   ft6      configs/synth_ae_ft6.yaml   40 ep   warm-start ft5 (union)
#   ft7      configs/synth_ae_ft7.yaml   40 ep   warm-start ft6 (union)
#   then ->  scripts/worstpair_ab_r3.sh  (ft7b control + ft8 treatment,
#            each with its own bank re-extraction + 400k end2end)
#
# Deliberately SKIPS the intermediate evals (r3_ft2b/r3_ft5/r3_ft6_bankx/
# r3_ft7_bankx evidence is already committed); the A/B is self-contained
# (ft7b is the control arm), so the rebuilt line only needs to reach ft7.
# Every leg runs under scripts/retry_train.sh (tunnel-outage resume).

set -u
ROOT="$(cd "$(dirname "${BASH_SOURCE[0]}")/.." && pwd)"
cd "${ROOT}"
mkdir -p logs
. scripts/lib_lock.sh
acquire_lock logs/.rebuild_line_r3.lock.d || {
  echo "[rebuild] another instance running; exiting"; exit 1; }
LOG=logs/rebuild_line_r3.log
echo "[rebuild] start $(date -u +%FT%TZ)" >> "${LOG}"

# --- deterministic corpora ---------------------------------------------
if [ ! -e data/synth_curves/train_list.txt ]; then
  python -c "
from pytorch_vae_tpu.data.synthetic import make_synthetic_curve_dir
make_synthetic_curve_dir('data/synth_curves', n_train=3276, n_val=820,
                         seed=7, min_len=48, max_len=96)" >> "${LOG}" 2>&1 || exit 1
fi
if [ ! -e data/synth_curves_bankx/train_list.txt ]; then
  python -c "
from pytorch_vae_tpu.data.synthetic import make_synthetic_curve_dir
make_synthetic_curve_dir('data/synth_curves_bankx', n_train=8192, n_val=8,
                         seed=11, min_len=48, max_len=96)" >> "${LOG}" 2>&1 || exit 1
fi
if [ ! -e data/synth_curves_union/train_list.txt ]; then
  mkdir -p data/synth_curves_union
  ( sed 's|^|../synth_curves/|' data/synth_curves/train_list.txt
    sed 's|^|../synth_curves_bankx/|' data/synth_curves_bankx/train_list.txt
  ) > data/synth_curves_union/train_list.txt
  sed 's|^|../synth_curves/|' data/synth_curves/val_list.txt \
    > data/synth_curves_union/val_list.txt
  echo "[rebuild] union corpus: $(wc -l < data/synth_curves_union/train_list.txt) train curves" >> "${LOG}"
fi

train_leg () {  # train_leg <config> <ckpt_dir> [warm_start_dir]
  local cfg="$1" ckpt="$2" warm="${3:-}"
  if [ -e "${ckpt}/last/_CHECKPOINT_METADATA" ] \
     && grep -q "completed" "${ckpt}/.done" 2>/dev/null; then
    echo "[rebuild] ${ckpt} already complete; skipping" >> "${LOG}"
    return 0
  fi
  if [ -n "${warm}" ]; then
    bash scripts/retry_train.sh "${cfg}" "${ckpt}" "${LOG}" \
      --warm_start_ckpt "${warm}/last" || return 1
  else
    bash scripts/retry_train.sh "${cfg}" "${ckpt}" "${LOG}" || return 1
  fi
  echo "completed $(date -u +%FT%TZ)" > "${ckpt}/.done"
}

train_leg configs/synth_ae.yaml     checkpoints/synth_ae                            || exit 1
train_leg configs/synth_ae_ft2.yaml checkpoints/synth_ae_ft2 checkpoints/synth_ae     || exit 1
train_leg configs/synth_ae_ft5.yaml checkpoints/synth_ae_ft5 checkpoints/synth_ae_ft2 || exit 1
train_leg configs/synth_ae_ft6.yaml checkpoints/synth_ae_ft6 checkpoints/synth_ae_ft5 || exit 1
train_leg configs/synth_ae_ft7.yaml checkpoints/synth_ae_ft7 checkpoints/synth_ae_ft6 || exit 1

echo "[rebuild] line complete; handing off to worstpair_ab_r3 $(date -u +%FT%TZ)" >> "${LOG}"
bash scripts/worstpair_ab_r3.sh >> "${LOG}" 2>&1
echo "[rebuild] all done $(date -u +%FT%TZ)" >> "${LOG}"
