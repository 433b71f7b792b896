#!/usr/bin/env bash
set -euo pipefail

# One-click single-chip generator wrapper.
# Counterpart of the reference scripts/run_aeot_oneclick_single_gpu.sh
# (same chained invocation with environment-default artifacts; TPU chip
# selection replaces CUDA_VISIBLE_DEVICES — JAX binds the tunneled chip).
#
# Usage:
#   bash scripts/run_aeot_oneclick.sh /abs/path/to/ae_ckpt [run_name]
#
# Environment overrides:
#   AE_CONFIG   (default configs/synth_ae.yaml)
#   FEATURES_PT (default results/synth_latents.npz)
#   OT_H        (default results/synth_h.npz)
#   OUT_ROOT    (default results/aeot_runs)
#   N_GENERATE  (default 2000)

AE_CKPT="${1:-}"
RUN_NAME="${2:-quick_recall}"

ROOT="$(cd "$(dirname "${BASH_SOURCE[0]}")/.." && pwd)"
AE_CONFIG="${AE_CONFIG:-${ROOT}/configs/synth_ae.yaml}"
FEATURES_PT="${FEATURES_PT:-${ROOT}/results/synth_latents.npz}"
OT_H="${OT_H:-${ROOT}/results/synth_h.npz}"
OUT_ROOT="${OUT_ROOT:-${ROOT}/results/aeot_runs}"
N_GENERATE="${N_GENERATE:-2000}"

if [[ -z "${AE_CKPT}" ]]; then
  echo "Usage: bash scripts/run_aeot_oneclick.sh /abs/path/to/ae_ckpt [run_name]"
  exit 1
fi
if [[ ! -e "${AE_CKPT}" ]]; then
  echo "AE checkpoint not found: ${AE_CKPT}"
  exit 1
fi
if [[ ! -e "${FEATURES_PT}" ]]; then
  echo "latent bank not found: ${FEATURES_PT} (set FEATURES_PT=...)"
  exit 1
fi
if [[ ! -e "${OT_H}" ]]; then
  echo "OT potential not found: ${OT_H} (set OT_H=..., or train one with"
  echo "  python scripts/train_ot_potential.py --features ${FEATURES_PT}" \
       "--out ${OT_H})"
  exit 1
fi

cd "${ROOT}"
python scripts/run_aeot_end2end.py \
  --ae_config "${AE_CONFIG}" \
  --ae_ckpt "${AE_CKPT}" \
  --features_pt "${FEATURES_PT}" \
  --ot_h "${OT_H}" \
  --out_root "${OUT_ROOT}" \
  --run_name "${RUN_NAME}" \
  --n_generate "${N_GENERATE}" \
  --num_gen_x 50000 \
  --ot_bat_size_n 10000 \
  --ot_thresh 0.3 \
  --decode_batch_size 128 \
  --min_length 2 \
  --min_pairwise_dist 2.0 \
  --neighbor_exclude 2 \
  --select_random \
  --seed 42
