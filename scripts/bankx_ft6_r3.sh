#!/usr/bin/env bash
# Union-corpus fine-tune A/B (round-3 bank-growth follow-up).
#
# scripts/bank_growth_r3.sh established that merging an extraction-only
# corpus into the OT bank lifts unique candidates 1,871 -> 10,290 (5.5x)
# but costs ~2 pp keep (95.0 vs 97.4%, bond_out 12 -> 44): extraction-
# corpus cells sit slightly off the training manifold, so mixes involving
# them decode with worse bonds. Hypothesis: fine-tuning ON the union
# corpus (configs/synth_ae_ft6.yaml, warm-start ft5, weights pinned)
# re-centers the mix-geometry regularizer on the full bank and recovers
# the keep-rate at full diversity.
#
#   1. build data/synth_curves_union (list-file indirection over the two
#      corpora; both are deterministic — seeds 7 and 11, len 48-96)
#   2. train ft6 (40 ep on 11,468 curves ~= ft5's 80 ep on 3,276)
#   3. re-extract BOTH banks with the ft6 checkpoint, merge, retrain the
#      OT potential (bank latents must come from the deciding checkpoint)
#   4. run the identical 400k end2end -> results/aeot_runs/r3_ft6_bankx
#
# Compare vs r3_ft5_bankx (95.0% keep, bond_out 44, seg 51) at the same
# candidate diversity. Control lines already committed.

set -u
ROOT="$(cd "$(dirname "${BASH_SOURCE[0]}")/.." && pwd)"
cd "${ROOT}"
mkdir -p logs
. scripts/lib_lock.sh
acquire_lock logs/.bankx_ft6_r3.lock.d || {
  echo "[ft6] another instance running; exiting"; exit 1; }
LOG=logs/bankx_ft6_r3.log
echo "[ft6] start $(date -u +%FT%TZ)" >> "${LOG}"

[ -e checkpoints/synth_ae_ft5/last ] || {
  echo "[ft6] missing checkpoints/synth_ae_ft5/last (run bank_growth_r3.sh)" >> "${LOG}"; exit 1; }

# --- deterministic corpora (regenerate after machine recycling) --------
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
  echo "[ft6] union corpus: $(wc -l < data/synth_curves_union/train_list.txt) train curves" >> "${LOG}"
fi

bash scripts/retry_train.sh configs/synth_ae_ft6.yaml \
  checkpoints/synth_ae_ft6 "${LOG}" \
  --warm_start_ckpt checkpoints/synth_ae_ft5/last || exit 1

CKPT=checkpoints/synth_ae_ft6/last
CFG=configs/synth_ae_ft6.yaml

retry () {  # retry <n> <sleep_s> <cmd...>
  local n="$1" s="$2"; shift 2
  for try in $(seq 1 "${n}"); do
    "$@" >> "${LOG}" 2>&1 && return 0
    echo "[ft6] attempt ${try} of $* failed; sleep ${s}s" >> "${LOG}"
    sleep "${s}"
  done
  return 1
}

[ -e results/synth_latents_r3f6e.npz ] || retry 3 120 \
  python scripts/extract_ae_latents.py --config "${CFG}" --ckpt "${CKPT}" \
    --out results/synth_latents_r3f6e.npz --len_min 1 --len_max 96 \
    --npy_dir data/synth_curves || exit 1

[ -e results/synth_latents_r3f6x.npz ] || retry 3 120 \
  python scripts/extract_ae_latents.py --config "${CFG}" --ckpt "${CKPT}" \
    --out results/synth_latents_r3f6x.npz --len_min 1 --len_max 96 \
    --npy_dir data/synth_curves_bankx || exit 1

[ -e results/synth_latents_r3f6m.npz ] || retry 1 1 \
  python scripts/analysis/merge_latent_banks.py \
    --banks results/synth_latents_r3f6e.npz results/synth_latents_r3f6x.npz \
    --out results/synth_latents_r3f6m.npz || exit 1

[ -e results/synth_h_r3f6m.npz ] || retry 3 120 \
  python scripts/train_ot_potential.py \
    --features results/synth_latents_r3f6m.npz \
    --out results/synth_h_r3f6m.npz || exit 1

[ -e results/aeot_runs/r3_ft6_bankx/summary.json ] || retry 3 120 \
  python scripts/run_aeot_end2end.py \
    --ae_config "${CFG}" --ae_ckpt "${CKPT}" \
    --features_pt results/synth_latents_r3f6m.npz \
    --ot_h results/synth_h_r3f6m.npz \
    --out_root results/aeot_runs --run_name r3_ft6_bankx \
    --n_generate 2000 --select_random --seed 42 \
    --num_gen_x 400000 --ot_bat_size_n 10000 --ot_thresh 0.3 \
    --decode_batch_size 128 --min_length 32 \
    --min_pairwise_dist 2.0 --neighbor_exclude 2 || exit 1

echo "[ft6] done $(date -u +%FT%TZ)" >> "${LOG}"
cat results/aeot_runs/r3_ft6_bankx/summary.json 2>/dev/null
