#!/usr/bin/env bash
# Segment-clearance fine-tune A/B (round-3 continuation, follows ft6).
#
# r3_ft6_bankx's reject profile at full bank diversity is dominated by
# segment collisions (76 of 157; bonds 65): the mix term's point-
# repulsion hinge cannot see two segments crossing BETWEEN sample
# points. ft7 = ft6 + the sampled segment-segment clearance hinge on mix
# decodes (ops/losses.segment_repulsion_loss, mix_seg_weight=1.0 — the
# differentiable counterpart of filtering.segment_clash_count).
#
#   1. train ft7 (warm-start ft6, 40 ep on the 11,468-curve union corpus)
#   2. re-extract BOTH banks with the ft7 checkpoint, merge, retrain the
#      OT potential (bank latents must come from the deciding checkpoint)
#   3. run the IDENTICAL 400k end2end -> results/aeot_runs/r3_ft7_bankx
#
# Compare vs r3_ft6_bankx (92.2% keep; seg 76, bond 65) and r3_ft5_bankx
# (95.0% keep at 10,290 unique candidates).

set -u
ROOT="$(cd "$(dirname "${BASH_SOURCE[0]}")/.." && pwd)"
cd "${ROOT}"
mkdir -p logs
. scripts/lib_lock.sh
acquire_lock logs/.bankx_ft7_r3.lock.d || {
  echo "[ft7] another instance running; exiting"; exit 1; }
LOG=logs/bankx_ft7_r3.log
echo "[ft7] start $(date -u +%FT%TZ)" >> "${LOG}"

[ -e checkpoints/synth_ae_ft6/last ] || {
  echo "[ft7] missing checkpoints/synth_ae_ft6/last (run bankx_ft6_r3.sh)" >> "${LOG}"; exit 1; }
[ -e data/synth_curves_union/train_list.txt ] || {
  echo "[ft7] missing union corpus (run bankx_ft6_r3.sh first)" >> "${LOG}"; exit 1; }

bash scripts/retry_train.sh configs/synth_ae_ft7.yaml \
  checkpoints/synth_ae_ft7 "${LOG}" \
  --warm_start_ckpt checkpoints/synth_ae_ft6/last || exit 1

CKPT=checkpoints/synth_ae_ft7/last
CFG=configs/synth_ae_ft7.yaml

retry () {  # retry <n> <sleep_s> <cmd...>
  local n="$1" s="$2"; shift 2
  for try in $(seq 1 "${n}"); do
    "$@" >> "${LOG}" 2>&1 && return 0
    echo "[ft7] attempt ${try} of $* failed; sleep ${s}s" >> "${LOG}"
    sleep "${s}"
  done
  return 1
}

[ -e results/synth_latents_r3f7e.npz ] || retry 3 120 \
  python scripts/extract_ae_latents.py --config "${CFG}" --ckpt "${CKPT}" \
    --out results/synth_latents_r3f7e.npz --len_min 1 --len_max 96 \
    --npy_dir data/synth_curves || exit 1

[ -e results/synth_latents_r3f7x.npz ] || retry 3 120 \
  python scripts/extract_ae_latents.py --config "${CFG}" --ckpt "${CKPT}" \
    --out results/synth_latents_r3f7x.npz --len_min 1 --len_max 96 \
    --npy_dir data/synth_curves_bankx || exit 1

[ -e results/synth_latents_r3f7m.npz ] || retry 1 1 \
  python scripts/analysis/merge_latent_banks.py \
    --banks results/synth_latents_r3f7e.npz results/synth_latents_r3f7x.npz \
    --out results/synth_latents_r3f7m.npz || exit 1

[ -e results/synth_h_r3f7m.npz ] || retry 3 120 \
  python scripts/train_ot_potential.py \
    --features results/synth_latents_r3f7m.npz \
    --out results/synth_h_r3f7m.npz || exit 1

[ -e results/aeot_runs/r3_ft7_bankx/summary.json ] || retry 3 120 \
  python scripts/run_aeot_end2end.py \
    --ae_config "${CFG}" --ae_ckpt "${CKPT}" \
    --features_pt results/synth_latents_r3f7m.npz \
    --ot_h results/synth_h_r3f7m.npz \
    --out_root results/aeot_runs --run_name r3_ft7_bankx \
    --n_generate 2000 --select_random --seed 42 \
    --num_gen_x 400000 --ot_bat_size_n 10000 --ot_thresh 0.3 \
    --decode_batch_size 128 --min_length 32 \
    --min_pairwise_dist 2.0 --neighbor_exclude 2 || exit 1

echo "[ft7] done $(date -u +%FT%TZ)" >> "${LOG}"
cat results/aeot_runs/r3_ft7_bankx/summary.json 2>/dev/null
