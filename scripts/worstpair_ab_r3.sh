#!/usr/bin/env bash
# Worst-pair collision-term A/B (round-3 continuation, follows ft7).
#
# ft7's segment-clearance hinge measured flat at ~4e-5 during training
# (mean dilution over ~(P*S)^2/2 sample pairs) and segment_collision
# stayed the top generation rejector (r3_ft7_bankx: 89 of 171). Arms:
#
#   ft7b  CONTROL: second 40-ep leg of the exact ft7 recipe
#   ft8   TREATMENT: same leg + per-curve worst-pair terms on both mix
#         repulsion hinges (mix_rep_max_weight=1.0, mix_seg_max_weight=1.0)
#
# Both warm-start checkpoints/synth_ae_ft7/last, identical data/seed.
# Each arm: re-extract both banks with its checkpoint, merge, retrain OT
# potential, run the IDENTICAL 400k end2end. Primary metric:
# segment_collision + point_collision rejects; keep-rate secondary.

set -u
ROOT="$(cd "$(dirname "${BASH_SOURCE[0]}")/.." && pwd)"
cd "${ROOT}"
mkdir -p logs
. scripts/lib_lock.sh
acquire_lock logs/.worstpair_ab_r3.lock.d || {
  echo "[wp] another instance running; exiting"; exit 1; }
LOG=logs/worstpair_ab_r3.log
echo "[wp] start $(date -u +%FT%TZ)" >> "${LOG}"

[ -e checkpoints/synth_ae_ft7/last ] || {
  echo "[wp] missing checkpoints/synth_ae_ft7/last" >> "${LOG}"; exit 1; }

retry () {  # retry <n> <sleep_s> <cmd...>
  local n="$1" s="$2"; shift 2
  for try in $(seq 1 "${n}"); do
    "$@" >> "${LOG}" 2>&1 && return 0
    echo "[wp] attempt ${try} of $* failed; sleep ${s}s" >> "${LOG}"
    sleep "${s}"
  done
  return 1
}

for ARM in ft7b ft8; do
  CFG="configs/synth_ae_${ARM}.yaml"
  CKPT="checkpoints/synth_ae_${ARM}/last"
  TAG="r3f_${ARM}"

  bash scripts/retry_train.sh "${CFG}" "checkpoints/synth_ae_${ARM}" \
    "${LOG}" --warm_start_ckpt checkpoints/synth_ae_ft7/last || exit 1

  [ -e "results/synth_latents_${TAG}e.npz" ] || retry 3 120 \
    python scripts/extract_ae_latents.py --config "${CFG}" --ckpt "${CKPT}" \
      --out "results/synth_latents_${TAG}e.npz" --len_min 1 --len_max 96 \
      --npy_dir data/synth_curves || exit 1

  [ -e "results/synth_latents_${TAG}x.npz" ] || retry 3 120 \
    python scripts/extract_ae_latents.py --config "${CFG}" --ckpt "${CKPT}" \
      --out "results/synth_latents_${TAG}x.npz" --len_min 1 --len_max 96 \
      --npy_dir data/synth_curves_bankx || exit 1

  [ -e "results/synth_latents_${TAG}m.npz" ] || retry 1 1 \
    python scripts/analysis/merge_latent_banks.py \
      --banks "results/synth_latents_${TAG}e.npz" \
              "results/synth_latents_${TAG}x.npz" \
      --out "results/synth_latents_${TAG}m.npz" || exit 1

  [ -e "results/synth_h_${TAG}m.npz" ] || retry 3 120 \
    python scripts/train_ot_potential.py \
      --features "results/synth_latents_${TAG}m.npz" \
      --out "results/synth_h_${TAG}m.npz" || exit 1

  [ -e "results/aeot_runs/r3_${ARM}_bankx/summary.json" ] || retry 3 120 \
    python scripts/run_aeot_end2end.py \
      --ae_config "${CFG}" --ae_ckpt "${CKPT}" \
      --features_pt "results/synth_latents_${TAG}m.npz" \
      --ot_h "results/synth_h_${TAG}m.npz" \
      --out_root results/aeot_runs --run_name "r3_${ARM}_bankx" \
      --n_generate 2000 --select_random --seed 42 \
      --num_gen_x 400000 --ot_bat_size_n 10000 --ot_thresh 0.3 \
      --decode_batch_size 128 --min_length 32 \
      --min_pairwise_dist 2.0 --neighbor_exclude 2 || exit 1
done

echo "[wp] done $(date -u +%FT%TZ)" >> "${LOG}"
for ARM in ft7b ft8; do
  echo "=== r3_${ARM}_bankx ==="
  cat "results/aeot_runs/r3_${ARM}_bankx/summary.json" 2>/dev/null; echo
done
