#!/usr/bin/env bash
# Round-4 stage-1 keep-rate push: ft9 (worst-form mix weights 1.0 -> 3.0,
# mix_seg_min_dist 1.8 -> 2.0) vs the committed ft8 control
# (results/aeot_runs/r3_ft8_bankx: keep 94.0%, rejects bond 54 / seg 55 /
# point 9 / angle 3 at ~96k unique candidates). Identical bank-merge +
# 400k end2end recipe as scripts/worstpair_ab_r3.sh so the rows compare.
#
# QUEUES behind every other round-4 chain (single TPU chip).

set -u
ROOT="$(cd "$(dirname "${BASH_SOURCE[0]}")/.." && pwd)"
cd "${ROOT}"
mkdir -p logs results/aeot_runs
. scripts/lib_lock.sh
acquire_lock logs/.ft9_keeppush_r4.lock.d || {
  echo "[ft9] another instance running; exiting"; exit 1; }
LOG=logs/ft9_keeppush_r4.log
echo "[ft9] start $(date -u +%FT%TZ)" >> "${LOG}"

for dep in round4_post_chain tok32_chain_r4 prior_final_r4 xla_flags_r4 \
           stage2_ft3_r4 compiler_opts_r4; do
  while [ -d "logs/.${dep}.lock.d" ]; do
    echo "[ft9] waiting on ${dep} $(date -u +%FT%TZ)" >> "${LOG}"
    sleep 300
  done
done
# Corpora are deterministic (np.default_rng) — regenerate if the machine
# was recycled (same commands as bankx_ft6_r3.sh / reproduce_line.sh).
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
fi

# Warm-start source: live ft8 checkpoint if present, else the committed
# golden bundle (machine recycling killed the r4 line; the bundle IS the
# ft8 final params + codebook — scripts/export_golden.py provenance).
WS=checkpoints/synth_ae_ft8/last
[ -e "${WS}/_CHECKPOINT_METADATA" ] || WS=golden/stage1_ft8.npz
[ -e "${WS}" ] || { echo "[ft9] no ft8 source at all" >> "${LOG}"; exit 1; }
echo "[ft9] warm-start source: ${WS}" >> "${LOG}"

retry () {  # retry <n> <sleep_s> <cmd...>
  local n="$1" s="$2"; shift 2
  for try in $(seq 1 "${n}"); do
    "$@" >> "${LOG}" 2>&1 && return 0
    echo "[ft9] attempt ${try} of $* failed; sleep ${s}s" >> "${LOG}"
    sleep "${s}"
  done
  return 1
}

CFG=configs/synth_ae_ft9.yaml
CKPT=checkpoints/synth_ae_ft9/last
TAG=r4f_ft9

bash scripts/retry_train.sh "${CFG}" checkpoints/synth_ae_ft9 \
  "${LOG}" --warm_start_ckpt "${WS}" || exit 1

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

[ -e "results/aeot_runs/r4_ft9_bankx/summary.json" ] || retry 3 120 \
  python scripts/run_aeot_end2end.py \
    --ae_config "${CFG}" --ae_ckpt "${CKPT}" \
    --features_pt "results/synth_latents_${TAG}m.npz" \
    --ot_h "results/synth_h_${TAG}m.npz" \
    --out_root results/aeot_runs --run_name "r4_ft9_bankx" \
    --n_generate 2000 --select_random --seed 42 \
    --num_gen_x 400000 --ot_bat_size_n 10000 --ot_thresh 0.3 \
    --decode_batch_size 128 --min_length 32 \
    --min_pairwise_dist 2.0 --neighbor_exclude 2 || exit 1

echo "[ft9] done $(date -u +%FT%TZ)" >> "${LOG}"
cat results/aeot_runs/r4_ft9_bankx/summary.json 2>/dev/null
