#!/usr/bin/env bash
# Round-3 generation-quality chain, rebuilt after the machine hosting the
# original checkpoints/corpus was recycled (checkpoints/, data/, logs/ are
# gitignored and died with it). Retrains the stage-1 line on a regenerated
# corpus and re-baselines the ft2 keep-rate before the ft5 A/B, so the
# comparison is corpus-consistent:
#
#   corpus (seed 7, len 48-96, 3276/820)     data/synth_curves
#   base   configs/synth_ae.yaml   260 ep -> checkpoints/synth_ae
#   ft2    configs/synth_ae_ft2.yaml 100 ep -> checkpoints/synth_ae_ft2
#     eval: latents r3d -> OT h r3d -> end2end r3_ft2b (re-baseline)
#   ft5    configs/synth_ae_ft5.yaml  80 ep -> checkpoints/synth_ae_ft5
#     eval: latents r3e -> OT h r3e -> end2end r3_ft5
#
# All end2end args mirror results/aeot_runs/r3_ft2/args.json (seed 42,
# n_generate 2000, num_gen_x 50000, thresh 0.3, min_length 32).
# Training legs run under scripts/retry_train.sh (tunnel outages).

set -u
ROOT="$(cd "$(dirname "${BASH_SOURCE[0]}")/.." && pwd)"
cd "${ROOT}"
mkdir -p logs
. scripts/lib_lock.sh
acquire_lock logs/.quality_chain_r3.lock.d || {
  echo "[chain] another instance running; exiting"; exit 1; }
LOG=logs/quality_chain_r3.log
echo "[chain] start $(date -u +%FT%TZ)" >> "${LOG}"

# Corpus: EXACT regeneration command (deterministic; np.default_rng(7)).
# This was previously only documented in the header comment — the whole
# point of this script is surviving machine recycles, so the call lives
# here now.
if [ ! -e data/synth_curves/train_list.txt ]; then
  python -c "
from pytorch_vae_tpu.data.synthetic import make_synthetic_curve_dir
make_synthetic_curve_dir('data/synth_curves', n_train=3276, n_val=820,
                         seed=7, min_len=48, max_len=96)
print('corpus: 3276 train / 820 val, seed 7, len 48-96')
" >> "${LOG}" 2>&1 || exit 1
fi

run_eval () {  # run_eval <tag> <config> <ckpt_dir> <run_name>
  local tag="$1" cfg="$2" ckpt="$3" run_name="$4"
  python scripts/extract_ae_latents.py --config "${cfg}" \
    --ckpt "${ckpt}/last" --out "results/synth_latents_${tag}.npz" \
    --len_min 1 --len_max 96 >> "${LOG}" 2>&1 || return 1
  python scripts/train_ot_potential.py \
    --features "results/synth_latents_${tag}.npz" \
    --out "results/synth_h_${tag}.npz" >> "${LOG}" 2>&1 || return 1
  python scripts/run_aeot_end2end.py \
    --ae_config "${cfg}" --ae_ckpt "${ckpt}/last" \
    --features_pt "results/synth_latents_${tag}.npz" \
    --ot_h "results/synth_h_${tag}.npz" \
    --out_root results/aeot_runs --run_name "${run_name}" \
    --n_generate 2000 --select_random --seed 42 \
    --num_gen_x 50000 --ot_bat_size_n 10000 --ot_thresh 0.3 \
    --decode_batch_size 128 --min_length 32 \
    --min_pairwise_dist 2.0 --neighbor_exclude 2 >> "${LOG}" 2>&1
}

if [ ! -e checkpoints/synth_ae_ft2/last ]; then
  bash scripts/retry_train.sh configs/synth_ae.yaml checkpoints/synth_ae \
    "${LOG}" || exit 1
  bash scripts/retry_train.sh configs/synth_ae_ft2.yaml \
    checkpoints/synth_ae_ft2 "${LOG}" \
    --warm_start_ckpt checkpoints/synth_ae/last || exit 1
fi

for try in 1 2 3; do
  run_eval r3d configs/synth_ae_ft2.yaml checkpoints/synth_ae_ft2 r3_ft2b \
    && break
  echo "[chain] ft2 eval attempt ${try} failed; retrying in 120s" >> "${LOG}"
  sleep 120
done

bash scripts/retry_train.sh configs/synth_ae_ft5.yaml \
  checkpoints/synth_ae_ft5 "${LOG}" \
  --warm_start_ckpt checkpoints/synth_ae_ft2/last || exit 1

for try in 1 2 3; do
  run_eval r3e configs/synth_ae_ft5.yaml checkpoints/synth_ae_ft5 r3_ft5 \
    && break
  echo "[chain] ft5 eval attempt ${try} failed; retrying in 120s" >> "${LOG}"
  sleep 120
done

echo "[chain] done $(date -u +%FT%TZ)" >> "${LOG}"
for r in r3_ft2b r3_ft5; do
  echo "=== ${r} ==="; cat "results/aeot_runs/${r}/summary.json" 2>/dev/null
done
