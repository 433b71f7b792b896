#!/usr/bin/env bash
# Bank-growth A/B: does growing the OT candidate bank fix the measured
# angle-dedup saturation? (Round-3 finding: the 3,276-cell bank yields only
# ~1,871 unique OT candidates after the angular filter even at 400k OT
# samples — results/aeot_runs/r3_ft5_big.)
#
# The bank does NOT have to be the training set: any corpus encoded by the
# same checkpoint is a valid source of OT cells. This chain:
#
#   1. rebuilds the stage-1 ft line if missing (base -> ft2 -> ft5, the
#      production mix-geom recipe; see scripts/quality_chain_r3.sh)
#   2. generates an extraction-only corpus (seed 11, 8,192 curves, same
#      length band) that training never saw
#   3. extracts latents for both corpora with the ft5 checkpoint, merges
#      them (scripts/analysis/merge_latent_banks.py), trains an OT
#      potential per bank
#   4. runs the 400k-sample end2end twice with identical args:
#        control  r3_ft5_big2   3,276-cell bank
#        test     r3_ft5_bankx  11,468-cell merged bank
#
# Compare summary.json: candidate count after the angular filter, keep
# rate, reject taxonomy.

set -u
ROOT="$(cd "$(dirname "${BASH_SOURCE[0]}")/.." && pwd)"
cd "${ROOT}"
mkdir -p logs
. scripts/lib_lock.sh
acquire_lock logs/.bank_growth_r3.lock.d || {
  echo "[bankx] another instance running; exiting"; exit 1; }
LOG=logs/bank_growth_r3.log
echo "[bankx] start $(date -u +%FT%TZ)" >> "${LOG}"

# --- stage-1 ft line (skip legs whose checkpoints exist) ---------------
[ -e checkpoints/synth_ae/last ] || { echo "missing stage-1 base" >> "${LOG}"; exit 1; }

if [ ! -e checkpoints/synth_ae_ft2/last ]; then
  bash scripts/retry_train.sh configs/synth_ae_ft2.yaml \
    checkpoints/synth_ae_ft2 "${LOG}" \
    --warm_start_ckpt checkpoints/synth_ae/last || exit 1
fi
if [ ! -e checkpoints/synth_ae_ft5/last ]; then
  bash scripts/retry_train.sh configs/synth_ae_ft5.yaml \
    checkpoints/synth_ae_ft5 "${LOG}" \
    --warm_start_ckpt checkpoints/synth_ae_ft2/last || exit 1
fi

# --- extraction-only corpus (deterministic, seed 11) -------------------
if [ ! -e data/synth_curves_bankx/train_list.txt ]; then
  python -c "
from pytorch_vae_tpu.data.synthetic import make_synthetic_curve_dir
make_synthetic_curve_dir('data/synth_curves_bankx', n_train=8192, n_val=8,
                         seed=11, min_len=48, max_len=96)
print('bankx corpus: 8192 extraction-only curves, seed 11, len 48-96')
" >> "${LOG}" 2>&1 || exit 1
fi

CKPT=checkpoints/synth_ae_ft5/last
CFG=configs/synth_ae_ft5.yaml

retry () {  # retry <n> <sleep_s> <cmd...>
  local n="$1" s="$2"; shift 2
  for try in $(seq 1 "${n}"); do
    "$@" >> "${LOG}" 2>&1 && return 0
    echo "[bankx] attempt ${try} of $* failed; sleep ${s}s" >> "${LOG}"
    sleep "${s}"
  done
  return 1
}

[ -e results/synth_latents_r3e.npz ] || retry 3 120 \
  python scripts/extract_ae_latents.py --config "${CFG}" --ckpt "${CKPT}" \
    --out results/synth_latents_r3e.npz --len_min 1 --len_max 96 || exit 1

[ -e results/synth_latents_r3x.npz ] || retry 3 120 \
  python scripts/extract_ae_latents.py --config "${CFG}" --ckpt "${CKPT}" \
    --out results/synth_latents_r3x.npz --len_min 1 --len_max 96 \
    --npy_dir data/synth_curves_bankx || exit 1

[ -e results/synth_latents_r3m.npz ] || retry 1 1 \
  python scripts/analysis/merge_latent_banks.py \
    --banks results/synth_latents_r3e.npz results/synth_latents_r3x.npz \
    --out results/synth_latents_r3m.npz || exit 1

[ -e results/synth_h_r3e.npz ] || retry 3 120 \
  python scripts/train_ot_potential.py \
    --features results/synth_latents_r3e.npz \
    --out results/synth_h_r3e.npz || exit 1

[ -e results/synth_h_r3m.npz ] || retry 3 120 \
  python scripts/train_ot_potential.py \
    --features results/synth_latents_r3m.npz \
    --out results/synth_h_r3m.npz || exit 1

run_big () {  # run_big <bank_tag> <run_name>
  python scripts/run_aeot_end2end.py \
    --ae_config "${CFG}" --ae_ckpt "${CKPT}" \
    --features_pt "results/synth_latents_$1.npz" \
    --ot_h "results/synth_h_$1.npz" \
    --out_root results/aeot_runs --run_name "$2" \
    --n_generate 2000 --select_random --seed 42 \
    --num_gen_x 400000 --ot_bat_size_n 10000 --ot_thresh 0.3 \
    --decode_batch_size 128 --min_length 32 \
    --min_pairwise_dist 2.0 --neighbor_exclude 2
}

[ -e results/aeot_runs/r3_ft5_big2/summary.json ] || retry 3 120 \
  run_big r3e r3_ft5_big2 || exit 1
[ -e results/aeot_runs/r3_ft5_bankx/summary.json ] || retry 3 120 \
  run_big r3m r3_ft5_bankx || exit 1

echo "[bankx] done $(date -u +%FT%TZ)" >> "${LOG}"
for r in r3_ft5_big2 r3_ft5_bankx; do
  echo "=== ${r} ==="; cat "results/aeot_runs/${r}/summary.json" 2>/dev/null; echo
done
