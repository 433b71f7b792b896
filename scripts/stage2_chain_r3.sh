#!/usr/bin/env bash
# Round-3 stage-2 (VQ) rebuild + mix-geometry A/B, after machine recycling
# (see scripts/quality_chain_r3.sh for the stage-1 leg and the corpus
# parameters). Replays the historical stage-2 chain on the regenerated
# corpus, re-baselining the legal-bond fraction before the mix-geom leg:
#
#   synth_vq_bf16  150 ep, warm-start checkpoints/synth_ae/last
#   synth_vq_ft    ->290 ep, RESUME bf16/last (full state: RVQ codebook +
#                  EMA buffers carry over; warm-start drops quantizer.*)
#     measure: bond_band_stats (quantized decodes, band [2.2, 5.5] A)
#              -> results/stage2_r3/band_ft.json   (re-baseline; was 69.5%)
#   synth_vq_ft2   ->360 ep, RESUME ft/last, + mix_geom on z_q_raw
#     measure: bond_band_stats -> results/stage2_r3/band_ft2.json
#
# Requires checkpoints/synth_ae/last (stage-1 base from quality_chain_r3).

set -u
ROOT="$(cd "$(dirname "${BASH_SOURCE[0]}")/.." && pwd)"
cd "${ROOT}"
mkdir -p logs results/stage2_r3
. scripts/lib_lock.sh
acquire_lock logs/.stage2_chain_r3.lock.d || {
  echo "[stage2] another instance running; exiting"; exit 1; }
LOG=logs/stage2_chain_r3.log
echo "[stage2] start $(date -u +%FT%TZ)" >> "${LOG}"

[ -e checkpoints/synth_ae/last ] || { echo "missing stage-1 base" >> "${LOG}"; exit 1; }

bash scripts/retry_train.sh configs/synth_vq_bf16.yaml \
  checkpoints/synth_vq_bf16 "${LOG}" \
  --warm_start_ckpt checkpoints/synth_ae/last || exit 1

bash scripts/retry_train.sh configs/synth_vq_ft.yaml \
  checkpoints/synth_vq_ft "${LOG}" \
  --resume_ckpt checkpoints/synth_vq_bf16/last || exit 1

for try in 1 2 3; do
  python scripts/analysis/bond_band_stats.py \
    --config configs/synth_vq_ft.yaml --ckpt checkpoints/synth_vq_ft/last \
    --split val --quantize auto \
    --out results/stage2_r3/band_ft.json >> "${LOG}" 2>&1 && break
  sleep 120
done

bash scripts/retry_train.sh configs/synth_vq_ft2.yaml \
  checkpoints/synth_vq_ft2 "${LOG}" \
  --resume_ckpt checkpoints/synth_vq_ft/last || exit 1

for try in 1 2 3; do
  python scripts/analysis/bond_band_stats.py \
    --config configs/synth_vq_ft2.yaml --ckpt checkpoints/synth_vq_ft2/last \
    --split val --quantize auto \
    --out results/stage2_r3/band_ft2.json >> "${LOG}" 2>&1 && break
  sleep 120
done

echo "[stage2] done $(date -u +%FT%TZ)" >> "${LOG}"
for f in results/stage2_r3/band_ft.json results/stage2_r3/band_ft2.json; do
  echo "=== ${f} ==="; cat "${f}" 2>/dev/null; echo
done
