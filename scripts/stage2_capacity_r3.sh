#!/usr/bin/env bash
# Round-3 stage-2 QUANTIZER-CAPACITY A/B. The mix-geom stage-2 A/B
# (scripts/stage2_chain_r3.sh) moved the legal-bond fraction of quantized
# val decodes only 43.1% -> 45.4% (band [2.2, 5.5] A; decode bond mean
# 2.18 vs truth 3.82), and CLAUDE.md concluded the 2-level x 256-code
# quantizer (256 bits/curve) is the binding constraint, not decoder
# behavior. This chain tests that conclusion directly: replay the exact
# 3-leg stage-2 chain with ONLY the quantizer geometry changed to
# 4 levels x 1024 codes (640 bits/curve, the flagship's per-level shape):
#
#   synth_vq_big      150 ep, warm-start checkpoints/synth_ae/last
#                     (warm-start drops quantizer.* by design, so the
#                     bigger codebook initializes fresh)
#   synth_vq_big_ft   ->290 ep, RESUME big/last (physics pinned+pushed)
#   synth_vq_big_ft2  ->360 ep, RESUME big_ft/last (+ mix_geom on z_q_raw)
#     measure after legs 2 and 3: bond_band_stats on quantized val
#     decodes -> results/stage2_r3/band_big{,2}.json
#
# Compare vs results/stage2_r3/band_ft{,2}.json (43.1 / 45.4%).

set -u
ROOT="$(cd "$(dirname "${BASH_SOURCE[0]}")/.." && pwd)"
cd "${ROOT}"
mkdir -p logs results/stage2_r3
. scripts/lib_lock.sh
acquire_lock logs/.stage2_capacity_r3.lock.d || {
  echo "[cap] another instance running; exiting"; exit 1; }
LOG=logs/stage2_capacity_r3.log
echo "[cap] start $(date -u +%FT%TZ)" >> "${LOG}"

[ -e checkpoints/synth_ae/last ] || {
  echo "[cap] missing stage-1 base checkpoints/synth_ae/last" >> "${LOG}"; exit 1; }

bash scripts/retry_train.sh configs/synth_vq_big.yaml \
  checkpoints/synth_vq_big "${LOG}" \
  --warm_start_ckpt checkpoints/synth_ae/last || exit 1

bash scripts/retry_train.sh configs/synth_vq_big_ft.yaml \
  checkpoints/synth_vq_big_ft "${LOG}" \
  --resume_ckpt checkpoints/synth_vq_big/last || exit 1

for try in 1 2 3; do
  python scripts/analysis/bond_band_stats.py \
    --config configs/synth_vq_big_ft.yaml \
    --ckpt checkpoints/synth_vq_big_ft/last \
    --split val --quantize auto \
    --out results/stage2_r3/band_big.json >> "${LOG}" 2>&1 && break
  sleep 120
done

bash scripts/retry_train.sh configs/synth_vq_big_ft2.yaml \
  checkpoints/synth_vq_big_ft2 "${LOG}" \
  --resume_ckpt checkpoints/synth_vq_big_ft/last || exit 1

for try in 1 2 3; do
  python scripts/analysis/bond_band_stats.py \
    --config configs/synth_vq_big_ft2.yaml \
    --ckpt checkpoints/synth_vq_big_ft2/last \
    --split val --quantize auto \
    --out results/stage2_r3/band_big2.json >> "${LOG}" 2>&1 && break
  sleep 120
done

echo "[cap] done $(date -u +%FT%TZ)" >> "${LOG}"
for f in results/stage2_r3/band_big.json results/stage2_r3/band_big2.json; do
  echo "=== ${f} ==="; cat "${f}" 2>/dev/null; echo
done
