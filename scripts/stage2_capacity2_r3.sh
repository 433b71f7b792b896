#!/usr/bin/env bash
# Round-3 stage-2 capacity ESCALATION chain: 8x1024 RVQ (1280 bits/curve)
# vs the landed 4x1024 line (640 bits; results/stage2_r3/band_big{,2}.json
# = 73.9 / 76.1% legal-bond fraction). Single-variable change (quantizer
# depth), same 3-leg recipe as scripts/stage2_capacity_r3.sh:
#
#   synth_vq_huge      150 ep, warm-start checkpoints/synth_ae/last
#   synth_vq_huge_ft   ->290 ep, RESUME huge/last (physics pinned+pushed)
#   synth_vq_huge_ft2  ->360 ep, RESUME huge_ft/last (+ mix_geom z_q_raw)
#     measure after legs 2 and 3: bond_band_stats on quantized val decodes
#     -> results/stage2_r3/band_huge{,2}.json
#
# QUEUES behind the stage-1 rebuild chain (scripts/rebuild_line_r3.sh):
# one TPU chip — concurrent training legs would contend. Waits for the
# rebuild lock to clear AND the base checkpoint to exist before starting.

set -u
ROOT="$(cd "$(dirname "${BASH_SOURCE[0]}")/.." && pwd)"
cd "${ROOT}"
mkdir -p logs results/stage2_r3
. scripts/lib_lock.sh
acquire_lock logs/.stage2_capacity2_r3.lock.d || {
  echo "[cap2] another instance running; exiting"; exit 1; }
LOG=logs/stage2_capacity2_r3.log
echo "[cap2] start $(date -u +%FT%TZ)" >> "${LOG}"

# --- queue behind the stage-1 rebuild (single TPU chip) ----------------
while [ -d logs/.rebuild_line_r3.lock.d ]; do
  echo "[cap2] waiting on rebuild_line_r3 $(date -u +%FT%TZ)" >> "${LOG}"
  sleep 300
done
[ -e checkpoints/synth_ae/last/_CHECKPOINT_METADATA ] || {
  echo "[cap2] missing stage-1 base checkpoints/synth_ae/last" >> "${LOG}"; exit 1; }

bash scripts/retry_train.sh configs/synth_vq_huge.yaml \
  checkpoints/synth_vq_huge "${LOG}" \
  --warm_start_ckpt checkpoints/synth_ae/last || exit 1

bash scripts/retry_train.sh configs/synth_vq_huge_ft.yaml \
  checkpoints/synth_vq_huge_ft "${LOG}" \
  --resume_ckpt checkpoints/synth_vq_huge/last || exit 1

for try in 1 2 3; do
  python scripts/analysis/bond_band_stats.py \
    --config configs/synth_vq_huge_ft.yaml \
    --ckpt checkpoints/synth_vq_huge_ft/last \
    --split val --quantize auto \
    --out results/stage2_r3/band_huge.json >> "${LOG}" 2>&1 && break
  sleep 120
done

bash scripts/retry_train.sh configs/synth_vq_huge_ft2.yaml \
  checkpoints/synth_vq_huge_ft2 "${LOG}" \
  --resume_ckpt checkpoints/synth_vq_huge_ft/last || exit 1

for try in 1 2 3; do
  python scripts/analysis/bond_band_stats.py \
    --config configs/synth_vq_huge_ft2.yaml \
    --ckpt checkpoints/synth_vq_huge_ft2/last \
    --split val --quantize auto \
    --out results/stage2_r3/band_huge2.json >> "${LOG}" 2>&1 && break
  sleep 120
done

echo "[cap2] done $(date -u +%FT%TZ)" >> "${LOG}"
for f in band_huge band_huge2; do
  echo "=== ${f} ==="; cat "results/stage2_r3/${f}.json" 2>/dev/null; echo
done
