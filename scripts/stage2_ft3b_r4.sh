#!/usr/bin/env bash
# Round-4 stage-2 sharpening EXTENSION: huge_ft3 (420) -> 480 epochs
# with bond_band_max_weight pinned at 4.0 (ft3's metric had not
# converged). Measure -> results/stage2_r3/band_huge_ft3b.json; control
# = band_huge_ft3.json (79.8%). QUEUES last (single TPU chip).

set -u
ROOT="$(cd "$(dirname "${BASH_SOURCE[0]}")/.." && pwd)"
cd "${ROOT}"
mkdir -p logs results/stage2_r3
. scripts/lib_lock.sh
acquire_lock logs/.stage2_ft3b_r4.lock.d || {
  echo "[ft3b] another instance running; exiting"; exit 1; }
LOG=logs/stage2_ft3b_r4.log
echo "[ft3b] start $(date -u +%FT%TZ)" >> "${LOG}"

for dep in stage2_ft3_r4 compiler_opts_r4 ft9_keeppush_r4; do
  while [ -d "logs/.${dep}.lock.d" ]; do
    echo "[ft3b] waiting on ${dep} $(date -u +%FT%TZ)" >> "${LOG}"
    sleep 300
  done
done
[ -e checkpoints/synth_vq_huge_ft3/last/_CHECKPOINT_METADATA ] || {
  echo "[ft3b] missing huge_ft3 checkpoint" >> "${LOG}"; exit 1; }

bash scripts/retry_train.sh configs/synth_vq_huge_ft3b.yaml \
  checkpoints/synth_vq_huge_ft3b "${LOG}" \
  --resume_ckpt checkpoints/synth_vq_huge_ft3/last || exit 1

for try in 1 2 3; do
  python scripts/analysis/bond_band_stats.py \
    --config configs/synth_vq_huge_ft3b.yaml \
    --ckpt checkpoints/synth_vq_huge_ft3b/last \
    --split val --quantize auto \
    --out results/stage2_r3/band_huge_ft3b.json >> "${LOG}" 2>&1 && break
  sleep 120
done

echo "[ft3b] done $(date -u +%FT%TZ)" >> "${LOG}"
cat results/stage2_r3/band_huge_ft3b.json 2>/dev/null
