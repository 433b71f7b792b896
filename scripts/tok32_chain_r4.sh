#!/usr/bin/env bash
# Round-4 stage-2 token-resolution A/B: 32 tok x 4 lvl vs 16 tok x 8 lvl
# at IDENTICAL bits/curve (1280). Tests whether the binding constraint on
# quantized-decode bond legality is bits (depth rung: 73.9 -> 77.2% at
# 2x bits, saturating) or spatial latent resolution (the round-4
# calibration probe showed the residual error is local corner-cutting —
# high-frequency loss more tokens should address).
#
#   synth_vq_tok32     150 ep, warm-start checkpoints/synth_ae/last
#                      (tokenizer queries re-init at 32; shape filter
#                      keeps everything else)
#   synth_vq_tok32_ft  ->290 ep, RESUME tok32/last, physics pinned+pushed
#     measure: bond_band_stats -> results/stage2_r3/band_tok32.json
#
# QUEUES behind round4_post_chain (single TPU chip).

set -u
ROOT="$(cd "$(dirname "${BASH_SOURCE[0]}")/.." && pwd)"
cd "${ROOT}"
mkdir -p logs results/stage2_r3
. scripts/lib_lock.sh
acquire_lock logs/.tok32_chain_r4.lock.d || {
  echo "[tok32] another instance running; exiting"; exit 1; }
LOG=logs/tok32_chain_r4.log
echo "[tok32] start $(date -u +%FT%TZ)" >> "${LOG}"

for dep in stage2_capacity2_r3 prior_chain_r3 round4_post_chain; do
  while [ -d "logs/.${dep}.lock.d" ]; do
    echo "[tok32] waiting on ${dep} $(date -u +%FT%TZ)" >> "${LOG}"
    sleep 300
  done
done
[ -e checkpoints/synth_ae/last/_CHECKPOINT_METADATA ] || {
  echo "[tok32] missing stage-1 base checkpoint" >> "${LOG}"; exit 1; }

bash scripts/retry_train.sh configs/synth_vq_tok32.yaml \
  checkpoints/synth_vq_tok32 "${LOG}" \
  --warm_start_ckpt checkpoints/synth_ae/last || exit 1

bash scripts/retry_train.sh configs/synth_vq_tok32_ft.yaml \
  checkpoints/synth_vq_tok32_ft "${LOG}" \
  --resume_ckpt checkpoints/synth_vq_tok32/last || exit 1

for try in 1 2 3; do
  python scripts/analysis/bond_band_stats.py \
    --config configs/synth_vq_tok32_ft.yaml \
    --ckpt checkpoints/synth_vq_tok32_ft/last \
    --split val --quantize auto \
    --out results/stage2_r3/band_tok32.json >> "${LOG}" 2>&1 && break
  sleep 120
done

echo "[tok32] done $(date -u +%FT%TZ)" >> "${LOG}"
cat results/stage2_r3/band_tok32.json 2>/dev/null
