#!/usr/bin/env bash
# Round-4 stage-2 decoder-sharpening A/B: per-curve WORST-bond band hinge
# (ops/losses.py bond_band / bond_band_max_weight — the ft8 max-form
# lesson applied to recon bonds).
#
#   leg 1  synth_vq_huge_ft3  RESUME huge_ft2/last (360 -> 420 ep)
#          measure -> results/stage2_r3/band_huge_ft3.json
#          control = band_huge2.json (78.8% in-band, 21.2% below)
#   leg 2  synth_vq_tok32_ft2 RESUME tok32_ft/last (290 -> 350 ep)
#          ONLY IF band_tok32.json in-band > band_huge2's (i.e. the
#          32-token geometry won the resolution A/B) — sharpen the
#          winner, measure -> results/stage2_r3/band_tok32_ft2.json
#
# QUEUES behind tok32_chain_r4 / prior_final_r4 / xla_flags_r4
# (single TPU chip).

set -u
ROOT="$(cd "$(dirname "${BASH_SOURCE[0]}")/.." && pwd)"
cd "${ROOT}"
mkdir -p logs results/stage2_r3
. scripts/lib_lock.sh
acquire_lock logs/.stage2_ft3_r4.lock.d || {
  echo "[ft3] another instance running; exiting"; exit 1; }
LOG=logs/stage2_ft3_r4.log
echo "[ft3] start $(date -u +%FT%TZ)" >> "${LOG}"

for dep in round4_post_chain tok32_chain_r4 prior_final_r4 xla_flags_r4; do
  while [ -d "logs/.${dep}.lock.d" ]; do
    echo "[ft3] waiting on ${dep} $(date -u +%FT%TZ)" >> "${LOG}"
    sleep 300
  done
done
[ -e checkpoints/synth_vq_huge_ft2/last/_CHECKPOINT_METADATA ] || {
  echo "[ft3] missing huge_ft2 checkpoint" >> "${LOG}"; exit 1; }

bash scripts/retry_train.sh configs/synth_vq_huge_ft3.yaml \
  checkpoints/synth_vq_huge_ft3 "${LOG}" \
  --resume_ckpt checkpoints/synth_vq_huge_ft2/last || exit 1

for try in 1 2 3; do
  python scripts/analysis/bond_band_stats.py \
    --config configs/synth_vq_huge_ft3.yaml \
    --ckpt checkpoints/synth_vq_huge_ft3/last \
    --split val --quantize auto \
    --out results/stage2_r3/band_huge_ft3.json >> "${LOG}" 2>&1 && break
  sleep 120
done

# leg 2 only if the tok32 geometry won the resolution A/B
RUN_TOK32=$(python - <<'EOF'
import json, os
try:
    tok = json.load(open("results/stage2_r3/band_tok32.json"))
    ctl = json.load(open("results/stage2_r3/band_huge2.json"))
    print(1 if tok["decode"]["frac_in_band"]
          > ctl["decode"]["frac_in_band"] else 0)
except Exception:
    print(0)
EOF
)
if [ "${RUN_TOK32}" = "1" ] && \
   [ -e checkpoints/synth_vq_tok32_ft/last/_CHECKPOINT_METADATA ]; then
  echo "[ft3] tok32 won the resolution A/B; sharpening it too" >> "${LOG}"
  bash scripts/retry_train.sh configs/synth_vq_tok32_ft2.yaml \
    checkpoints/synth_vq_tok32_ft2 "${LOG}" \
    --resume_ckpt checkpoints/synth_vq_tok32_ft/last || exit 1
  for try in 1 2 3; do
    python scripts/analysis/bond_band_stats.py \
      --config configs/synth_vq_tok32_ft2.yaml \
      --ckpt checkpoints/synth_vq_tok32_ft2/last \
      --split val --quantize auto \
      --out results/stage2_r3/band_tok32_ft2.json >> "${LOG}" 2>&1 && break
    sleep 120
  done
else
  echo "[ft3] tok32 leg skipped (RUN_TOK32=${RUN_TOK32})" >> "${LOG}"
fi

echo "[ft3] done $(date -u +%FT%TZ)" >> "${LOG}"
cat results/stage2_r3/band_huge_ft3.json 2>/dev/null
