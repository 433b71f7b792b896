#!/usr/bin/env bash
# One-click stage-2 rebuild after machine recycling: regenerates the
# deterministic corpus and the stage-1 BASE checkpoint (only — the ft2/ft5
# stage-1 evals are already committed under results/aeot_runs/r3_ft2b and
# r3_ft5; re-running them would waste TPU hours), then hands off to
# scripts/stage2_chain_r3.sh for the VQ line + mix-geom A/B.
#
# Corpus parameters are the canonical new-corpus line (seed 7, len 48-96,
# 3276/820) documented in scripts/quality_chain_r3.sh.

set -u
ROOT="$(cd "$(dirname "${BASH_SOURCE[0]}")/.." && pwd)"
cd "${ROOT}"
mkdir -p logs
# double-launch guard: a second instance of this chain races retry_train
# on the same checkpoint dirs (observed r3: reset a 200-epoch run)
. scripts/lib_lock.sh
acquire_lock logs/.stage2_rebuild_r3.lock.d || {
  echo "[rebuild] another instance running; exiting"; exit 1; }
LOG=logs/stage2_rebuild_r3.log
echo "[rebuild] start $(date -u +%FT%TZ)" >> "${LOG}"

if [ ! -e data/synth_curves/train_list.txt ]; then
  python -c "
from pytorch_vae_tpu.data.synthetic import make_synthetic_curve_dir
make_synthetic_curve_dir('data/synth_curves', n_train=3276, n_val=820,
                         seed=7, min_len=48, max_len=96)
print('corpus: 3276 train / 820 val, seed 7, len 48-96')
" >> "${LOG}" 2>&1 || exit 1
fi

if [ ! -e checkpoints/synth_ae/last ] || \
   ! grep -q "completed" "${LOG}" 2>/dev/null; then
  bash scripts/retry_train.sh configs/synth_ae.yaml checkpoints/synth_ae \
    "${LOG}" || exit 1
fi

bash scripts/stage2_chain_r3.sh
