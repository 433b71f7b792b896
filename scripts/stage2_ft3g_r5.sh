#!/usr/bin/env bash
# Round-5 stage-2 sharpening, GOLDEN-BOOTSTRAP leg (VERDICT r4 #1b + #2).
# The 420-epoch huge_ft3 state (79.8% in-band, metric unconverged) was
# lost to machine recycling; this rebuilds the trajectory from the
# committed bundle: warm-start golden/stage2_synth_vq_huge_ft2.npz
# (= ft2@360ep, in-band 78.8%) and train 120 epochs with the worst-bond
# band hinge PINNED at 4.0 (configs/synth_vq_huge_ft3g.yaml).
# Measurements after training:
#   - results/stage2_r3/band_huge_ft3g.json   (control: ft3 79.8%)
#   - results/stage2_r3/recon_ceiling_ft3g.json (control: ft2 21.9% keep
#     = the strict-filter reconstruction ceiling, results/prior_r3)
# QUEUES behind ft9_keeppush_r4 (single TPU chip).

set -u
ROOT="$(cd "$(dirname "${BASH_SOURCE[0]}")/.." && pwd)"
cd "${ROOT}"
mkdir -p logs results/stage2_r3
. scripts/lib_lock.sh
acquire_lock logs/.stage2_ft3g_r5.lock.d || {
  echo "[ft3g] another instance running; exiting"; exit 1; }
LOG=logs/stage2_ft3g_r5.log
echo "[ft3g] start $(date -u +%FT%TZ)" >> "${LOG}"

for dep in ft9_keeppush_r4; do
  while [ -d "logs/.${dep}.lock.d" ]; do
    echo "[ft3g] waiting on ${dep} $(date -u +%FT%TZ)" >> "${LOG}"
    sleep 120
  done
done

# Deterministic corpus (same command as reproduce_line.sh) if recycled.
if [ ! -e data/synth_curves/train_list.txt ]; then
  env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu python -c "
from pytorch_vae_tpu.data.synthetic import make_synthetic_curve_dir
make_synthetic_curve_dir('data/synth_curves', n_train=3276, n_val=820,
                         seed=7, min_len=48, max_len=96)" >> "${LOG}" 2>&1 || exit 1
fi

WS=golden/stage2_synth_vq_huge_ft2.npz
[ -e "${WS}" ] || { echo "[ft3g] missing golden ${WS}" >> "${LOG}"; exit 1; }

retry () {  # retry <n> <sleep_s> <cmd...>
  local n="$1" s="$2"; shift 2
  for try in $(seq 1 "${n}"); do
    "$@" >> "${LOG}" 2>&1 && return 0
    echo "[ft3g] attempt ${try} of $* failed; sleep ${s}s" >> "${LOG}"
    sleep "${s}"
  done
  return 1
}

CFG=configs/synth_vq_huge_ft3g.yaml
CKPT=checkpoints/synth_vq_huge_ft3g/last

bash scripts/retry_train.sh "${CFG}" checkpoints/synth_vq_huge_ft3g \
  "${LOG}" --warm_start_ckpt "${WS}" || exit 1

[ -e results/stage2_r3/band_huge_ft3g.json ] || retry 3 120 \
  python scripts/analysis/bond_band_stats.py \
    --config "${CFG}" --ckpt "${CKPT}" \
    --split val --quantize auto \
    --out results/stage2_r3/band_huge_ft3g.json || exit 1

# Strict-filter reconstruction ceiling on the sharpened decoder: the
# highest-leverage stage-2 number in the tree (VERDICT r4 weak #4).
[ -e results/stage2_r3/recon_ceiling_ft3g.json ] || retry 3 120 \
  python scripts/analysis/vq_sample_quality.py \
    --config "${CFG}" --ckpt "${CKPT}" --n 512 --seed 0 --recon \
    --out results/stage2_r3/recon_ceiling_ft3g.json || exit 1

echo "[ft3g] done $(date -u +%FT%TZ)" >> "${LOG}"
cat results/stage2_r3/band_huge_ft3g.json 2>/dev/null
cat results/stage2_r3/recon_ceiling_ft3g.json 2>/dev/null
