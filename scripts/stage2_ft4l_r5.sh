#!/usr/bin/env bash
# Round-5 stage-2 LEGALIZATION leg (VERDICT r4 #2: raise the 21.9%
# strict-filter reconstruction ceiling or prove it can't move).
# configs/synth_vq_huge_ft4l.yaml turns on the decoder-side bond
# legalization layer (ops/geometry.legalize_bond_lengths) and fine-tunes
# 120 epochs so the decoder adapts to the re-integration map.
# Measurements (controls in parens):
#   - results/stage2_r3/band_huge_ft4l.json      (ft3g; in-band should be
#     ~1.0 by construction — the honest metric is the pair below)
#   - results/stage2_r3/recon_ceiling_ft4l.json  (ft2: 21.9% keep;
#     done-criterion >= 40%)
#   - results/prior_r4/vqsample_ft4l_uniform.json (uniform-code arm;
#     ft2 control: 0.0%)
#   - val rmsd_aln in logs/stage2_ft4l_r5.log    (distortion check vs
#     ft3g's — legalization must not buy legality with geometry)
# QUEUES behind prior_r5 (single TPU chip).

set -u
ROOT="$(cd "$(dirname "${BASH_SOURCE[0]}")/.." && pwd)"
cd "${ROOT}"
mkdir -p logs results/stage2_r3 results/prior_r4
. scripts/lib_lock.sh
acquire_lock logs/.stage2_ft4l_r5.lock.d || {
  echo "[ft4l] another instance running; exiting"; exit 1; }
LOG=logs/stage2_ft4l_r5.log
echo "[ft4l] start $(date -u +%FT%TZ)" >> "${LOG}"

for dep in ft9_keeppush_r4 stage2_ft3g_r5 prior_r5; do
  while [ -d "logs/.${dep}.lock.d" ]; do
    echo "[ft4l] waiting on ${dep} $(date -u +%FT%TZ)" >> "${LOG}"
    sleep 120
  done
done

if [ ! -e data/synth_curves/train_list.txt ]; then
  env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu python -c "
from pytorch_vae_tpu.data.synthetic import make_synthetic_curve_dir
make_synthetic_curve_dir('data/synth_curves', n_train=3276, n_val=820,
                         seed=7, min_len=48, max_len=96)" >> "${LOG}" 2>&1 || exit 1
fi

# Warm start: prefer the fresh ft3g leg (band-hinge-adapted decoder),
# fall back to the committed ft2 golden bundle. Params are
# shape-identical either way (legalization has no parameters).
WS=checkpoints/synth_vq_huge_ft3g/last
[ -e "${WS}/_CHECKPOINT_METADATA" ] || WS=golden/stage2_synth_vq_huge_ft2.npz
[ -e "${WS}" ] || { echo "[ft4l] no warm-start source" >> "${LOG}"; exit 1; }
echo "[ft4l] warm-start source: ${WS}" >> "${LOG}"

retry () {  # retry <n> <sleep_s> <cmd...>
  local n="$1" s="$2"; shift 2
  for try in $(seq 1 "${n}"); do
    "$@" >> "${LOG}" 2>&1 && return 0
    echo "[ft4l] attempt ${try} of $* failed; sleep ${s}s" >> "${LOG}"
    sleep "${s}"
  done
  return 1
}

CFG=configs/synth_vq_huge_ft4l.yaml
CKPT=checkpoints/synth_vq_huge_ft4l/last

bash scripts/retry_train.sh "${CFG}" checkpoints/synth_vq_huge_ft4l \
  "${LOG}" --warm_start_ckpt "${WS}" || exit 1

[ -e results/stage2_r3/band_huge_ft4l.json ] || retry 3 120 \
  python scripts/analysis/bond_band_stats.py \
    --config "${CFG}" --ckpt "${CKPT}" \
    --split val --quantize auto \
    --out results/stage2_r3/band_huge_ft4l.json || exit 1

[ -e results/stage2_r3/recon_ceiling_ft4l.json ] || retry 3 120 \
  python scripts/analysis/vq_sample_quality.py \
    --config "${CFG}" --ckpt "${CKPT}" --n 512 --seed 0 --recon \
    --out results/stage2_r3/recon_ceiling_ft4l.json || exit 1

# Uniform-code arm: legalization moves every decode path, including the
# one the reference calls sample() on (models/vq_vae.py:1394-1422).
[ -e results/prior_r4/vqsample_ft4l_uniform.json ] || retry 3 120 \
  python scripts/analysis/vq_sample_quality.py \
    --config "${CFG}" --ckpt "${CKPT}" --n 512 --seed 0 \
    --out results/prior_r4/vqsample_ft4l_uniform.json || exit 1

echo "[ft4l] done $(date -u +%FT%TZ)" >> "${LOG}"
cat results/stage2_r3/band_huge_ft4l.json 2>/dev/null
cat results/stage2_r3/recon_ceiling_ft4l.json 2>/dev/null
