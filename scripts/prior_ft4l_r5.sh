#!/usr/bin/env bash
# Round-5 code prior over the ft4l (trained-legalization) checkpoint.
# Motivation: the legalize A/B put the unconditional path's ceiling at
# the decoder's own reconstruction keep — ft3g 26.2%, ft3g+inference
# map 79.7%, ft4l 93.0%. The committed prior arms run on ft3g codes
# (best legalized arm 44.3% keep at t=0.6, exact-match 0.0). The ft4l
# fine-tune moved the ENCODER too, so its code distribution differs;
# this chain re-extracts codes from the same non-memorizable 49,152-
# curve corpus (data/synth_curves_prior, seed 13) with the ft4l
# checkpoint, retrains the causal prior, and runs the same
# temperature/nucleus arms through the one strict-filter path.
# Reference uniform baseline: /root/reference/models/vq_vae.py:1394-1422.
# QUEUES behind legalize_infer_ab_r5 (single TPU chip).

set -u
ROOT="$(cd "$(dirname "${BASH_SOURCE[0]}")/.." && pwd)"
cd "${ROOT}"
mkdir -p logs results/prior_ft4l_r5
. scripts/lib_lock.sh
acquire_lock logs/.prior_ft4l_r5.lock.d || {
  echo "[prior-ft4l] another instance running; exiting"; exit 1; }
LOG=logs/prior_ft4l_r5.log
echo "[prior-ft4l] start $(date -u +%FT%TZ)" >> "${LOG}"

for dep in stage2_ft4l_r5 legalize_infer_ab_r5; do
  while [ -d "logs/.${dep}.lock.d" ]; do
    echo "[prior-ft4l] waiting on ${dep} $(date -u +%FT%TZ)" >> "${LOG}"
    sleep 120
  done
done

retry () {  # retry <n> <sleep_s> <cmd...>
  local n="$1" s="$2"; shift 2
  for try in $(seq 1 "${n}"); do
    "$@" >> "${LOG}" 2>&1 && return 0
    echo "[prior-ft4l] attempt ${try} of $* failed; sleep ${s}s" >> "${LOG}"
    sleep "${s}"
  done
  return 1
}

CKPT=checkpoints/synth_vq_huge_ft4l/last
CFG=configs/synth_vq_huge_ft4l.yaml
if [ ! -e "${CKPT}/_CHECKPOINT_METADATA" ]; then
  CKPT=golden/synth_vq_huge_ft4l.npz
fi
[ -e "${CKPT}/_CHECKPOINT_METADATA" ] || [ -e "${CKPT}" ] || {
  echo "[prior-ft4l] no ft4l checkpoint" >> "${LOG}"; exit 1; }
echo "[prior-ft4l] stage-2 source: ${CKPT}" >> "${LOG}"

# 1. Corpus (reused from prior_r5; regenerate if the machine recycled).
if [ ! -e data/synth_curves_prior/train_list.txt ]; then
  env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu python -c "
from pytorch_vae_tpu.data.synthetic import make_synthetic_curve_dir
make_synthetic_curve_dir('data/synth_curves_prior', n_train=49152, n_val=8,
                         seed=13, min_len=48, max_len=96)" >> "${LOG}" 2>&1 || exit 1
fi

CODES=results/prior_ft4l_r5/codes
PRIOR=results/prior_ft4l_r5/prior

DCFG=results/prior_ft4l_r5/extract_config.yaml
env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu python - "$CFG" "$DCFG" <<'EOF' || exit 1
import sys, yaml
cfg = yaml.safe_load(open(sys.argv[1]))
cfg["data_params"]["npy_dir"] = "./data/synth_curves_prior"
with open(sys.argv[2], "w") as f:
    yaml.safe_dump(cfg, f)
EOF

# 2. Extract ft4l codes for the corpus.
[ -e "${CODES}/manifest.jsonl" ] || retry 3 180 \
  python scripts/extract_code_indices.py --config "${DCFG}" \
    --ckpt "${CKPT}" --out_dir "${CODES}" --batch_size 256 \
    --split train || exit 1

# 3. Train the prior (same recipe as prior_r5: 100 ep, 49k corpus).
[ -e "${PRIOR}/prior_final.npz" ] || retry 3 180 \
  python scripts/train_code_prior.py --codes_dir "${CODES}" \
    --out "${PRIOR}" --epochs 100 --batch 128 || exit 1

# 4. Arms: one decode/filter/stats path. Legalization is baked into the
#    ft4l config (model_params.legalize_bonds), so decode is legal on
#    bonds by construction.
arm () {  # arm <tag> <extra args...>
  local tag="$1"; shift
  local out="results/prior_ft4l_r5/vqsample_${tag}.json"
  [ -e "${out}" ] || retry 3 180 \
    python scripts/analysis/vq_sample_quality.py --config "${CFG}" \
      --ckpt "${CKPT}" --n 512 --seed 0 --prior_dir "${PRIOR}" \
      --prior_params final --novelty_codes_dir "${CODES}" \
      --out "${out}" "$@" || return 1
}
arm t10 --temperature 1.0 || exit 1
arm t08 --temperature 0.8 || exit 1
arm t06 --temperature 0.6 || exit 1
arm t10_topp09 --temperature 1.0 --top_p 0.9 || exit 1

python - >> "${LOG}" 2>&1 <<'EOF'
import glob, json, os
arms = {}
for p in sorted(glob.glob("results/prior_ft4l_r5/vqsample_*.json")):
    arms[os.path.basename(p)[len("vqsample_"):-len(".json")]] = \
        json.load(open(p))
meta = json.load(open("results/prior_ft4l_r5/prior/meta.json"))
summary = {
    "what": "code prior retrained on ft4l (trained-legalization) codes "
            "over the non-memorizable 49,152-curve corpus: the "
            "unconditional path with the 93.0% reconstruction ceiling",
    "ceiling_recon_keep": 0.9296875,
    "controls": {
        "ft3g_prior_t06_keep": 0.11328125,
        "ft3g_prior_legalized_t06_keep": 0.443359375,
        "ft4l_uniform_keep": 0.064453125,
    },
    "corpus": {"dir": "data/synth_curves_prior", "n_train": 49152,
               "seed": 13, "len": [48, 96]},
    "prior_meta": {k: meta[k] for k in
                   ("best_val_loss", "final_train_loss", "final_val_loss",
                    "uniform_nats_per_pos") if k in meta},
    "arms": arms,
}
with open("results/prior_ft4l_r5/summary.json", "w") as f:
    json.dump(summary, f, indent=1)
print(json.dumps({k: {"keep": v.get("keep_rate"),
                      "exact_match": (v.get("novelty") or {}).get(
                          "exact_match_frac"),
                      "nn_overlap": ((v.get("novelty") or {}).get(
                          "nn_token_overlap") or {}).get("mean")}
                  for k, v in arms.items()}, indent=1))
EOF

echo "[prior-ft4l] done $(date -u +%FT%TZ)" >> "${LOG}"
cat results/prior_ft4l_r5/summary.json 2>/dev/null | head -40
