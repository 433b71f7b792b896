#!/usr/bin/env bash
# Round-5 code-prior retrain on a NON-MEMORIZABLE corpus (VERDICT r4 #3).
# The round-4 prior was trained on 3,276 sequences — memorizable by
# construction; its best arm (t=0.6, keep 17.6%) ran at 75% exact-match
# to training codes. This chain:
#   1. generates a 49,152-curve corpus (seed 13; same generator/length
#      band as the training corpus, 15x the sequences)
#   2. extracts RVQ code indices with the best stage-2 checkpoint
#      (ft3g if the round-5 leg landed, else the committed ft2 golden)
#   3. trains the causal code prior on them (100 ep — the corpus is the
#      regularizer now, not early stopping)
#   4. decodes arms through the one strict-filter path: final params at
#      t = 1.0 / 0.8 / 0.6, plus the previously-unmeasured top_k=64 and
#      nucleus top_p=0.9 arms; novelty metrics vs the new corpus codes
# Done-criterion from VERDICT: an arm with keep >= 10% at exact-match
# < 10%, or the measured negative.
# QUEUES behind stage2_ft3g_r5 (single TPU chip).

set -u
ROOT="$(cd "$(dirname "${BASH_SOURCE[0]}")/.." && pwd)"
cd "${ROOT}"
mkdir -p logs results/prior_r4
. scripts/lib_lock.sh
acquire_lock logs/.prior_r5.lock.d || {
  echo "[prior5] another instance running; exiting"; exit 1; }
LOG=logs/prior_r5.log
echo "[prior5] start $(date -u +%FT%TZ)" >> "${LOG}"

for dep in ft9_keeppush_r4 stage2_ft3g_r5; do
  while [ -d "logs/.${dep}.lock.d" ]; do
    echo "[prior5] waiting on ${dep} $(date -u +%FT%TZ)" >> "${LOG}"
    sleep 120
  done
done

retry () {  # retry <n> <sleep_s> <cmd...>
  local n="$1" s="$2"; shift 2
  for try in $(seq 1 "${n}"); do
    "$@" >> "${LOG}" 2>&1 && return 0
    echo "[prior5] attempt ${try} of $* failed; sleep ${s}s" >> "${LOG}"
    sleep "${s}"
  done
  return 1
}

# 1. Non-memorizable corpus (deterministic; CPU).
if [ ! -e data/synth_curves_prior/train_list.txt ]; then
  env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu python -c "
from pytorch_vae_tpu.data.synthetic import make_synthetic_curve_dir
make_synthetic_curve_dir('data/synth_curves_prior', n_train=49152, n_val=8,
                         seed=13, min_len=48, max_len=96)" >> "${LOG}" 2>&1 || exit 1
fi

# 2. Stage-2 encoder: prefer the round-5 ft3g leg, fall back to the
#    committed golden bundle (AEBundle accepts either).
CKPT=checkpoints/synth_vq_huge_ft3g/last
CFG=configs/synth_vq_huge_ft3g.yaml
if [ ! -e "${CKPT}/_CHECKPOINT_METADATA" ]; then
  CKPT=golden/stage2_synth_vq_huge_ft2.npz
  CFG=configs/synth_vq_huge_ft2.yaml
fi
echo "[prior5] stage-2 source: ${CKPT}" >> "${LOG}"

CODES=results/prior_r4/codes
PRIOR=results/prior_r4/prior

# extract_code_indices reads the config's npy_dir: point it at the prior
# corpus via a derived config.
DCFG=results/prior_r4/extract_config.yaml
env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu python - "$CFG" "$DCFG" <<'EOF' || exit 1
import sys, yaml
cfg = yaml.safe_load(open(sys.argv[1]))
cfg["data_params"]["npy_dir"] = "./data/synth_curves_prior"
with open(sys.argv[2], "w") as f:
    yaml.safe_dump(cfg, f)
EOF

[ -e "${CODES}/manifest.jsonl" ] || retry 3 180 \
  python scripts/extract_code_indices.py --config "${DCFG}" \
    --ckpt "${CKPT}" --out_dir "${CODES}" --batch_size 256 \
    --split train || exit 1

# 3. Train the prior. 49k sequences: the corpus regularizes; keep both
#    best-val and final params (train_code_prior saves both).
[ -e "${PRIOR}/prior_final.npz" ] || retry 3 180 \
  python scripts/train_code_prior.py --codes_dir "${CODES}" \
    --out "${PRIOR}" --epochs 100 --batch 128 || exit 1

# 4. Arms. One decode/filter/stats path for all of them.
arm () {  # arm <tag> <extra args...>
  local tag="$1"; shift
  local out="results/prior_r4/vqsample_${tag}.json"
  [ -e "${out}" ] || retry 3 180 \
    python scripts/analysis/vq_sample_quality.py --config "${CFG}" \
      --ckpt "${CKPT}" --n 512 --seed 0 --prior_dir "${PRIOR}" \
      --prior_params final --novelty_codes_dir "${CODES}" \
      --out "${out}" "$@" || return 1
}
arm t10 --temperature 1.0 || exit 1
arm t08 --temperature 0.8 || exit 1
arm t06 --temperature 0.6 || exit 1
arm t10_topk64 --temperature 1.0 --top_k 64 || exit 1
arm t10_topp09 --temperature 1.0 --top_p 0.9 || exit 1
arm best_t10 --temperature 1.0 --prior_params best || true

python - >> "${LOG}" 2>&1 <<'EOF'
import glob, json, os
arms = {}
for p in sorted(glob.glob("results/prior_r4/vqsample_*.json")):
    arms[os.path.basename(p)[len("vqsample_"):-len(".json")]] = \
        json.load(open(p))
meta = json.load(open("results/prior_r4/prior/meta.json"))
summary = {
    "what": "code prior retrained on a non-memorizable 49,152-sequence "
            "corpus (VERDICT r4 #3): keep-rate vs novelty arms incl. "
            "top-k and nucleus sampling, one decode/filter/stats path",
    "corpus": {"dir": "data/synth_curves_prior", "n_train": 49152,
               "seed": 13, "len": [48, 96]},
    "prior_meta": {k: meta[k] for k in
                   ("best_val_loss", "final_train_loss", "final_val_loss",
                    "uniform_nats_per_pos") if k in meta},
    "arms": arms,
}
with open("results/prior_r4/summary.json", "w") as f:
    json.dump(summary, f, indent=1)
print(json.dumps({k: {"keep": v.get("keep_rate"),
                      "exact_match": (v.get("novelty") or {}).get(
                          "exact_match_frac"),
                      "nn_overlap": ((v.get("novelty") or {}).get(
                          "nn_token_overlap") or {}).get("mean")}
                  for k, v in arms.items()}, indent=1))
EOF

echo "[prior5] done $(date -u +%FT%TZ)" >> "${LOG}"
cat results/prior_r4/summary.json 2>/dev/null | head -40
