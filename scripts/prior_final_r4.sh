#!/usr/bin/env bash
# Round-4 code-prior rework. The round-3 prior chain selected BEST-VAL
# params — but on this 3,276-sequence corpus the 8x1024 RVQ sequences
# are memorizable, so best-val lands at epoch 3 with val 6.918 nats vs
# the uniform floor ln(1024)=6.931: a near-uniform model whose samples
# measured identically to the uniform arm (results/prior_r3/vqsample_*,
# keep 0.0 everywhere). The generatively useful selection is the FINAL
# (memorizing, train 0.55 nats) model at reduced temperature; honesty
# about the memorization tradeoff comes from vq_sample_quality's new
# novelty metrics (exact-match fraction + NN token overlap vs the
# training codes) and the reconstruction-ceiling arm.
#
#   1. retrain prior (same args; train_code_prior now saves prior.npz
#      AND prior_final.npz)
#   2. final-params arms at t = 1.0 / 0.8 / 0.6, enriched stats
#   3. merge every arm JSON into results/prior_r3/summary.json
#
# QUEUES behind tok32_chain_r4 (single TPU chip).

set -u
ROOT="$(cd "$(dirname "${BASH_SOURCE[0]}")/.." && pwd)"
cd "${ROOT}"
mkdir -p logs results/prior_r3
. scripts/lib_lock.sh
acquire_lock logs/.prior_final_r4.lock.d || {
  echo "[priorf] another instance running; exiting"; exit 1; }
LOG=logs/prior_final_r4.log
echo "[priorf] start $(date -u +%FT%TZ)" >> "${LOG}"

for dep in round4_post_chain tok32_chain_r4; do
  while [ -d "logs/.${dep}.lock.d" ]; do
    echo "[priorf] waiting on ${dep} $(date -u +%FT%TZ)" >> "${LOG}"
    sleep 300
  done
done

CKPT=checkpoints/synth_vq_huge_ft2/last
CFG=configs/synth_vq_huge_ft2.yaml
CODES=results/prior_r3/codes
PRIOR=results/prior_r3/prior
[ -e "${CKPT}/_CHECKPOINT_METADATA" ] || {
  echo "[priorf] missing ${CKPT}" >> "${LOG}"; exit 1; }
[ -e "${CODES}/manifest.jsonl" ] || {
  echo "[priorf] missing ${CODES}" >> "${LOG}"; exit 1; }

retry () {  # retry <n> <sleep_s> <cmd...>
  local n="$1" s="$2"; shift 2
  for try in $(seq 1 "${n}"); do
    "$@" >> "${LOG}" 2>&1 && return 0
    echo "[priorf] attempt ${try} of $* failed; sleep ${s}s" >> "${LOG}"
    sleep "${s}"
  done
  return 1
}

[ -e "${PRIOR}/prior_final.npz" ] || retry 3 180 \
  python scripts/train_code_prior.py --codes_dir "${CODES}" \
    --out "${PRIOR}" --epochs 300 --batch 64 || exit 1

for t in 1.0 0.8 0.6; do
  tag="${t/./}"
  out="results/prior_r3/vqsample_final_t${tag}.json"
  [ -e "${out}" ] || retry 3 180 \
    python scripts/analysis/vq_sample_quality.py --config "${CFG}" \
      --ckpt "${CKPT}" --n 512 --seed 0 --prior_dir "${PRIOR}" \
      --prior_params final --temperature "${t}" --out "${out}" || exit 1
done

python - >> "${LOG}" 2>&1 <<'EOF'
import glob, json, os
arms = {}
for p in sorted(glob.glob("results/prior_r3/vqsample_*.json")):
    arms[os.path.basename(p)[len("vqsample_"):-len(".json")]] = \
        json.load(open(p))
meta = json.load(open("results/prior_r3/prior/meta.json"))
summary = {
    "what": "unconditional stage-2 generation A/B: uniform codes vs "
            "learned code prior (best-val and final params) vs the "
            "reconstruction ceiling, one decode/filter/stats path "
            "(scripts/analysis/vq_sample_quality.py)",
    "prior_meta": {k: meta[k] for k in
                   ("best_val_loss", "final_train_loss", "final_val_loss",
                    "uniform_nats_per_pos") if k in meta},
    "arms": arms,
}
with open("results/prior_r3/summary.json", "w") as f:
    json.dump(summary, f, indent=1)
print(json.dumps({k: {"keep": v.get("keep_rate"),
                      "bond_legal": v.get("curve_bond_legal_rate"),
                      "frac_in_band":
                          (v.get("decode_bond_stats") or {}).get(
                              "frac_in_band"),
                      "novelty_nn_overlap":
                          ((v.get("novelty") or {}).get(
                              "nn_token_overlap") or {}).get("mean")}
                  for k, v in arms.items()}, indent=1))
EOF

echo "[priorf] done $(date -u +%FT%TZ)" >> "${LOG}"
