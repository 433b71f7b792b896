#!/usr/bin/env bash
# Learned code-prior pipeline (round-3 continuation): gives stage-2 VQ
# models a REAL unconditional generation path. Baseline to beat: uniform
# per-level code sampling keeps 1.2% at 2x256 and 0.0% at 4x1024
# (results/mixstats_r3/vqsample_*.json) because residual levels are
# conditioned on earlier levels. Steps, one stage-2 checkpoint:
#
#   1. extract_code_indices.py    train-split token-major indices
#   2. train_code_prior.py        causal LM over the sequences
#   3. vq_sample_quality.py       uniform arm + prior arm (+ a 0.8-temp
#                                 prior arm), identical decode/filter
#
# QUEUES behind the stage-2 capacity escalation (single TPU chip): waits
# for scripts/stage2_capacity2_r3.sh's lock to clear, then uses the best
# stage-2 checkpoint present (8x1024 huge_ft2 preferred).

set -u
ROOT="$(cd "$(dirname "${BASH_SOURCE[0]}")/.." && pwd)"
cd "${ROOT}"
mkdir -p logs results/prior_r3
. scripts/lib_lock.sh
acquire_lock logs/.prior_chain_r3.lock.d || {
  echo "[prior] another instance running; exiting"; exit 1; }
LOG=logs/prior_chain_r3.log
echo "[prior] start $(date -u +%FT%TZ)" >> "${LOG}"

while [ -d logs/.stage2_capacity2_r3.lock.d ]; do
  echo "[prior] waiting on stage2_capacity2_r3 $(date -u +%FT%TZ)" >> "${LOG}"
  sleep 300
done

CFG=""; CKPT=""
for cand in synth_vq_huge_ft2 synth_vq_huge_ft synth_vq_huge \
            synth_vq_big_ft2 synth_vq_ft2; do
  if [ -e "checkpoints/${cand}/last/_CHECKPOINT_METADATA" ]; then
    CKPT="checkpoints/${cand}/last"
    CFG="configs/${cand}.yaml"
    break
  fi
done
[ -n "${CKPT}" ] || {
  echo "[prior] no stage-2 checkpoint found" >> "${LOG}"; exit 1; }
echo "[prior] using ${CKPT}" >> "${LOG}"

retry () {  # retry <n> <sleep_s> <cmd...>
  local n="$1" s="$2"; shift 2
  for try in $(seq 1 "${n}"); do
    "$@" >> "${LOG}" 2>&1 && return 0
    echo "[prior] attempt ${try} of $* failed; sleep ${s}s" >> "${LOG}"
    sleep "${s}"
  done
  return 1
}

CODES=results/prior_r3/codes
[ -e "${CODES}/manifest.jsonl" ] || retry 5 180 \
  python scripts/extract_code_indices.py --config "${CFG}" \
    --ckpt "${CKPT}" --out_dir "${CODES}" --split train || exit 1

PRIOR=results/prior_r3/prior
[ -e "${PRIOR}/prior.npz" ] || retry 3 180 \
  python scripts/train_code_prior.py --codes_dir "${CODES}" \
    --out "${PRIOR}" --epochs 300 --batch 64 || exit 1

[ -e results/prior_r3/vqsample_uniform.json ] || retry 3 180 \
  python scripts/analysis/vq_sample_quality.py --config "${CFG}" \
    --ckpt "${CKPT}" --n 512 --seed 0 \
    --out results/prior_r3/vqsample_uniform.json || exit 1

[ -e results/prior_r3/vqsample_prior.json ] || retry 3 180 \
  python scripts/analysis/vq_sample_quality.py --config "${CFG}" \
    --ckpt "${CKPT}" --n 512 --seed 0 --prior_dir "${PRIOR}" \
    --out results/prior_r3/vqsample_prior.json || exit 1

[ -e results/prior_r3/vqsample_prior_t08.json ] || retry 3 180 \
  python scripts/analysis/vq_sample_quality.py --config "${CFG}" \
    --ckpt "${CKPT}" --n 512 --seed 0 --prior_dir "${PRIOR}" \
    --temperature 0.8 \
    --out results/prior_r3/vqsample_prior_t08.json || exit 1

echo "[prior] done $(date -u +%FT%TZ)" >> "${LOG}"
for f in vqsample_uniform vqsample_prior vqsample_prior_t08; do
  echo "=== ${f} ==="; cat "results/prior_r3/${f}.json" 2>/dev/null; echo
done
