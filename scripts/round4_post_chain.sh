#!/usr/bin/env bash
# Round-4 post-chain work: everything that needs the TPU chip once the
# self-driving chains (stage2_capacity2_r3 -> prior_chain_r3) drain.
# Queued behind the prior chain's lock; each step is independent and
# non-fatal so one flaky tunnel window doesn't kill the rest.
#
#   1. golden bundle for the best stage-2 checkpoint (recycle-proofing)
#   2. decoder-pyramid upsampling A/B (VERDICT r3 #4) on the real chip
#   3. flash kernel hardware validation (must stay in the loop after any
#      kernel-adjacent change; CPU tests run Pallas in interpreter mode)
#   4. headline bench.py
#   5. make reproduce-line (golden-bundle end2end vs the committed row)

set -u
ROOT="$(cd "$(dirname "${BASH_SOURCE[0]}")/.." && pwd)"
cd "${ROOT}"
mkdir -p logs golden
. scripts/lib_lock.sh
acquire_lock logs/.round4_post_chain.lock.d || {
  echo "[post] another instance running; exiting"; exit 1; }
LOG=logs/round4_post_chain.log
echo "[post] start $(date -u +%FT%TZ)" >> "${LOG}"

for dep in stage2_capacity2_r3 prior_chain_r3; do
  while [ -d "logs/.${dep}.lock.d" ]; do
    echo "[post] waiting on ${dep} $(date -u +%FT%TZ)" >> "${LOG}"
    sleep 300
  done
done

retry () {  # retry <n> <sleep_s> <cmd...>
  local n="$1" s="$2"; shift 2
  for try in $(seq 1 "${n}"); do
    "$@" >> "${LOG}" 2>&1 && return 0
    echo "[post] attempt ${try} of $* failed; sleep ${s}s" >> "${LOG}"
    sleep "${s}"
  done
  return 1
}

# 1. stage-2 golden bundle (best available checkpoint)
for cand in synth_vq_huge_ft2 synth_vq_huge_ft synth_vq_huge; do
  if [ -e "checkpoints/${cand}/last/_CHECKPOINT_METADATA" ]; then
    [ -e "golden/stage2_${cand}.npz" ] || retry 2 60 \
      env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu \
      python scripts/export_golden.py --ckpt "checkpoints/${cand}/last" \
        --config "configs/${cand}.yaml" --out "golden/stage2_${cand}.npz"
    break
  fi
done

# 2. decoder upsampling A/B on the chip
[ -e benchmarks/decoder_upsample_ab.json ] || retry 3 300 \
  python benchmarks/decoder_upsample_ab.py \
    --out benchmarks/decoder_upsample_ab.json

# 3. flash kernel hardware validation
retry 3 300 python benchmarks/validate_flash_tpu.py || true

# 4. headline bench
retry 3 300 python bench.py || true

# 5. reproduce-line from the committed golden bundle
retry 2 300 bash scripts/reproduce_line.sh || true

# 6. full CPU test suite at HEAD (VERDICT r3 #7) — runs INSIDE this
# chain's lock so it can never contend with a training host process on
# the single CPU core
env -u PALLAS_AXON_POOL_IPS python -m pytest tests/ -q \
  > logs/suite_r4.log 2>&1
echo "[post] suite rc=$? (tail logs/suite_r4.log)" >> "${LOG}"
tail -2 logs/suite_r4.log >> "${LOG}"

echo "[post] done $(date -u +%FT%TZ)" >> "${LOG}"
