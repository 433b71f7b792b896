#!/usr/bin/env bash
# Round-4 stretch (VERDICT r3 #8): compiler-level flagship A/B via
# XLA_FLAGS variants (benchmarks/xla_flags_ab.py — fresh subprocess per
# variant because XLA_FLAGS are process-scoped). All kernel-level levers
# at 121 ms are measured negatives; roofline memory floor is 114.6 ms.
# QUEUES behind prior_final_r4 (single TPU chip).

set -u
ROOT="$(cd "$(dirname "${BASH_SOURCE[0]}")/.." && pwd)"
cd "${ROOT}"
mkdir -p logs benchmarks
. scripts/lib_lock.sh
acquire_lock logs/.xla_flags_r4.lock.d || {
  echo "[xlaf] another instance running; exiting"; exit 1; }
LOG=logs/xla_flags_r4.log
echo "[xlaf] start $(date -u +%FT%TZ)" >> "${LOG}"

for dep in round4_post_chain tok32_chain_r4 prior_final_r4; do
  while [ -d "logs/.${dep}.lock.d" ]; do
    echo "[xlaf] waiting on ${dep} $(date -u +%FT%TZ)" >> "${LOG}"
    sleep 300
  done
done

for try in 1 2 3; do
  python benchmarks/xla_flags_ab.py --iters 30 --reps 2 \
    --out benchmarks/xla_flags_ab.json >> "${LOG}" 2>&1 && break
  echo "[xlaf] attempt ${try} failed; sleep 300" >> "${LOG}"
  sleep 300
done

echo "[xlaf] done $(date -u +%FT%TZ)" >> "${LOG}"
cat benchmarks/xla_flags_ab.json >> "${LOG}" 2>/dev/null
