#!/usr/bin/env bash
# Round-4 stretch follow-up (VERDICT r3 #8): XLA_FLAGS died client-side
# on the axon relay (benchmarks/xla_flags_ab.json: parse_flags_from_env
# rejects every TPU flag), so try the route that travels WITH the
# compile request: per-compile PJRT compiler_options
# (benchmarks/compiler_options_ab.py). QUEUES behind stage2_ft3_r4;
# ft9_keeppush_r4 waits on THIS lock in turn (single TPU chip).

set -u
ROOT="$(cd "$(dirname "${BASH_SOURCE[0]}")/.." && pwd)"
cd "${ROOT}"
mkdir -p logs benchmarks
. scripts/lib_lock.sh
acquire_lock logs/.compiler_opts_r4.lock.d || {
  echo "[copts] another instance running; exiting"; exit 1; }
LOG=logs/compiler_opts_r4.log
echo "[copts] start $(date -u +%FT%TZ)" >> "${LOG}"

for dep in stage2_ft3_r4; do
  while [ -d "logs/.${dep}.lock.d" ]; do
    echo "[copts] waiting on ${dep} $(date -u +%FT%TZ)" >> "${LOG}"
    sleep 300
  done
done

for try in 1 2 3; do
  timeout 3600 python benchmarks/compiler_options_ab.py --iters 30 \
    --reps 2 --out benchmarks/compiler_options_ab.json \
    >> "${LOG}" 2>&1 && break
  echo "[copts] attempt ${try} failed; sleep 300" >> "${LOG}"
  sleep 300
done

echo "[copts] done $(date -u +%FT%TZ)" >> "${LOG}"
cat benchmarks/compiler_options_ab.json >> "${LOG}" 2>/dev/null
