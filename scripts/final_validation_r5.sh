#!/usr/bin/env bash
# Round-5 TERMINAL validation chain (VERDICT r4 #4 + #6): run the FULL
# validation set AFTER the last source commit, sequenced as the last
# chain on the chip so the round closes on a validated HEAD.
#
#   1. zoo bench refresh on the round-5 tree -> benchmarks/results_r4.json
#      (VERDICT #6; confirms/updates the 18-row table incl. MIWAE's
#      structural 0.65x note)
#   2. headline bench.py (one JSON line, TPU)
#   3. validate_flash_tpu.py (Mosaic lowering + parity on the real chip)
#   4. reproduce-line on the ft9 golden bundle (committed row 96.8%)
#   5. dryrun_multichip(8) on a virtual CPU mesh
#   6. full CPU test suite -> logs/suite_r5_head.log
#
# Evidence lands in results/validation_r5.json with the git rev it ran
# at; the builder commits that as the validation-evidence commit and the
# driver's snapshot commit becomes its child (VERDICT #4 done-criterion).
# QUEUES behind stage2_ft3g_r5 and prior_r5 (single TPU chip).

set -u
ROOT="$(cd "$(dirname "${BASH_SOURCE[0]}")/.." && pwd)"
cd "${ROOT}"
mkdir -p logs results benchmarks
. scripts/lib_lock.sh
acquire_lock logs/.final_validation_r5.lock.d || {
  echo "[finalval] another instance running; exiting"; exit 1; }
LOG=logs/final_validation_r5.log
echo "[finalval] start $(date -u +%FT%TZ) rev=$(git rev-parse --short HEAD)" >> "${LOG}"

for dep in ft9_keeppush_r4 stage2_ft3g_r5 prior_r5 stage2_ft4l_r5 \
           legalize_infer_ab_r5 prior_ft4l_r5 relax_infer_ab_r5; do
  while [ -d "logs/.${dep}.lock.d" ]; do
    echo "[finalval] waiting on ${dep} $(date -u +%FT%TZ)" >> "${LOG}"
    sleep 120
  done
done

REV="$(git rev-parse HEAD)"
PASS=1
declare -A STATUS

step () {  # step <name> <retries> <cmd...>
  local name="$1" n="$2"; shift 2
  for try in $(seq 1 "${n}"); do
    echo "[finalval] ${name} attempt ${try}: $*" >> "${LOG}"
    if "$@" >> "${LOG}" 2>&1; then
      STATUS[${name}]="ok"
      echo "[finalval] ${name} OK $(date -u +%FT%TZ)" >> "${LOG}"
      return 0
    fi
    sleep 120
  done
  STATUS[${name}]="FAIL"
  PASS=0
  echo "[finalval] ${name} FAILED $(date -u +%FT%TZ)" >> "${LOG}"
  return 1
}

# --- TPU stages (serialize on the one chip) ---
step zoo_bench 2 python benchmarks/run_all.py --out benchmarks/results_r4.json
step headline_bench 2 bash -c "python bench.py | tee results/bench_r5_head.json"
step validate_flash 2 python benchmarks/validate_flash_tpu.py
step reproduce_line 2 bash scripts/reproduce_line.sh

# --- CPU stages ---
step dryrun8 2 env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu \
  python __graft_entry__.py dryrun 8
step suite 1 bash -c "env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu \
  python -m pytest tests/ -q 2>&1 | tee logs/suite_r5_head.log | tail -3"

python - "$REV" "$PASS" <<'EOF'
import json, subprocess, sys, os
rev, ok = sys.argv[1], bool(int(sys.argv[2]))
out = {"what": "round-5 terminal validation chain (VERDICT r4 #4)",
       "git_rev": rev, "all_pass": ok, "stages": {}}
log = open("logs/final_validation_r5.log").read()
for name in ("zoo_bench", "headline_bench", "validate_flash",
             "reproduce_line", "dryrun8", "suite"):
    out["stages"][name] = ("ok" if f"[finalval] {name} OK" in log
                           else "FAIL")
if os.path.exists("results/bench_r5_head.json"):
    try:
        out["bench"] = json.load(open("results/bench_r5_head.json"))
    except Exception:
        pass
tail = [l for l in open("logs/suite_r5_head.log").read().splitlines()
        if "passed" in l or "failed" in l][-1:] if \
        os.path.exists("logs/suite_r5_head.log") else []
out["suite_tail"] = tail
with open("results/validation_r5.json", "w") as f:
    json.dump(out, f, indent=1)
print(json.dumps(out, indent=1))
EOF

echo "[finalval] done $(date -u +%FT%TZ) pass=${PASS}" >> "${LOG}"
[ "${PASS}" = "1" ]
