#!/usr/bin/env bash
# Round-5 INFERENCE-legalization A/B (VERDICT r4 #2 follow-through).
# ops/geometry.legalize_bond_lengths is parameter-free, so it can be
# switched on over EXISTING checkpoints with no retraining. This chain
# measures that zero-training arm everywhere the short-bond pathology
# binds, against committed controls:
#   A. strict-filter reconstruction ceiling, ft3g ckpt + legalize
#      (control: 26.2% keep, recon_ceiling_ft3g.json; ft2 21.9%)
#   B. uniform-code sampling, ft3g + legalize (control: 0.0%)
#   C. learned-prior arms t=0.6/0.8/1.0 decoded through ft3g + legalize
#      — the prior was TRAINED on ft3g codes, so this is the perfectly
#      matched unconditional path (controls: 11.3/9.6/8.4% keep at
#      exact-match 0.0, results/prior_r4/summary.json)
#   D. honest-distortion leg: val aligned RMSD of quantized decodes with
#      vs without the map (reconstruct_dataset.py; legality must not be
#      bought with geometry — the round-4 rescaling probe exploded RMSD
#      2.75 -> 10.2 A and was rejected on exactly this check)
#   E. stage-1 AE-OT end2end, ft9 ckpt + legalize, same bank/OT/seed as
#      the committed r4_ft9_bankx row (control: 96.8% keep, bond_out 29,
#      seg 27) -> results/aeot_runs/r5_ft9_legal
# QUEUES behind stage2_ft4l_r5 (single TPU chip).

set -u
ROOT="$(cd "$(dirname "${BASH_SOURCE[0]}")/.." && pwd)"
cd "${ROOT}"
mkdir -p logs results/stage2_r3 results/prior_r4 results/recon_r5
. scripts/lib_lock.sh
acquire_lock logs/.legalize_infer_ab_r5.lock.d || {
  echo "[leginf] another instance running; exiting"; exit 1; }
LOG=logs/legalize_infer_ab_r5.log
echo "[leginf] start $(date -u +%FT%TZ)" >> "${LOG}"

for dep in ft9_keeppush_r4 stage2_ft3g_r5 prior_r5 stage2_ft4l_r5; do
  while [ -d "logs/.${dep}.lock.d" ]; do
    echo "[leginf] waiting on ${dep} $(date -u +%FT%TZ)" >> "${LOG}"
    sleep 120
  done
done

retry () {  # retry <n> <sleep_s> <cmd...>
  local n="$1" s="$2"; shift 2
  for try in $(seq 1 "${n}"); do
    "$@" >> "${LOG}" 2>&1 && return 0
    echo "[leginf] attempt ${try} of $* failed; sleep ${s}s" >> "${LOG}"
    sleep "${s}"
  done
  return 1
}

CFG=configs/synth_vq_huge_ft3g_legal.yaml
CKPT=checkpoints/synth_vq_huge_ft3g/last
[ -e "${CKPT}/_CHECKPOINT_METADATA" ] || {
  echo "[leginf] ft3g checkpoint missing" >> "${LOG}"; exit 1; }
PRIOR=results/prior_r4/prior
CODES=results/prior_r4/codes

# A. reconstruction ceiling with inference legalization
[ -e results/stage2_r3/recon_ceiling_ft3g_legal.json ] || retry 3 120 \
  python scripts/analysis/vq_sample_quality.py \
    --config "${CFG}" --ckpt "${CKPT}" --n 512 --seed 0 --recon \
    --out results/stage2_r3/recon_ceiling_ft3g_legal.json || exit 1

# B. uniform-code arm
[ -e results/prior_r4/vqsample_ft3g_legal_uniform.json ] || retry 3 120 \
  python scripts/analysis/vq_sample_quality.py \
    --config "${CFG}" --ckpt "${CKPT}" --n 512 --seed 0 \
    --out results/prior_r4/vqsample_ft3g_legal_uniform.json || exit 1

# C. learned-prior arms through the legalized decode
arm () {  # arm <tag> <extra args...>
  local tag="$1"; shift
  local out="results/prior_r4/vqsample_legal_${tag}.json"
  [ -e "${out}" ] || retry 3 120 \
    python scripts/analysis/vq_sample_quality.py --config "${CFG}" \
      --ckpt "${CKPT}" --n 512 --seed 0 --prior_dir "${PRIOR}" \
      --prior_params final --novelty_codes_dir "${CODES}" \
      --out "${out}" "$@" || return 1
}
if [ -e "${PRIOR}/prior_final.npz" ]; then
  arm t06 --temperature 0.6 || exit 1
  arm t08 --temperature 0.8 || exit 1
  arm t10 --temperature 1.0 || exit 1
else
  echo "[leginf] prior params missing; skipping arm C" >> "${LOG}"
fi

# D. honest-distortion leg: val aligned RMSD with vs without the map
[ -e results/recon_r5/ft3g_legal/report.json ] || retry 3 120 \
  python scripts/analysis/reconstruct_dataset.py \
    --config "${CFG}" --ckpt "${CKPT}" --split val --quantize \
    --out_dir results/recon_r5/ft3g_legal || exit 1
[ -e results/recon_r5/ft3g_raw/report.json ] || retry 3 120 \
  python scripts/analysis/reconstruct_dataset.py \
    --config configs/synth_vq_huge_ft3g.yaml --ckpt "${CKPT}" \
    --split val --quantize \
    --out_dir results/recon_r5/ft3g_raw || exit 1

# E. stage-1 end2end with legalized decode, same bank/OT/seed as the
#    committed r4_ft9_bankx control
AECFG=configs/synth_ae_ft9_legal.yaml
AECKPT=checkpoints/synth_ae_ft9/last
if [ -e "${AECKPT}/_CHECKPOINT_METADATA" ] && \
   [ -e results/synth_latents_r4f_ft9m.npz ] && \
   [ -e results/synth_h_r4f_ft9m.npz ]; then
  [ -e results/aeot_runs/r5_ft9_legal/summary.json ] || retry 3 120 \
    python scripts/run_aeot_end2end.py \
      --ae_config "${AECFG}" --ae_ckpt "${AECKPT}" \
      --features_pt results/synth_latents_r4f_ft9m.npz \
      --ot_h results/synth_h_r4f_ft9m.npz \
      --out_root results/aeot_runs --run_name "r5_ft9_legal" \
      --n_generate 2000 --select_random --seed 42 \
      --num_gen_x 400000 --ot_bat_size_n 10000 --ot_thresh 0.3 \
      --decode_batch_size 128 --min_length 32 \
      --min_pairwise_dist 2.0 --neighbor_exclude 2 || exit 1
else
  echo "[leginf] ft9 ckpt or bank missing; skipping arm E" >> "${LOG}"
fi

echo "[leginf] done $(date -u +%FT%TZ)" >> "${LOG}"
for f in results/stage2_r3/recon_ceiling_ft3g_legal.json \
         results/prior_r4/vqsample_legal_t06.json \
         results/aeot_runs/r5_ft9_legal/summary.json; do
  [ -e "$f" ] && { echo "== $f"; cat "$f"; }
done
