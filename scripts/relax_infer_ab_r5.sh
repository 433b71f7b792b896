#!/usr/bin/env bash
# Round-5 collision-relaxation inference A/B (zero retraining):
# ops/geometry.relax_collisions is parameter-free, so it can be switched
# on over the committed checkpoints exactly like the bond-legalization
# map. Controls are the landed legalize-era rows; every arm uses the
# same seeds/banks as its control.
#
#   A. strict-filter reconstruction ceiling, ft4l ckpt + relax
#      (control: 93.0% keep, seg 17 / point 14 / angle 5)
#   B. uniform-code sampling, ft4l + relax (control: 6.4%)
#   C. learned-prior arms t=0.6/0.8/1.0/topp09 decoded through relax
#      (controls: 55.9 / 53.7 / 51.6 / 54.9%)
#   D. honest-distortion leg: val aligned RMSD with the relax map
#      (controls: ft4l trained 3.53 A, ft3g+legalize 3.51 A)
#   E. stage-1 AE-OT end2end, ft9 ckpt + relax, same bank/OT/seed as
#      r4_ft9_bankx (controls: raw 96.8%, legalize-only 98.3%)
set -u
ROOT="$(cd "$(dirname "${BASH_SOURCE[0]}")/.." && pwd)"
cd "${ROOT}"
mkdir -p logs results/prior_ft4l_r5 results/stage2_r3 results/recon_r5
. scripts/lib_lock.sh
acquire_lock logs/.relax_infer_ab_r5.lock.d || {
  echo "[relaxab] another instance running; exiting"; exit 1; }
LOG=logs/relax_infer_ab_r5.log
echo "[relaxab] start $(date -u +%FT%TZ) rev=$(git rev-parse --short HEAD)" >> "${LOG}"

retry () {  # retry <n> <sleep_s> <cmd...>
  local n="$1" s="$2"; shift 2
  for try in $(seq 1 "${n}"); do
    "$@" >> "${LOG}" 2>&1 && return 0
    echo "[relaxab] attempt ${try} of $* failed; sleep ${s}s" >> "${LOG}"
    sleep "${s}"
  done
  return 1
}

CFG=configs/synth_vq_huge_ft4l_relax.yaml
CKPT=checkpoints/synth_vq_huge_ft4l/last
[ -e "${CKPT}/_CHECKPOINT_METADATA" ] || {
  echo "[relaxab] ft4l checkpoint missing" >> "${LOG}"; exit 1; }
PRIOR=results/prior_ft4l_r5/prior
CODES=results/prior_ft4l_r5/codes

# A. reconstruction ceiling with relaxation
[ -e results/stage2_r3/recon_ceiling_ft4l_relax.json ] || retry 3 120 \
  python scripts/analysis/vq_sample_quality.py \
    --config "${CFG}" --ckpt "${CKPT}" --n 512 --seed 0 --recon \
    --out results/stage2_r3/recon_ceiling_ft4l_relax.json || exit 1

# B. uniform-code arm
[ -e results/prior_ft4l_r5/vqsample_relax_uniform.json ] || retry 3 120 \
  python scripts/analysis/vq_sample_quality.py \
    --config "${CFG}" --ckpt "${CKPT}" --n 512 --seed 0 \
    --out results/prior_ft4l_r5/vqsample_relax_uniform.json || exit 1

# C. learned-prior arms through the relaxed decode
arm () {  # arm <tag> <extra args...>
  local tag="$1"; shift
  local out="results/prior_ft4l_r5/vqsample_relax_${tag}.json"
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
  arm t10_topp09 --temperature 1.0 --top_p 0.9 || exit 1
else
  echo "[relaxab] prior params missing; skipping arm C" >> "${LOG}"
fi

# D. honest-distortion leg: val aligned RMSD through the relax map
[ -e results/recon_r5/ft4l_relax/report.json ] || retry 3 120 \
  python scripts/analysis/reconstruct_dataset.py \
    --config "${CFG}" --ckpt "${CKPT}" --split val --quantize \
    --out_dir results/recon_r5/ft4l_relax || exit 1

# E. stage-1 end2end with relaxed decode, same bank/OT/seed as the
#    committed r4_ft9_bankx control and the r5_ft9_legal legalize arm
AECFG=configs/synth_ae_ft9_relax.yaml
AECKPT=checkpoints/synth_ae_ft9/last
if [ -e "${AECKPT}/_CHECKPOINT_METADATA" ] && \
   [ -e results/synth_latents_r4f_ft9m.npz ] && \
   [ -e results/synth_h_r4f_ft9m.npz ]; then
  [ -e results/aeot_runs/r5_ft9_relax/summary.json ] || retry 3 120 \
    python scripts/run_aeot_end2end.py \
      --ae_config "${AECFG}" --ae_ckpt "${AECKPT}" \
      --features_pt results/synth_latents_r4f_ft9m.npz \
      --ot_h results/synth_h_r4f_ft9m.npz \
      --out_root results/aeot_runs --run_name "r5_ft9_relax" \
      --n_generate 2000 --select_random --seed 42 \
      --num_gen_x 400000 --ot_bat_size_n 10000 --ot_thresh 0.3 \
      --decode_batch_size 128 --min_length 32 \
      --min_pairwise_dist 2.0 --neighbor_exclude 2 || exit 1
else
  echo "[relaxab] ft9 ckpt or bank missing; skipping arm E" >> "${LOG}"
fi

echo "[relaxab] done $(date -u +%FT%TZ)" >> "${LOG}"
for f in results/stage2_r3/recon_ceiling_ft4l_relax.json \
         results/prior_ft4l_r5/vqsample_relax_t06.json \
         results/aeot_runs/r5_ft9_relax/summary.json; do
  [ -e "$f" ] && { echo "== $f"; cat "$f"; }
done
