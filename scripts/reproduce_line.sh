#!/usr/bin/env bash
# Recycle-proof headline reproduction: fresh clone -> committed golden
# bundle -> keep-rate within noise of the committed production row.
#
# The checkpoint line was lost to machine recycling three times in round
# 3 (CLAUDE.md); everything this script needs is in git:
#   golden/synth_ae_ft9.npz        params-only bundle (scripts/export_golden.py)
#   corpus generation commands     deterministic (np.default_rng)
#   results/aeot_runs/r4_ft9_bankx committed row to match (1936/2000 = 96.8%)
#
# Default target is the round-5 production row (ft9); override via
#   LINE=ft8 bash scripts/reproduce_line.sh
# to reproduce the round-4 row instead.
#
# Pipeline (identical args to scripts/ft9_keeppush_r4.sh's eval stage):
#   corpora (seed 7 train + seed 11 extraction-only)
#   -> extract latents with the golden bundle (both corpora) -> merge
#   -> train OT potential (seed 0) -> 400k end2end -> compare keep-rate.
#
# Runs on whatever JAX platform the environment provides (TPU: ~6 min
# after backend init; CPU: slower but exact). Exit 0 iff the keep-rate
# lands within TOL_PP of the committed row.

set -eu
ROOT="$(cd "$(dirname "${BASH_SOURCE[0]}")/.." && pwd)"
cd "${ROOT}"
LINE="${LINE:-ft9}"
case "${LINE}" in
  ft9)
    GOLD=golden/synth_ae_ft9.npz
    CFG=configs/synth_ae_ft9.yaml
    REF=results/aeot_runs/r4_ft9_bankx/summary.json
    RUN=repro_ft9_bankx
    ;;
  ft8)
    GOLD=golden/stage1_ft8.npz
    CFG=configs/synth_ae_ft8.yaml
    REF=results/aeot_runs/r3_ft8_bankx/summary.json
    RUN=repro_ft8_bankx
    ;;
  *) echo "unknown LINE=${LINE} (ft9|ft8)"; exit 1 ;;
esac
OUT=results/repro_${LINE}
TOL_PP="${TOL_PP:-3.0}"   # binomial sd at n=2000/p=.95 is ~0.5 pp
mkdir -p "${OUT}" logs

[ -e "${GOLD}" ] || { echo "missing ${GOLD} (committed bundle)"; exit 1; }

if [ ! -e data/synth_curves/train_list.txt ]; then
  python -c "
from pytorch_vae_tpu.data.synthetic import make_synthetic_curve_dir
make_synthetic_curve_dir('data/synth_curves', n_train=3276, n_val=820,
                         seed=7, min_len=48, max_len=96)
print('[repro] corpus: 3276/820, seed 7, len 48-96')"
fi
if [ ! -e data/synth_curves_bankx/train_list.txt ]; then
  python -c "
from pytorch_vae_tpu.data.synthetic import make_synthetic_curve_dir
make_synthetic_curve_dir('data/synth_curves_bankx', n_train=8192, n_val=8,
                         seed=11, min_len=48, max_len=96)
print('[repro] bankx corpus: 8192 extraction-only, seed 11')"
fi

[ -e "${OUT}/latents_main.npz" ] || python scripts/extract_ae_latents.py \
  --config "${CFG}" --ckpt "${GOLD}" --out "${OUT}/latents_main.npz" \
  --len_min 1 --len_max 96 --npy_dir data/synth_curves
[ -e "${OUT}/latents_bankx.npz" ] || python scripts/extract_ae_latents.py \
  --config "${CFG}" --ckpt "${GOLD}" --out "${OUT}/latents_bankx.npz" \
  --len_min 1 --len_max 96 --npy_dir data/synth_curves_bankx
[ -e "${OUT}/latents_merged.npz" ] || \
  python scripts/analysis/merge_latent_banks.py \
    --banks "${OUT}/latents_main.npz" "${OUT}/latents_bankx.npz" \
    --out "${OUT}/latents_merged.npz"
[ -e "${OUT}/h.npz" ] || python scripts/train_ot_potential.py \
  --features "${OUT}/latents_merged.npz" --out "${OUT}/h.npz"

[ -e "results/aeot_runs/${RUN}/summary.json" ] || \
  python scripts/run_aeot_end2end.py \
    --ae_config "${CFG}" --ae_ckpt "${GOLD}" \
    --features_pt "${OUT}/latents_merged.npz" --ot_h "${OUT}/h.npz" \
    --out_root results/aeot_runs --run_name "${RUN}" \
    --n_generate 2000 --select_random --seed 42 \
    --num_gen_x 400000 --ot_bat_size_n 10000 --ot_thresh 0.3 \
    --decode_batch_size 128 --min_length 32 \
    --min_pairwise_dist 2.0 --neighbor_exclude 2

python - "$REF" "results/aeot_runs/${RUN}/summary.json" "${TOL_PP}" <<'EOF'
import json, sys
ref, got, tol = json.load(open(sys.argv[1])), json.load(open(sys.argv[2])), float(sys.argv[3])
kr = 100.0 * ref["kept"] / ref["total_decoded"]
kg = 100.0 * got["kept"] / got["total_decoded"]
print(f"[repro] committed keep {kr:.1f}%  reproduced {kg:.1f}%  "
      f"(tolerance ±{tol} pp)")
print(f"[repro] rejects committed={ref['reject_counts']}")
print(f"[repro] rejects reproduced={got['reject_counts']}")
ok = abs(kg - kr) <= tol
print("[repro] PASS" if ok else "[repro] FAIL")
sys.exit(0 if ok else 1)
EOF
