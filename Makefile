# pytorch_vae_tpu — top-level entry points.
#
# The reference repo is driven by bare python commands; these targets
# exist mainly so the headline experimental line can be resurrected on a
# fresh machine with one command (the checkpoint line was lost to
# machine recycling three times — CLAUDE.md round-3 notes).

.PHONY: test bench native reproduce-line dryrun golden

test:            ## full CPU test suite (~32 min)
	python -m pytest tests/ -q

bench:           ## headline TPU benchmark (one JSON line)
	python bench.py

native:          ## C++ filter kernels
	$(MAKE) -C native

dryrun:          ## 8-device virtual-mesh sharded train step
	python __graft_entry__.py dryrun 8

# Fresh clone -> committed golden bundle -> corpus regen -> latent banks
# -> OT -> 400k end2end -> keep-rate compared against the committed
# production row (results/aeot_runs/r4_ft9_bankx, 96.8%; LINE=ft8 for
# the round-4 row). TOL_PP=3.0 default tolerance.
reproduce-line:
	bash scripts/reproduce_line.sh

# Re-export the golden bundle from a live checkpoint line (maintainers).
golden:
	python scripts/export_golden.py --ckpt checkpoints/synth_ae_ft8/last \
	  --config configs/synth_ae_ft8.yaml --out golden/stage1_ft8.npz
