#!/usr/bin/env python
"""Two-stage training entry point (TPU-native).

Mirrors the reference CLI exactly (run.py:96-223):

  # Stage 1: AE pretrain (no quantization)
  python run.py --config configs/stage1_ae.yaml

  # Stage 2: VQ fine-tune with warm start and codebook init
  python run.py -c configs/stage2_vq.yaml \
      --warm_start_ckpt checkpoints/stage1/last \
      --init_codebook kmeans_centroids.npy

  # Resume a full checkpoint (model+optimizer+step+epoch);
  # warm-start and codebook init are skipped (run.py:130-157)
  python run.py -c configs/stage2_vq.yaml --resume_ckpt checkpoints/.../last

Extra conveniences over the reference:
  --synthetic N  materialize an N-curve synthetic dataset when the config's
                 npy_dir does not exist (the reference's private dataset is
                 not mounted), and
  --max_epochs / --limit_train_batches overrides for smoke runs.
"""

from __future__ import annotations

import argparse
import os
import time


def main() -> None:
    parser = argparse.ArgumentParser(
        description="Train VQ-VAE (two-stage compatible).")
    parser.add_argument("--config", "-c", type=str, required=True)
    parser.add_argument("--warm_start_ckpt", type=str, default="")
    parser.add_argument("--init_codebook", type=str, default="")
    parser.add_argument("--resume_ckpt", type=str, default="")
    parser.add_argument("--synthetic", type=int, default=0,
                        help="generate a synthetic dataset of this many "
                             "curves if npy_dir is missing")
    parser.add_argument("--max_epochs", type=int, default=None)
    parser.add_argument("--limit_train_batches", type=int, default=None)
    parser.add_argument("--cpu", action="store_true",
                        help="force the CPU backend")
    parser.add_argument("--profile", type=str, default="",
                        help="write a jax.profiler trace to this directory")
    args = parser.parse_args()

    if args.cpu:
        os.environ["JAX_PLATFORMS"] = "cpu"

    from pytorch_vae_tpu import config as cfglib
    from pytorch_vae_tpu.training.experiment import VQVAEExperiment

    cfg = cfglib.load_yaml(args.config)
    model_params = cfg["model_params"]
    exp_params = cfg["exp_params"]
    data_params = cfg["data_params"]
    trainer_params = cfg.get("trainer_params", {})
    logging_params = cfg.get("logging_params", {})

    seed = exp_params.get("manual_seed", 42)
    print(f"[Seed] manual_seed={seed}")

    # Dispatch: classic image-zoo models (registry names like "VanillaVAE")
    # run through the zoo experiment; everything else is the curve VQ-VAE
    # two-stage flow.
    from pytorch_vae_tpu.models import vae_models
    from pytorch_vae_tpu.models.vq_vae import VQVAE as _CurveVQVAE

    name_key = model_params.get("name", "VQVAE")
    if name_key in vae_models and vae_models[name_key] is not _CurveVQVAE:
        from pytorch_vae_tpu.training.zoo_experiment import ZooExperiment

        zoo = ZooExperiment(model_params, exp_params, data_params,
                            trainer_params, logging_params)
        print(f"======= Training {name_key} (zoo) =======")
        start = time.time()
        zoo.fit(max_epochs=args.max_epochs,
                resume_ckpt=args.resume_ckpt or None,
                limit_train_batches=args.limit_train_batches)
        print(f"[Done] Training completed in "
              f"{(time.time() - start) / 60:.2f} minutes.")
        return

    if "npy_dir" not in data_params:
        raise KeyError(
            f"model name {name_key!r} is not a registered zoo model "
            f"({sorted(vae_models)}) and the config has no curve-data "
            f"'npy_dir' — typo in model_params.name?")

    npy_dir = data_params["npy_dir"]
    if args.synthetic and not os.path.isdir(npy_dir):
        from pytorch_vae_tpu.data.synthetic import make_synthetic_curve_dir

        n = int(args.synthetic)
        print(f"[Data] npy_dir missing; generating {n} synthetic curves "
              f"at {npy_dir}")
        make_synthetic_curve_dir(npy_dir, n_train=max(1, int(n * 0.8)),
                                 n_val=max(1, n - int(n * 0.8)), seed=seed,
                                 max_len=int(model_params.get("max_seq_len",
                                                              350)))

    experiment = VQVAEExperiment(
        model_params, exp_params, data_params, trainer_params, logging_params)

    is_resume = bool(args.resume_ckpt)
    if is_resume and not os.path.exists(args.resume_ckpt):
        raise FileNotFoundError(f"[Resume] ckpt not found: {args.resume_ckpt}")

    name = logging_params.get("name", model_params.get("name", "VQVAE"))
    if is_resume:
        name = f"{name}-resume"
    log_dir = os.path.join(logging_params.get("save_dir", "./logs"), name)
    ckpt_dir = exp_params.get("checkpoint_dir", "./checkpoints/default")

    model_name = model_params.get("name", "VQVAE")
    print(f"======= Training {model_name} =======")
    print("use_vq =", model_params.get("use_vq", True))

    from pytorch_vae_tpu.utils.profiling import maybe_profile

    start = time.time()
    with maybe_profile(args.profile or None):
        experiment.fit(
            max_epochs=args.max_epochs,
            resume_ckpt=args.resume_ckpt or None,
            warm_start_ckpt=(None if is_resume else
                             (args.warm_start_ckpt or None)),
            init_codebook=(None if is_resume else
                           (args.init_codebook or None)),
            log_dir=log_dir,
            ckpt_dir=ckpt_dir,
            limit_train_batches=args.limit_train_batches,
        )
    mins = (time.time() - start) / 60.0
    print(f"[Done] Training completed in {mins:.2f} minutes.")
    print(f"[Checkpoint dir] {os.path.abspath(ckpt_dir)}")
    print(f"[TensorBoard log] {os.path.abspath(log_dir)}")


if __name__ == "__main__":
    main()
