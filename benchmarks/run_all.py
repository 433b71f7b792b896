#!/usr/bin/env python
"""Full benchmark sweep -> benchmarks/results.json.

Measures every headline number in BASELINE.md on the current hardware:
  - VanillaVAE train throughput (the bench.py metric),
  - flagship curve VQ-VAE train step (fp32 / bf16, rbg PRNG),
  - fused VQ nearest-code kernel vs the XLA path,
  - native filter kernels vs numpy.

All device timing windows end in a hard host fetch (see bench.py docstring
for why block_until_ready is not sufficient on this image).

Usage: python benchmarks/run_all.py [--quick] [--out benchmarks/results.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def bench_vanilla(batch: int, iters: int) -> dict:
    import jax
    import jax.numpy as jnp
    import optax

    from pytorch_vae_tpu.models.vanilla_vae import VanillaVAE

    model = VanillaVAE(in_channels=3, latent_dim=128, image_size=64,
                       dtype=jnp.bfloat16)
    key = jax.random.PRNGKey(0)
    x0 = jax.random.uniform(key, (batch, 64, 64, 3), jnp.float32) * 2 - 1
    variables = model.init({"params": key, "reparam": key}, x0, train=False)
    params = variables["params"]
    bs = variables.get("batch_stats", {})
    tx = optax.adam(1e-3)
    opt = tx.init(params)

    def train_step(params, bs, opt, x, rng):
        def loss_fn(p):
            out, mut = model.apply(
                {"params": p, "batch_stats": bs}, x, train=True,
                rngs={"reparam": rng}, mutable=["batch_stats"])
            return (model.loss(*out, kld_weight=0.00025)["loss"],
                    mut["batch_stats"])

        (loss, nbs), grads = jax.value_and_grad(loss_fn,
                                                has_aux=True)(params)
        upd, opt = tx.update(grads, opt)
        return optax.apply_updates(params, upd), nbs, opt, loss

    step = jax.jit(train_step, donate_argnums=(0, 1, 2))
    rngs = jax.random.split(jax.random.PRNGKey(1), iters + 5)
    for i in range(5):
        params, bs, opt, loss = step(params, bs, opt, x0, rngs[i])
    float(loss)
    t0 = time.perf_counter()
    for i in range(iters):
        params, bs, opt, loss = step(params, bs, opt, x0, rngs[5 + i])
    float(loss)
    dt = (time.perf_counter() - t0) / iters
    return {"ms_per_step": dt * 1e3, "images_per_sec": batch / dt,
            "batch": batch}


def bench_flagship(dtype_name: str, iters: int) -> dict:
    import jax

    jax.config.update("jax_default_prng_impl", "rbg")
    import jax.numpy as jnp
    import numpy as np
    import optax

    from pytorch_vae_tpu.config import (
        DEFAULT_WEIGHT_KEYS,
        STATIC_WEIGHT_KEYS,
    )
    from pytorch_vae_tpu.models.quantizer import (
        init_epoch_stats,
        init_vq_state,
    )
    from pytorch_vae_tpu.models.vq_vae import VQVAE
    from pytorch_vae_tpu.ops.losses import LossStatics, curve_loss

    B, L = 128, 350
    dt_map = {"float32": jnp.float32, "bfloat16": jnp.bfloat16}
    m = VQVAE(hidden_dim=512, num_layers=4, num_heads=8, ffn_dim=2048,
              max_seq_len=L, codebook_size=1024, code_dim=512,
              latent_tokens=64, num_quantizers=4,
              dtype=dt_map[dtype_name])
    k = jax.random.PRNGKey(0)
    x = jax.random.normal(k, (B, L, 6), jnp.float32)
    mask = jnp.asarray(
        np.arange(L)[None] < np.linspace(L // 2, L, B)[:, None])
    vqs = init_vq_state(jax.random.PRNGKey(1), m.vq_config)
    eps = init_epoch_stats(m.vq_config)
    variables = m.init({"params": k, "dropout": k, "aug": k, "reinit": k},
                       x[:1], mask[:1], vqs, eps, step=0, train=False)
    params = variables["params"]
    tx = optax.chain(optax.clip_by_global_norm(3.0), optax.adamw(2e-4))
    opt = tx.init(params)
    statics = LossStatics(use_vq=True, seq_len=L, xyz_tv=True, ss_tv=True)
    w = {kk: jnp.asarray(float(v), jnp.float32)
         for kk, v in DEFAULT_WEIGHT_KEYS.items()
         if kk not in STATIC_WEIGHT_KEYS}

    def step_fn(params, opt, vqs, eps, si, x, mask, rng):
        kd, ka, kr = jax.random.split(rng, 3)

        def loss_fn(p):
            out, nv, ne, _ = m.apply(
                {"params": p}, x, mask, vqs, eps, step=si, train=True,
                rngs={"dropout": kd, "aug": ka, "reinit": kr})
            ld = curve_loss(*out, w, statics, embedding=nv.embedding)
            return ld["loss"], (ld["loss"], nv, ne)

        grads, (loss, nv, ne) = jax.grad(loss_fn, has_aux=True)(params)
        upd, opt = tx.update(grads, opt, params)
        return optax.apply_updates(params, upd), opt, nv, ne, si + 1, loss

    jstep = jax.jit(step_fn, donate_argnums=(0, 1, 2, 3))
    si = jnp.asarray(0, jnp.int32)
    for i in range(3):
        params, opt, vqs, eps, si, loss = jstep(
            params, opt, vqs, eps, si, x, mask, jax.random.PRNGKey(2 + i))
    float(loss)
    t0 = time.perf_counter()
    for i in range(iters):
        params, opt, vqs, eps, si, loss = jstep(
            params, opt, vqs, eps, si, x, mask, jax.random.PRNGKey(9 + i))
    lv = float(loss)
    dt = (time.perf_counter() - t0) / iters
    return {"ms_per_step": dt * 1e3, "curves_per_sec": B / dt,
            "final_loss_finite": bool(lv == lv), "dtype": dtype_name}


ZOO_CONFIGS = (
    # every BASELINE.json benchmark config (file, table row name)
    ("configs/vae.yaml", "VanillaVAE"),
    ("configs/beta_vae.yaml", "BetaVAE"),
    ("configs/disentangled_beta_vae.yaml", "DisentangledBetaVAE"),
    ("configs/wae_mmd_rbf.yaml", "WAE-MMD (RBF)"),
    ("configs/wae_mmd_imq.yaml", "WAE-MMD (IMQ)"),
    ("configs/iwae.yaml", "IWAE K=5"),
    ("configs/miwae.yaml", "MIWAE K=5 M=3"),
    # round-3 zoo completion (remaining upstream-README rows)
    ("configs/cvae.yaml", "ConditionalVAE"),
    ("configs/cat_vae.yaml", "CategoricalVAE"),
    ("configs/joint_vae.yaml", "JointVAE"),
    ("configs/info_vae.yaml", "InfoVAE"),
    ("configs/dfc_vae.yaml", "DFCVAE"),
    ("configs/betatc_vae.yaml", "BetaTCVAE"),
    ("configs/mssim_vae.yaml", "MSSIMVAE"),
    ("configs/dip_vae.yaml", "DIPVAE"),
    ("configs/logcosh_vae.yaml", "LogCoshVAE"),
    ("configs/swae.yaml", "SWAE"),
)


def bench_zoo_model(config_path: str, iters: int, batch: int = 256) -> dict:
    """Train-step throughput for one zoo YAML through the real
    ZooExperiment path (model registry, loss kwargs, optimizer), bf16
    compute, synthetic on-device batch, hard-sync timing."""
    import jax
    import jax.numpy as jnp
    import yaml

    from pytorch_vae_tpu.parallel.mesh import make_mesh
    from pytorch_vae_tpu.training.zoo_experiment import ZooExperiment

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(root, config_path)) as f:
        cfg = yaml.safe_load(f)
    dp = dict(cfg["data_params"])
    dp.pop("data_path", None)  # force synthetic (no corpus on this image)
    dp["synthetic_size"] = batch
    dp["train_batch_size"] = batch
    ep = dict(cfg["exp_params"])
    ep["bf16"] = True
    exp = ZooExperiment(cfg["model_params"], ep, dp, cfg.get(
        "trainer_params"), verbose=False,
        mesh=make_mesh(data=1, model=1, devices=jax.devices()[:1]))
    exp.setup()
    exp.init_state()
    step = exp.make_train_step()
    x = jnp.asarray(next(iter(exp.train_loader)))
    for _ in range(3):
        exp.state, ld = step(exp.state, x, exp._base_rng)
    float(ld["loss"])
    t0 = time.perf_counter()
    for _ in range(iters):
        exp.state, ld = step(exp.state, x, exp._base_rng)
    loss = float(ld["loss"])  # hard sync
    dt = (time.perf_counter() - t0) / iters
    return {"ms_per_step": dt * 1e3, "images_per_sec": batch / dt,
            "batch": batch, "final_loss": loss,
            "img_size": int(dp.get("img_size", 64))}


def bench_vq_kernel(iters: int) -> dict:
    import jax
    import jax.numpy as jnp

    from pytorch_vae_tpu.ops.vq_pallas import (
        nearest_codes_pallas,
        nearest_codes_xla,
    )

    out = {}
    kf, ke = jax.random.split(jax.random.PRNGKey(0))
    for (n, k, d) in [(8192, 1024, 512), (8192, 4096, 512)]:
        flat = jax.random.normal(kf, (n, d), jnp.float32)
        emb = jax.random.normal(ke, (k, d), jnp.float32)
        for name, fn in [
            ("pallas", jax.jit(lambda f, e: nearest_codes_pallas(f, e))),
            ("xla", jax.jit(nearest_codes_xla)),
        ]:
            float(fn(flat, emb)[1][0])
            t0 = time.perf_counter()
            for _ in range(iters):
                r = fn(flat, emb)
            float(r[1][0])
            dt = (time.perf_counter() - t0) / iters
            out[f"N{n}_K{k}_{name}_ms"] = dt * 1e3
        out[f"N{n}_K{k}_speedup"] = (out[f"N{n}_K{k}_xla_ms"]
                                     / out[f"N{n}_K{k}_pallas_ms"])
    return out


def bench_filter() -> dict:
    import numpy as np

    from pytorch_vae_tpu.pipelines import filtering

    rng = np.random.default_rng(0)
    coords = np.cumsum(rng.normal(size=(350, 3)), axis=0).astype(
        np.float32) * 1.5
    lib = filtering._load_native()
    out = {"native_available": lib is not None}
    t0 = time.perf_counter()
    for _ in range(20):
        filtering.segment_clash_count(coords, 1.3, 1, 5)
    out["segment_clash_ms"] = (time.perf_counter() - t0) / 20 * 1e3
    if lib is not None:
        filtering._native_lib = None
        t0 = time.perf_counter()
        for _ in range(3):
            filtering.segment_clash_count(coords, 1.3, 1, 5)
        out["segment_clash_numpy_ms"] = (time.perf_counter() - t0) / 3 * 1e3
        filtering._native_lib = lib
        out["native_speedup"] = (out["segment_clash_numpy_ms"]
                                 / out["segment_clash_ms"])
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", type=str, default="benchmarks/results.json")
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--skip_flagship", action="store_true",
                    help="flagship compiles take minutes on the relay")
    ap.add_argument("--skip_zoo", action="store_true",
                    help="skip the per-model zoo sweep")
    args = ap.parse_args()

    import jax

    iters = 10 if args.quick else 50
    results = {
        "device": str(jax.devices()[0]),
        "backend": jax.default_backend(),
    }
    print("[bench] vanilla VAE ...", flush=True)
    results["vanilla_vae_b1024"] = bench_vanilla(1024, iters)
    if not args.skip_zoo:
        results["zoo"] = {}
        for cfg_path, row in ZOO_CONFIGS:
            print(f"[bench] zoo {row} ...", flush=True)
            try:
                results["zoo"][row] = bench_zoo_model(cfg_path, iters)
            except Exception as e:  # keep sweeping; record the failure
                results["zoo"][row] = {"error": repr(e)[:200]}
    print("[bench] VQ kernel ...", flush=True)
    results["vq_kernel"] = bench_vq_kernel(iters)
    print("[bench] native filter ...", flush=True)
    results["filter"] = bench_filter()
    if not args.skip_flagship:
        for dt in ("float32", "bfloat16"):
            print(f"[bench] flagship {dt} (slow compile) ...", flush=True)
            results[f"flagship_{dt}"] = bench_flagship(
                dt, max(10, iters // 2))
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps(results, indent=2))
    print(f"[done] -> {args.out}")


if __name__ == "__main__":
    main()
