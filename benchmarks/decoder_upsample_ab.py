#!/usr/bin/env python
"""Decoder-pyramid upsampling A/B (VERDICT r3 #4).

The MIWAE roofline analysis (BASELINE.md) showed the deconv decoder is
~10x the encoder cost and HBM-bound; any decoder win multiplies across
all zoo rows AND narrows MIWAE's 0.65x target miss. This harness A/Bs
the three upsampling forms in models/conv.py on the real chip:

  deconv         nn.ConvTranspose stride 2 (parity default)
  pixel_shuffle  3x3 conv to 4F channels at LOW res + depth-to-space
  resize         nearest 2x + 3x3 conv

measuring (a) VanillaVAE train step, (b) MIWAE train step (M*K=15
decoder passes), (c) decode-only sampling throughput, bf16, alternating
modes x2 in one process (CLAUDE.md A/B convention), every timing window
ending in a hard host fetch.

Usage: python benchmarks/decoder_upsample_ab.py \
         [--iters 30] [--out benchmarks/decoder_upsample_ab.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

MODES = ("deconv", "pixel_shuffle", "resize")


def bench_train(model_name: str, mode: str, batch: int, iters: int) -> dict:
    import jax
    import jax.numpy as jnp
    import optax

    from pytorch_vae_tpu.models import conv as convlib

    convlib.set_upsample_override(mode)
    if model_name == "vanilla":
        from pytorch_vae_tpu.models.vanilla_vae import VanillaVAE
        model = VanillaVAE(in_channels=3, latent_dim=128, image_size=64,
                           dtype=jnp.bfloat16)
        loss_kwargs = {"kld_weight": 0.00025}
    elif model_name == "miwae":
        from pytorch_vae_tpu.models.miwae import MIWAE
        model = MIWAE(in_channels=3, latent_dim=128, image_size=64,
                      num_samples=5, num_estimates=3, dtype=jnp.bfloat16)
        loss_kwargs = {"kld_weight": 0.00025}
    else:
        raise ValueError(model_name)

    key = jax.random.PRNGKey(0)
    x0 = jax.random.uniform(key, (batch, 64, 64, 3), jnp.float32) * 2 - 1
    variables = model.init({"params": key, "reparam": key}, x0, train=False)
    params, bs = variables["params"], variables.get("batch_stats", {})
    tx = optax.adam(1e-3)
    opt = tx.init(params)

    def train_step(params, bs, opt, x, rng):
        def loss_fn(p):
            out, mut = model.apply(
                {"params": p, "batch_stats": bs}, x, train=True,
                rngs={"reparam": rng}, mutable=["batch_stats"])
            return model.loss(*out, **loss_kwargs)["loss"], \
                mut["batch_stats"]

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
    float(loss)  # hard host fetch: see CLAUDE.md benchmarking note
    dt = (time.perf_counter() - t0) / iters
    return {"ms_per_step": dt * 1e3, "images_per_sec": batch / dt}


def bench_decode(mode: str, batch: int, iters: int) -> dict:
    """Decode-only (sampling) throughput: the pyramid is 100% of the
    work, so this isolates the upsampling form's ceiling."""
    import jax
    import jax.numpy as jnp

    from pytorch_vae_tpu.models import conv as convlib

    convlib.set_upsample_override(mode)
    from pytorch_vae_tpu.models.vanilla_vae import VanillaVAE
    model = VanillaVAE(in_channels=3, latent_dim=128, image_size=64,
                       dtype=jnp.bfloat16)
    key = jax.random.PRNGKey(0)
    x0 = jax.random.uniform(key, (2, 64, 64, 3), jnp.float32)
    variables = model.init({"params": key, "reparam": key}, x0, train=False)
    z = jax.random.normal(key, (batch, 128), jnp.float32)

    @jax.jit
    def decode(v, z):
        return model.apply(v, z, train=False, method="decode")

    out = decode(variables, z)
    float(out.reshape(-1)[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = decode(variables, z)
    float(out.reshape(-1)[0])
    dt = (time.perf_counter() - t0) / iters
    return {"ms_per_batch": dt * 1e3, "images_per_sec": batch / dt}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--batch", type=int, default=1024)
    ap.add_argument("--miwae_batch", type=int, default=256)
    ap.add_argument("--out", default="benchmarks/decoder_upsample_ab.json")
    ap.add_argument("--reps", type=int, default=2,
                    help="alternating A/B repetitions per mode")
    args = ap.parse_args()

    import jax

    results = {"device": str(jax.devices()[0]),
               "batch": args.batch, "iters": args.iters, "runs": []}
    for rep in range(args.reps):
        for mode in MODES:
            row = {"rep": rep, "mode": mode}
            row["vanilla_train"] = bench_train(
                "vanilla", mode, args.batch, args.iters)
            row["miwae_train"] = bench_train(
                "miwae", mode, args.miwae_batch, args.iters)
            row["decode_only"] = bench_decode(mode, args.batch, args.iters)
            results["runs"].append(row)
            print(json.dumps(row))

    # per-mode medians across reps
    summary = {}
    for mode in MODES:
        rows = [r for r in results["runs"] if r["mode"] == mode]
        summary[mode] = {
            k: sorted(r[k]["images_per_sec"] for r in rows)[len(rows) // 2]
            for k in ("vanilla_train", "miwae_train", "decode_only")}
    results["summary_img_per_sec_median"] = summary
    with open(args.out, "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(summary, indent=1))


if __name__ == "__main__":
    main()
