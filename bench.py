#!/usr/bin/env python
"""Headline benchmark: VanillaVAE train throughput, images/sec/chip @ 64x64.

BASELINE.md target: >= 10,000 train images/sec/chip on TPU v5e. Times the
full jitted train step (forward + ELBO + grads + Adam update) on synthetic
on-device data, bf16 conv compute / fp32 reductions, batch 1024.

Methodology note: on this image the TPU is reached through a relay where
`jax.block_until_ready` does NOT reliably wait for execution (measured:
20-step timing windows report enqueue rate, up to 10x the hardware's
possible FLOP rate). Every timing window here therefore ends with a hard
host fetch (`float(loss)`), which is an actual data dependency.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import optax

BATCH = 1024
IMAGE_SIZE = 64
WARMUP = 5
ITERS = 50
ROUNDS = 2
TARGET = 10_000.0


def main() -> None:
    from pytorch_vae_tpu.models.vanilla_vae import VanillaVAE

    n_chips = max(1, len(jax.devices()))
    model = VanillaVAE(in_channels=3, latent_dim=128, image_size=IMAGE_SIZE,
                       dtype=jnp.bfloat16)
    key = jax.random.PRNGKey(0)
    x0 = jax.random.uniform(key, (BATCH, IMAGE_SIZE, IMAGE_SIZE, 3),
                            jnp.float32) * 2 - 1
    variables = model.init({"params": key, "reparam": key}, x0, train=False)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    tx = optax.adam(1e-3)
    opt_state = tx.init(params)

    def train_step(params, batch_stats, opt_state, x, rng):
        def loss_fn(p):
            out, mut = model.apply(
                {"params": p, "batch_stats": batch_stats}, x, train=True,
                rngs={"reparam": rng}, mutable=["batch_stats"])
            ld = model.loss(*out, kld_weight=0.00025)
            return ld["loss"], mut["batch_stats"]

        (loss, new_bs), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state)
        params = optax.apply_updates(params, updates)
        return params, new_bs, opt_state, loss

    step = jax.jit(train_step, donate_argnums=(0, 1, 2))

    rngs = jax.random.split(jax.random.PRNGKey(1),
                            WARMUP + ROUNDS * ITERS)
    k = 0
    for _ in range(WARMUP):
        params, batch_stats, opt_state, loss = step(
            params, batch_stats, opt_state, x0, rngs[k])
        k += 1
    float(loss)  # hard sync

    best_dt = float("inf")
    for _ in range(ROUNDS):
        t0 = time.perf_counter()
        for _ in range(ITERS):
            params, batch_stats, opt_state, loss = step(
                params, batch_stats, opt_state, x0, rngs[k])
            k += 1
        float(loss)  # hard sync: actual data dependency on every step
        best_dt = min(best_dt, (time.perf_counter() - t0) / ITERS)

    per_chip = BATCH / best_dt / n_chips
    record = {
        "metric": "train images/sec/chip, VanillaVAE 64x64 bf16 batch "
                  f"{BATCH}",
        "value": round(per_chip, 1),
        "unit": "images/sec/chip",
        "vs_baseline": round(per_chip / TARGET, 4),
    }
    # secondary: sample (decode-only) throughput — BASELINE.json tracks
    # "sample imgs/sec" alongside train throughput
    try:
        sample = jax.jit(lambda k: model.apply(
            {"params": params, "batch_stats": batch_stats}, BATCH, k,
            method=VanillaVAE.sample))
        skeys = jax.random.split(jax.random.PRNGKey(7), 5 + ITERS)
        for i in range(5):
            imgs = sample(skeys[i])
        float(imgs[0, 0, 0, 0])
        t0 = time.perf_counter()
        for i in range(ITERS):
            imgs = sample(skeys[5 + i])
        float(imgs[0, 0, 0, 0])  # hard sync
        sdt = (time.perf_counter() - t0) / ITERS
        record["sample_images_per_sec_chip"] = round(
            BATCH / sdt / n_chips, 1)
    except Exception as e:
        record["sample_error"] = repr(e)[:200]

    # secondary: flagship curve VQ-VAE train step, reported as extra keys
    # on the same single JSON line (driver contract: one line)
    try:
        import os
        import sys

        sys.path.insert(0, os.path.join(
            os.path.dirname(os.path.abspath(__file__)), "benchmarks"))
        from run_all import bench_flagship

        fl = bench_flagship("bfloat16", 30)
        record["flagship_ms_per_step"] = round(fl["ms_per_step"], 2)
        record["flagship_curves_per_sec"] = round(fl["curves_per_sec"], 1)
    except Exception as e:  # headline metric must still print
        record["flagship_error"] = repr(e)[:200]
    print(json.dumps(record))


if __name__ == "__main__":
    main()
