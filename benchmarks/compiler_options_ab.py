#!/usr/bin/env python
"""Flagship compiler-options A/B for the remote-compile axon backend.

benchmarks/xla_flags_ab.py measured that EVERY TPU compiler flag in
XLA_FLAGS dies client-side (`parse_flags_from_env: Unknown flag`): the
axon client's XLA build only knows client flags, and compilation happens
on the relay server, so the env route cannot reach the TPU compiler at
all. The route that CAN is per-compile `compiler_options` — they are
serialized into the PJRT compile request (env_option_overrides) and
travel with it to wherever compilation happens.

Single process (one backend init), flagship train step
(benchmarks/run_all.py::bench_flagship topology, bf16 + rbg): lower
once, compile once per variant with its options, then alternate timed
reps over the cached executables. Unknown/rejected options are reported
as unsupported, not fatal. Timing windows end with a hard host fetch
(float(loss)) per CLAUDE.md — block_until_ready does not reliably wait
through the relay.

Usage: python benchmarks/compiler_options_ab.py [--iters 30] [--reps 2]
         [--out benchmarks/compiler_options_ab.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

VARIANTS = {
    # name -> PJRT compiler_options dict
    "baseline": {},
    # bigger scoped VMEM lets the fusion cost model build larger conv
    # fusions (the step is conv-fusion dominated at ~62 ms of 121.8)
    "vmem_32m": {"xla_tpu_scoped_vmem_limit_kib": "32768"},
    "vmem_24m": {"xla_tpu_scoped_vmem_limit_kib": "24576"},
    # overlap HBM copies (the ~10 ms pallas-boundary layout-copy rent)
    # with compute where the default scheduler serializes them
    "latency_hiding": {"xla_tpu_enable_latency_hiding_scheduler": "true"},
    "vmem32_lhs": {"xla_tpu_scoped_vmem_limit_kib": "32768",
                   "xla_tpu_enable_latency_hiding_scheduler": "true"},
}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--out", default="benchmarks/compiler_options_ab.json")
    ap.add_argument("--smoke", action="store_true",
                    help="tiny topology for a CPU plumbing check")
    args = ap.parse_args()

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

    if args.smoke:
        B, L = 4, 32
        m = VQVAE(hidden_dim=32, num_layers=1, num_heads=2, ffn_dim=64,
                  max_seq_len=L, codebook_size=16, code_dim=32,
                  latent_tokens=4, num_quantizers=2, dtype=jnp.bfloat16)
    else:
        B, L = 128, 350
        m = VQVAE(hidden_dim=512, num_layers=4, num_heads=8, ffn_dim=2048,
                  max_seq_len=L, codebook_size=1024, code_dim=512,
                  latent_tokens=64, num_quantizers=4, dtype=jnp.bfloat16)
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

    # host copies so every variant starts from identical fresh state
    # (donation consumes the device buffers each timed rep)
    host_state = jax.device_get((params, opt, vqs, eps))
    del params, opt
    si0 = jnp.asarray(0, jnp.int32)
    jstep = jax.jit(step_fn, donate_argnums=(0, 1, 2, 3))
    lowered = jstep.lower(
        host_state[0], host_state[1], host_state[2], host_state[3],
        si0, x, mask, jax.random.PRNGKey(2))

    compiled, status = {}, {}
    for name, opts in VARIANTS.items():
        t0 = time.time()
        try:
            compiled[name] = lowered.compile(
                compiler_options=opts or None)
            status[name] = {"status": "ok",
                            "compile_s": round(time.time() - t0, 1)}
        except Exception as e:  # noqa: BLE001 - report, don't die
            msg = str(e)
            status[name] = {
                "status": ("unsupported_option"
                           if "Unknown" in msg or "unknown" in msg
                           or "INVALID_ARGUMENT" in msg else "error"),
                "compile_s": round(time.time() - t0, 1),
                "error_tail": msg[-400:]}
        print(json.dumps({"variant": name, **status[name]}), flush=True)

    results = {name: [] for name in compiled}
    for rep in range(args.reps):
        for name, exe in compiled.items():
            st = jax.device_put(host_state)
            p, o, v, e = st
            si = si0
            loss = None
            for i in range(3):  # warmup (donation threads state)
                p, o, v, e, si, loss = exe(
                    p, o, v, e, si, x, mask, jax.random.PRNGKey(2 + i))
            float(loss)
            t0 = time.perf_counter()
            for i in range(args.iters):
                p, o, v, e, si, loss = exe(
                    p, o, v, e, si, x, mask, jax.random.PRNGKey(9 + i))
            lv = float(loss)  # hard fetch closes the timing window
            dt = (time.perf_counter() - t0) / args.iters
            results[name].append(dt * 1e3)
            print(json.dumps({"variant": name, "rep": rep,
                              "ms": round(dt * 1e3, 2),
                              "loss_finite": bool(lv == lv)}), flush=True)

    summary = {
        "what": ("flagship train-step compiler_options A/B (the XLA_FLAGS "
                 "route is client-rejected on the axon relay - see "
                 "benchmarks/xla_flags_ab.json)"),
        "iters": args.iters, "reps": args.reps,
        "variants": {
            name: {**status[name],
                   "ms_median": (round(float(np.median(results[name])), 2)
                                 if results.get(name) else None),
                   "ms_all": [round(v, 2)
                              for v in results.get(name, [])]}
            for name in VARIANTS},
    }
    with open(args.out, "w") as f:
        json.dump(summary, f, indent=1)
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
