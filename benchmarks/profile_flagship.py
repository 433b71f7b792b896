"""Trace the flagship bf16 train step with jax.profiler (perfetto).

Run:     python benchmarks/profile_flagship.py            (TPU; ~8 min)
Analyze: python benchmarks/profile_flagship.py --analyze \
             /tmp/prof_r2/plugins/profile/<ts>/perfetto_trace.json.gz

The analyzer aggregates XLA-op device time by HLO category and by op-name
prefix (pid=3/tid=3 is the XLA Ops track, tid=2 the XLA Modules track —
module events give the authoritative per-step device time; host-side
timing through the axon relay measures enqueue rate, see CLAUDE.md).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))




def analyze(path: str, steps: int = 5) -> None:
    """Aggregate device time from a perfetto_trace.json.gz."""
    import collections
    import gzip
    import json as _json
    import re

    d = _json.load(gzip.open(path))
    ev = [e for e in d["traceEvents"]
          if e.get("ph") == "X" and e["pid"] == 3 and e["tid"] == 3]
    mods = [e for e in d["traceEvents"]
            if e.get("ph") == "X" and e["pid"] == 3 and e["tid"] == 2
            and "step_fn" in e["name"]]
    if mods:
        print("module step:",
              round(sum(e["dur"] for e in mods) / len(mods) / 1e3, 2), "ms")
    for keyf, title in (
            (lambda e: e.get("args", {}).get("hlo_category", "?"),
             "by HLO category"),
            (lambda e: re.sub(r"[.\d]+$", "", e["name"]),
             "by op-name prefix")):
        tot = collections.Counter()
        cnt = collections.Counter()
        for e in ev:
            kk = keyf(e)
            tot[kk] += e["dur"]
            cnt[kk] += 1
        print(f"-- {title} --")
        for n, v in tot.most_common(14):
            print(f"{v / steps / 1e3:8.2f} ms/step {cnt[n] // steps:5d}x  "
                  f"{n[:60]}")


def profile_run(trace_dir: str = "/tmp/prof_r2") -> None:
    import time

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

    jstep = jax.jit(step_fn, donate_argnums=(0, 1, 2, 3))
    si = jnp.asarray(0, jnp.int32)
    for i in range(3):
        params, opt, vqs, eps, si, loss = jstep(
            params, opt, vqs, eps, si, x, mask, jax.random.PRNGKey(2 + i))
    print("warm loss", float(loss))
    t0 = time.perf_counter()
    for i in range(10):
        params, opt, vqs, eps, si, loss = jstep(
            params, opt, vqs, eps, si, x, mask, jax.random.PRNGKey(9 + i))
    print("enqueue-rate ms/step (NOT device time)",
          (time.perf_counter() - t0) / 10 * 1e3, float(loss))
    with jax.profiler.trace(trace_dir, create_perfetto_trace=True):
        for i in range(5):
            params, opt, vqs, eps, si, loss = jstep(
                params, opt, vqs, eps, si, x, mask,
                jax.random.PRNGKey(50 + i))
        print("traced loss", float(loss))
    print("trace ->", trace_dir)


if __name__ == "__main__":
    if len(sys.argv) > 2 and sys.argv[1] == "--analyze":
        analyze(sys.argv[2])
    else:
        profile_run()
