"""Empirical roofline for the flagship bf16 train step (one chip).

Answers "how far from speed-of-light is 120.7 ms?" with measurements
instead of spec-sheet numbers, which matter here because the chip sits
behind the axon relay:

1. Machine peaks measured on THIS chip:
   - HBM stream bandwidth: out = a*x + y over 256 MiB f32 operands
     (3 HBM streams per pass: read x, read y, write out).
   - MXU bf16 peak: a 8192^3 matmul with f32 accumulation.
   Every timing window ends with a hard host fetch - through the relay,
   block_until_ready measures enqueue rate (CLAUDE.md).

2. Step requirements from XLA's OWN accounting on the same backend:
   compiled.cost_analysis() of the exact step_fn that bench/profile runs
   (B=128, L=350 - the profile_flagship.py configuration) reports total
   flops and "bytes accessed" (per-fusion HBM traffic as the compiler
   scheduled it, i.e. the traffic the current fusion plan actually
   needs, not a theoretical lower bound).

3. Floors: t_mem = bytes/BW, t_flops = flops/peak; the step cannot run
   faster than max(t_mem, t_flops) on this fusion plan. Measured step
   time / floor = headroom multiple.

Writes benchmarks/roofline_r3.json and prints a summary table.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                   "roofline_r3.json")


def _fetch(x) -> float:
    """Hard host fetch - the only reliable timing fence on the relay."""
    import numpy as np
    return float(np.asarray(x).ravel()[0])


def _two_point(run, n1: int, n2: int) -> float:
    """Seconds per iteration via two on-device loop lengths.

    Through the axon relay a single dispatch+fetch costs O(100 ms) of
    constant overhead (first version of this file measured 1.3 GB/s
    stream / 2 TFLOP matmul with per-call host loops — pure dispatch).
    (t(n2) - t(n1)) / (n2 - n1) cancels every per-call constant; the
    loop itself runs on-chip via lax.fori_loop.
    """
    run(n1)  # compile both loop lengths before timing
    run(n2)
    t0 = time.perf_counter()
    run(n1)
    t1 = time.perf_counter()
    run(n2)
    t2 = time.perf_counter()
    return ((t2 - t1) - (t1 - t0)) / (n2 - n1)


def bench_stream(jax, jnp, mib: int = 256,
                 n1: int = 200, n2: int = 1200) -> dict:
    """Measured HBM bandwidth: z = a*z + y on-chip (3 streams/pass)."""
    from functools import partial

    n = mib * (1 << 20) // 4
    x = jnp.arange(n, dtype=jnp.float32)
    y = jnp.ones((n,), jnp.float32)

    @partial(jax.jit, static_argnums=2)
    def many(z, y, iters):
        return jax.lax.fori_loop(
            0, iters, lambda i, z: 1.0001 * z + y, z)

    def run(iters):
        _fetch(many(x, y, iters))

    sec = _two_point(run, n1, n2)
    gbps = 3 * n * 4 / sec / 1e9
    return {"mib_per_operand": mib, "iters": (n1, n2),
            "sec_per_pass": sec, "measured_gbps": gbps}


def bench_matmul(jax, jnp, dim: int = 8192,
                 n1: int = 50, n2: int = 250) -> dict:
    """Measured MXU bf16 peak: chained dim^3 matmuls on-chip."""
    from functools import partial

    k = jax.random.PRNGKey(0)
    a = jax.random.normal(k, (dim, dim), jnp.bfloat16)
    b = jax.random.normal(k, (dim, dim), jnp.bfloat16)

    @partial(jax.jit, static_argnums=2)
    def many(c, b, iters):
        def body(i, c):
            return jnp.dot(c, b, preferred_element_type=jnp.float32
                           ).astype(jnp.bfloat16)
        return jax.lax.fori_loop(0, iters, body, c)

    def run(iters):
        _fetch(many(a, b, iters))

    sec = _two_point(run, n1, n2)
    tflops = 2 * dim ** 3 / sec / 1e12
    return {"dim": dim, "iters": (n1, n2), "sec_per_matmul": sec,
            "measured_bf16_tflops": tflops}


def build_flagship_step():
    """The exact profile_flagship.py step (B=128, L=350 bf16 flagship)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from pytorch_vae_tpu.config import DEFAULT_WEIGHT_KEYS, STATIC_WEIGHT_KEYS
    from pytorch_vae_tpu.models.quantizer import (init_epoch_stats,
                                                  init_vq_state)
    from pytorch_vae_tpu.models.vq_vae import VQVAE
    from pytorch_vae_tpu.ops.losses import LossStatics, curve_loss

    if os.environ.get("PVT_ROOFLINE_TINY"):  # CPU smoke of the mechanics
        B, L = 4, 64
        m = VQVAE(hidden_dim=64, num_layers=2, num_heads=4, ffn_dim=128,
                  max_seq_len=L, codebook_size=64, code_dim=32,
                  latent_tokens=8, num_quantizers=2, dtype=jnp.bfloat16)
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

    jstep = jax.jit(step_fn, donate_argnums=(0, 1, 2, 3))
    n_params = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))
    args = (params, opt, vqs, eps, jnp.asarray(0, jnp.int32), x, mask,
            jax.random.PRNGKey(2))
    return jstep, args, n_params


def main() -> None:
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_default_prng_impl", "rbg")
    dev = jax.devices()[0]
    print(f"[roofline] device: {dev.platform} {dev.device_kind}", flush=True)

    tiny = bool(os.environ.get("PVT_ROOFLINE_TINY"))
    print("[roofline] stream bandwidth ...", flush=True)
    stream = bench_stream(jax, jnp, mib=8 if tiny else 256,
                          n1=2 if tiny else 200, n2=6 if tiny else 1200)
    print(f"  {stream['measured_gbps']:.0f} GB/s", flush=True)

    print("[roofline] bf16 matmul peak ...", flush=True)
    mm = bench_matmul(jax, jnp, dim=512 if tiny else 8192,
                      n1=2 if tiny else 50, n2=6 if tiny else 250)
    print(f"  {mm['measured_bf16_tflops']:.1f} TFLOP/s", flush=True)

    print("[roofline] compiling flagship step (minutes on the relay) ...",
          flush=True)
    jstep, args, n_params = build_flagship_step()
    lowered = jstep.lower(*args)
    compiled = lowered.compile()
    ca = compiled.cost_analysis()
    if isinstance(ca, list):  # older jax returns [dict]
        ca = ca[0]
    flops = float(ca.get("flops", 0.0))
    bytes_acc = float(ca.get("bytes accessed", 0.0))

    # time it: donated args -> rebuild per round via a fresh chain
    out = compiled(*args)
    loss = _fetch(out[-1])
    iters = 2 if tiny else 30
    state = out[:5]
    t0 = time.perf_counter()
    for _ in range(iters):
        state = compiled(*state[:4], state[4], *args[5:])[:6]
    loss = _fetch(state[5])
    dt = (time.perf_counter() - t0) / iters
    measured_ms = dt * 1e3

    def floors(bw, peak):
        t_mem = bytes_acc / bw * 1e3
        t_fl = flops / peak * 1e3
        return {"memory": t_mem, "compute": t_fl,
                "roofline": max(t_mem, t_fl),
                "bound": "memory" if t_mem >= t_fl else "compute"}

    # Two floor estimates: from this session's measured peaks, and from
    # the datasheet (TPU v5e: 819 GB/s HBM, 197 bf16 TFLOP/s). If the
    # relay degrades a microbench the measured floor overstates; report
    # both and never blend them.
    spec = {"TPU v5 lite": (819e9, 197e12)}.get(dev.device_kind)
    meas = floors(stream["measured_gbps"] * 1e9,
                  mm["measured_bf16_tflops"] * 1e12)
    res = {
        "device": f"{dev.platform}:{dev.device_kind}",
        "stream": stream,
        "matmul": mm,
        "flagship": {
            "n_params": n_params,
            "xla_flops_per_step": flops,
            "xla_bytes_accessed_per_step": bytes_acc,
            "measured_ms_per_step": measured_ms,
            "loss_sanity": loss,
        },
        "floors_ms_measured_peaks": meas,
        "headroom_vs_measured": measured_ms / meas["roofline"],
        # the step itself as a bandwidth benchmark: effective HBM
        # throughput implied by XLA's traffic accounting
        "effective_gbps": bytes_acc / (measured_ms / 1e3) / 1e9,
    }
    if spec:
        sp = floors(*spec)
        res["floors_ms_spec"] = sp
        res["spec"] = {"hbm_gbps": spec[0] / 1e9,
                       "bf16_tflops": spec[1] / 1e12}
        res["headroom_vs_spec"] = measured_ms / sp["roofline"]
    with open(OUT, "w") as f:
        json.dump(res, f, indent=2)
    print(json.dumps({k: v for k, v in res.items()
                      if k.startswith(("floors", "headroom", "spec"))},
                     indent=2))
    print(f"[roofline] measured {measured_ms:.1f} ms; wrote {OUT}",
          flush=True)


if __name__ == "__main__":
    main()
