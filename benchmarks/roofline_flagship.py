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


def bench_stream(jax, jnp, mib: int = 256, iters: int = 20) -> dict:
    """Measured HBM bandwidth: out = a*x + y (triad-like, 3 streams)."""
    n = mib * (1 << 20) // 4
    x = jnp.arange(n, dtype=jnp.float32)
    y = jnp.ones((n,), jnp.float32)

    @jax.jit
    def triad(x, y):
        return 1.0001 * x + y

    z = triad(x, y)
    _fetch(z)
    t0 = time.perf_counter()
    for _ in range(iters):
        z = triad(z, y)
    _fetch(z)
    dt = (time.perf_counter() - t0) / iters
    gbps = 3 * n * 4 / dt / 1e9
    return {"mib_per_operand": mib, "iters": iters, "sec_per_pass": dt,
            "measured_gbps": gbps}


def bench_matmul(jax, jnp, dim: int = 8192, iters: int = 10) -> dict:
    """Measured MXU bf16 peak: dim^3 matmul, f32 accumulation."""
    k = jax.random.PRNGKey(0)
    a = jax.random.normal(k, (dim, dim), jnp.bfloat16)
    b = jax.random.normal(k, (dim, dim), jnp.bfloat16)

    @jax.jit
    def mm(a, b):
        return jnp.dot(a, b, preferred_element_type=jnp.float32
                       ).astype(jnp.bfloat16)

    c = mm(a, b)
    _fetch(c)
    t0 = time.perf_counter()
    for _ in range(iters):
        c = mm(c, b)
    _fetch(c)
    dt = (time.perf_counter() - t0) / iters
    tflops = 2 * dim ** 3 / dt / 1e12
    return {"dim": dim, "iters": iters, "sec_per_matmul": dt,
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
                          iters=3 if tiny else 20)
    print(f"  {stream['measured_gbps']:.0f} GB/s", flush=True)

    print("[roofline] bf16 matmul peak ...", flush=True)
    mm = bench_matmul(jax, jnp, dim=512 if tiny else 8192,
                      iters=3 if tiny else 10)
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

    bw = stream["measured_gbps"] * 1e9
    peak = mm["measured_bf16_tflops"] * 1e12
    t_mem_ms = bytes_acc / bw * 1e3
    t_flop_ms = flops / peak * 1e3
    floor_ms = max(t_mem_ms, t_flop_ms)
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
        "floors_ms": {
            "memory": t_mem_ms,
            "compute": t_flop_ms,
            "roofline": floor_ms,
            "bound": "memory" if t_mem_ms >= t_flop_ms else "compute",
        },
        "headroom_multiple": measured_ms / floor_ms if floor_ms else None,
    }
    with open(OUT, "w") as f:
        json.dump(res, f, indent=2)
    print(json.dumps(res["floors_ms"], indent=2))
    print(f"[roofline] measured {measured_ms:.1f} ms vs floor "
          f"{floor_ms:.1f} ms -> {measured_ms / floor_ms:.2f}x; "
          f"wrote {OUT}", flush=True)


if __name__ == "__main__":
    main()
