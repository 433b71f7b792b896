#!/usr/bin/env python
"""Hardware A/B for the flash-attention exp2 softmax mode (PVT_FLASH_EXP2).

exp(x) lowers on the TPU VPU as exp2(x * log2e); the exp2 mode folds the
log2e factor into the host-side q scale so the kernel's softmax passes call
exp2 directly (ops/flash_attention.py:160-178). The CPU interpreter proves
numerics only — this script must pass on the real chip before the mode can
become a default (Mosaic lowering + VPU timing are hardware facts).

Protocol (single process, one backend init):
  1. run the full hardware validator (benchmarks/validate_flash_tpu.py
     main()) with exp2 ON — fwd/grad parity vs einsum, dropout exactness;
  2. alternate bench_flagship('bfloat16') exp2 ON / OFF twice each,
     jax.clear_caches() between halves so the module-global flag is
     re-traced into fresh kernels.

Writes benchmarks/exp2_ab.json and prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys

os.environ["PVT_FLASH_EXP2"] = "1"  # before the package import

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

import pytorch_vae_tpu.ops.flash_attention as fa  # noqa: E402


def set_exp2(on: bool) -> None:
    fa._USE_EXP2 = on
    jax.clear_caches()  # module-global is baked in at trace time


def main() -> None:
    assert jax.default_backend() == "tpu", jax.default_backend()
    assert fa._USE_EXP2 is True

    import validate_flash_tpu  # noqa: E402  (sibling module)

    print("[exp2_ab] validating exp2 mode on hardware ...", flush=True)
    validate_flash_tpu.main()

    from run_all import bench_flagship  # noqa: E402

    results = {"exp2": [], "control": []}
    for rep in range(2):
        for name, on in (("exp2", True), ("control", False)):
            set_exp2(on)
            r = bench_flagship("bfloat16", 30)
            results[name].append(r["ms_per_step"])
            print(f"[exp2_ab] rep{rep} {name}: {r['ms_per_step']:.2f} ms",
                  flush=True)

    out = {
        "exp2_ms": min(results["exp2"]),
        "control_ms": min(results["control"]),
        "all": results,
        "delta_ms": min(results["exp2"]) - min(results["control"]),
    }
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "exp2_ab.json"), "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
