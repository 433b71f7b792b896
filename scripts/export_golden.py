#!/usr/bin/env python
"""Export a committed-size golden bundle from an orbax checkpoint.

The reference ships trained Lightning .ckpt files with the repo; this is
the rebuild's equivalent after three machine-recycle losses of the
checkpoint line (CLAUDE.md): params + vq_state only, one compressed
.npz, loadable by every pipeline via AEBundle.from_checkpoint.

  python scripts/export_golden.py \
    --ckpt checkpoints/synth_ae_ft8/last \
    --config configs/synth_ae_ft8.yaml \
    --out golden/stage1_ft8.npz

Round-trip is verified on export: the bundle is reloaded and every leaf
compared bit-exactly against the restored checkpoint.
"""

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pytorch_vae_tpu.utils import golden  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", required=True,
                    help="orbax checkpoint dir (e.g. .../last)")
    ap.add_argument("--config", default="",
                    help="config yaml recorded in the bundle metadata")
    ap.add_argument("--out", required=True, help="output .npz path")
    args = ap.parse_args()

    import jax
    import orbax.checkpoint as ocp

    raw = ocp.StandardCheckpointer().restore(os.path.abspath(args.ckpt))
    state = raw.get("state", raw)
    meta = golden.export_golden(state, args.out, source_ckpt=args.ckpt,
                                config_path=args.config)

    # bit-exact round-trip check before anyone commits the bundle
    params, vq, _ = golden.load_golden(args.out)
    ref = {"params": state["params"]}
    got = {"params": params}
    if vq is not None:
        ref["vq_state"] = dict(state["vq_state"])
        got["vq_state"] = vq
    mismatch = [
        p for (p, a), b in zip(
            jax.tree_util.tree_leaves_with_path(ref),
            jax.tree_util.tree_leaves(got))
        if not np.array_equal(np.asarray(a), np.asarray(b))
    ]
    if mismatch:
        raise SystemExit(f"round-trip mismatch: {mismatch[:5]}")
    size_mb = os.path.getsize(args.out) / 1e6
    print(json.dumps({**meta, "out": args.out,
                      "file_mb": round(size_mb, 2),
                      "roundtrip": "bit-exact"}))


if __name__ == "__main__":
    main()
