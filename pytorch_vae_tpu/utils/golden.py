"""Golden checkpoints: params-only, orbax-independent .npz bundles.

The reference distributes trained Lightning .ckpt files alongside the
repo so its pipelines run without retraining; this rebuild's orbax
checkpoints live outside version control and have been lost to machine
recycling three times (CLAUDE.md round-3 notes). A golden bundle is the
recycle-proof equivalent: the inference-relevant slice of a TrainState
(params + vq_state) flattened into one compressed .npz small enough to
commit, loadable with numpy alone — no orbax, no directory layout, no
machine-specific ocdbt metadata.

Format (single .npz, compressed):
  __golden_meta__            JSON string: source ckpt, config path,
                             format version
  params/<slash/path>        one entry per params leaf
  vq_state/embedding ...     quantizer EMA state when the model uses VQ

`AEBundle.from_checkpoint` accepts a golden .npz path anywhere an orbax
checkpoint directory is accepted, so every pipeline script
(extract_ae_latents, run_aeot_end2end, decode_with_vqvae, serving) runs
from a fresh clone via `make reproduce-line`.
"""

from __future__ import annotations

import json
import os
from typing import Dict, Optional, Tuple

import numpy as np

_META_KEY = "__golden_meta__"
_FORMAT = 1


def _flatten(prefix: str, tree, out: Dict[str, np.ndarray]) -> None:
    if isinstance(tree, dict):
        for k in sorted(tree):
            _flatten(f"{prefix}/{k}", tree[k], out)
    else:
        out[prefix] = np.asarray(tree)


def _unflatten(flat: Dict[str, np.ndarray]) -> Dict:
    tree: Dict = {}
    for key, val in flat.items():
        node = tree
        parts = key.split("/")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = val
    return tree


def is_golden(path: str) -> bool:
    return os.path.isfile(path) and path.endswith(".npz")


def export_golden(state: Dict, out_path: str, *,
                  source_ckpt: str = "", config_path: str = "") -> Dict:
    """Write the inference slice of a restored TrainState dict.

    `state` is the raw orbax restore (or its ["state"] sub-dict): only
    "params" and a non-empty "vq_state" are kept; optimizer moments,
    epoch counters and ep_stats are dropped (that is the point).
    Returns the metadata dict written alongside the arrays.
    """
    flat: Dict[str, np.ndarray] = {}
    _flatten("params", state["params"], flat)
    vs = state.get("vq_state")
    if vs is not None:
        _flatten("vq_state", dict(vs), flat)
    meta = {
        "format": _FORMAT,
        "source_ckpt": source_ckpt,
        "config_path": config_path,
        "n_arrays": len(flat),
        "n_bytes": int(sum(v.nbytes for v in flat.values())),
    }
    os.makedirs(os.path.dirname(os.path.abspath(out_path)), exist_ok=True)
    np.savez_compressed(out_path, **flat,
                        **{_META_KEY: np.asarray(json.dumps(meta))})
    return meta


def load_golden(path: str) -> Tuple[Dict, Optional[Dict], Dict]:
    """-> (params pytree, vq_state dict or None, meta)."""
    with np.load(path, allow_pickle=False) as z:
        meta = json.loads(str(z[_META_KEY])) if _META_KEY in z.files else {}
        flat = {k: z[k] for k in z.files if k != _META_KEY}
    tree = _unflatten(flat)
    if "params" not in tree:
        raise ValueError(f"{path} is not a golden bundle (no params/ keys)")
    return tree["params"], tree.get("vq_state"), meta
