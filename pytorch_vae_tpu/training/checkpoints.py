"""Checkpointing: resume / warm-start / codebook-init (orbax).

The reference has three distinct restore modes that must all be reproduced
(SURVEY.md §5 "Checkpoint / resume"):

  1. resume      — full state: params + optimizer + vq buffers + step/epoch
                   (run.py:215-216; disables the other two, run.py:130-157)
  2. warm-start  — model weights only. The reference strips the "model."
                   prefix, DROPS quantizer.* keys so a stage-1 checkpoint can
                   never clobber a fresh codebook, and skips shape mismatches
                   (experiment.py:202-233,277-304). In this framework the
                   codebook lives outside `params` (in VQState), so the
                   drop-quantizer guarantee holds structurally; the shape
                   filter is still applied for partial-architecture loads.
  3. codebook-init — kmeans centroids .npy ([K,D] or [L,K_per,D]) seeding
                   embedding + EMA buffers (models/vq_vae.py:576-613).

Checkpoints are orbax directories; async-capable for preemption tolerance.
"""

from __future__ import annotations

import os
from typing import Any, Dict, List, Optional, Tuple

import jax
import numpy as np
import orbax.checkpoint as ocp

from ..models.quantizer import VQConfig, init_state_from_centroids


def _flatten(tree: Any) -> Dict[str, Any]:
    flat = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        key = "/".join(str(getattr(p, "key", getattr(p, "idx", p)))
                       for p in path)
        flat[key] = leaf
    return flat


_async_ckptr: Optional[ocp.AsyncCheckpointer] = None


def _get_async_checkpointer() -> ocp.AsyncCheckpointer:
    global _async_ckptr
    if _async_ckptr is None:
        _async_ckptr = ocp.AsyncCheckpointer(
            ocp.StandardCheckpointHandler())
    return _async_ckptr


def save_checkpoint(ckpt_dir: str, name: str, state, extra: Optional[Dict]
                    = None, use_async: bool = False) -> str:
    """Save a full train state (+ small metadata) under ckpt_dir/name.

    use_async=True returns immediately while orbax serializes in the
    background (preemption tolerance per SURVEY.md §5 — the reference has
    no failure recovery at the training layer; async checkpoints + resume
    from `last` give restart-from-last semantics). A subsequent save waits
    for the previous one.
    """
    path = os.path.abspath(os.path.join(ckpt_dir, name))
    payload = {"state": jax.device_get(state)}
    if extra:
        payload["extra"] = extra
    if use_async:
        ckptr = _get_async_checkpointer()
        ckptr.wait_until_finished()  # serialize with the previous save
        ckptr.save(path, args=ocp.args.StandardSave(payload), force=True)
    else:
        ckptr = ocp.StandardCheckpointer()
        ckptr.save(path, payload, force=True)
        ckptr.wait_until_finished()
    return path


def restore_checkpoint(path: str, template_state, extra_template:
                       Optional[Dict] = None):
    """Full resume restore. Returns (state, extra).

    Restored leaves are re-placed on the template's shardings so a resumed
    state is indistinguishable (placement included) from the live one —
    orbax otherwise restores single-device arrays that clash with a
    sharded mesh under jit.
    """
    ckptr = ocp.StandardCheckpointer()
    target = {"state": template_state}
    if extra_template is not None:
        target["extra"] = extra_template
    restored = ckptr.restore(os.path.abspath(path), target=target)

    from jax.sharding import NamedSharding

    def replace_leaf(restored_leaf, template_leaf):
        sh = getattr(template_leaf, "sharding", None)
        if isinstance(sh, NamedSharding):
            return jax.device_put(restored_leaf, sh)
        # leave uncommitted (numpy) so jit may place it with the rest
        return np.asarray(restored_leaf)

    state = jax.tree.map(replace_leaf, restored["state"], template_state)
    return state, restored.get("extra")


def warm_start_params(
    path: str,
    template_params: Any,
    drop_prefixes: Tuple[str, ...] = ("quantizer",),
    verbose: bool = True,
    preloaded_src: Any = None,
) -> Tuple[Any, List[str], List[str]]:
    """Load params-only from a checkpoint, shape-filtered.

    Returns (merged_params, kept_keys, skipped_keys). Keys present in the
    template but missing/mismatched in the checkpoint keep their fresh init,
    mirroring load_state_dict(strict=False) (experiment.py:295).
    `preloaded_src` lets a caller that already holds the source params
    tree (e.g. a golden bundle it also needs the vq_state from) skip the
    second load while sharing the merge semantics.
    """
    from ..utils import golden as goldenlib

    if preloaded_src is not None:
        src_params = preloaded_src
    elif goldenlib.is_golden(path):
        # committed params-only .npz bundle (utils/golden.py): the
        # recycle-proof source when the orbax line is lost to machine
        # recycling — same merge semantics as an orbax warm start.
        src_params, _, _ = goldenlib.load_golden(path)
    else:
        ckptr = ocp.StandardCheckpointer()
        # restore with the template so dtypes/shapes line up where they
        # match; orbax requires congruent trees, so restore raw then
        # merge by path.
        raw = ckptr.restore(os.path.abspath(path))
        src_params = raw.get("state", raw)
        if isinstance(src_params, dict) and "params" in src_params:
            src_params = src_params["params"]

    src_flat = _flatten(src_params)
    kept: List[str] = []
    skipped: List[str] = []

    def merge(path_tuple, leaf):
        key = "/".join(str(getattr(p, "key", getattr(p, "idx", p)))
                       for p in path_tuple)
        if any(part in drop_prefixes for part in key.split("/")):
            skipped.append(key)
            return leaf
        cand = src_flat.get(key)
        if cand is None:
            skipped.append(key)
            return leaf
        cand = np.asarray(cand)
        if tuple(cand.shape) != tuple(np.shape(leaf)):
            skipped.append(key)
            return leaf
        kept.append(key)
        return cand.astype(np.asarray(leaf).dtype)

    merged = jax.tree_util.tree_map_with_path(merge, template_params)
    if verbose:
        print(f"[WarmStart] loaded kept={len(kept)} skipped={len(skipped)}")
    return merged, kept, skipped


def load_codebook_centroids(path: str, cfg: VQConfig):
    """kmeans centroid .npy -> fresh VQState (run.py:74-89)."""
    C = np.load(path).astype(np.float32)
    return init_state_from_centroids(C, cfg)


def latest_checkpoint(ckpt_dir: str) -> Optional[str]:
    """Most recent checkpoint directory under ckpt_dir ('last' wins)."""
    if not os.path.isdir(ckpt_dir):
        return None
    last = os.path.join(ckpt_dir, "last")
    if os.path.isdir(last):
        return last
    subdirs = [
        os.path.join(ckpt_dir, d)
        for d in os.listdir(ckpt_dir)
        if os.path.isdir(os.path.join(ckpt_dir, d))
    ]
    if not subdirs:
        return None
    return max(subdirs, key=os.path.getmtime)
