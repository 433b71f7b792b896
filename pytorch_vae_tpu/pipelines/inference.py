"""Inference bundle: load a trained curve model from (yaml, checkpoint).

Replaces the reference's `_safe_load_ae` pattern (build experiment from
YAML, load Lightning ckpt with the "model." prefix stripped, strict=False —
scripts/run_aeot_end2end.py:95-116). Our orbax checkpoints store the full
TrainState; inference pulls params + vq_state and ignores optimizer state.
Decode/encode are jitted per padded-length bucket.
"""

from __future__ import annotations

import functools
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import orbax.checkpoint as ocp

from .. import config as cfglib
from ..models.quantizer import VQState, quantize_ema
from ..models.vq_vae import VQVAE
from ..training.experiment import filter_model_params


def _np_tree(tree):
    return jax.tree.map(np.asarray, tree)


class AEBundle:
    """A trained curve VQ-VAE ready for batched encode/decode."""

    def __init__(self, model: VQVAE, params, vq_state: Optional[VQState],
                 config: Dict):
        self.model = model
        self.params = params
        self.vq_state = vq_state
        self.config = config
        self.latent_tokens = int(model.latent_tokens)
        self.code_dim = int(model.code_dim)
        self.flat_dim = self.latent_tokens * self.code_dim

    # -- loading ------------------------------------------------------
    @classmethod
    def from_checkpoint(cls, config_path: str, ckpt_path: str) -> "AEBundle":
        cfg = cfglib.load_yaml(config_path)
        model = VQVAE(**filter_model_params(cfg["model_params"]))
        import os

        from ..utils import golden

        if golden.is_golden(ckpt_path):
            # committed params-only bundle (utils/golden.py): the
            # recycle-proof path `make reproduce-line` runs from
            g_params, g_vq, _ = golden.load_golden(ckpt_path)
            state = {"params": g_params, "vq_state": g_vq}
        else:
            raw = ocp.StandardCheckpointer().restore(
                os.path.abspath(ckpt_path))
            state = raw.get("state", raw)
        params = state["params"]
        vq_state = None
        if model.use_vq:
            vs = state.get("vq_state")
            if vs is None:
                raise RuntimeError(
                    f"checkpoint {ckpt_path} has no vq_state but the model "
                    f"config has use_vq=true")
            vq_state = VQState(
                embedding=jnp.asarray(vs["embedding"]),
                ema_cluster_size=jnp.asarray(vs["ema_cluster_size"]),
                ema_embedding=jnp.asarray(vs["ema_embedding"]),
            )
        return cls(model, params, vq_state, cfg)

    # -- jitted compute -----------------------------------------------
    @functools.cached_property
    def _decode_fn(self):
        @jax.jit
        def fn(params, z_tokens, mask):
            return self.model.apply(
                {"params": params}, z_tokens, mask, train=False,
                method="decode")

        return fn

    @functools.cached_property
    def _encode_fn(self):
        @jax.jit
        def fn(params, x, mask):
            h_fuse, _, _ = self.model.apply(
                {"params": params}, x, mask, train=False, method="encode")
            z_e = self.model.apply(
                {"params": params}, h_fuse, mask, train=False,
                method="tokenize_to_codes")
            return z_e

        return fn

    def encode_tokens(self, x: np.ndarray, mask: np.ndarray) -> np.ndarray:
        """[B, L, 6] + [B, L] -> z_e tokens [B, N, D]."""
        return np.asarray(self._encode_fn(self.params, jnp.asarray(x),
                                          jnp.asarray(mask)))

    def decode(self, z_tokens: np.ndarray, mask: np.ndarray) -> np.ndarray:
        """[B, N, D] + [B, Lmax] -> [B, Lmax, 6] (xyz + SS logits)."""
        return np.asarray(self._decode_fn(self.params, jnp.asarray(z_tokens),
                                          jnp.asarray(mask)))

    def quantize(self, z_e: np.ndarray
                 ) -> Tuple[np.ndarray, np.ndarray]:
        """z_e [B, N, D] -> (z_q [B, N, D], indices).

        Indices layout follows the reference: [B, N] single-level,
        level-major flat [Q*B*N] for RVQ (models/vq_vae.py:260).
        """
        assert self.vq_state is not None, "model has no quantizer"
        (z_q_st, z_q, idx, _stats), _, _ = quantize_ema(
            self.vq_state, jnp.asarray(z_e), self.model.vq_config,
            train=False, do_ema_update=jnp.asarray(False),
            decay=jnp.asarray(0.98))
        return np.asarray(z_q), np.asarray(idx)

    def decode_curve6(self, z_tokens: np.ndarray, lengths: np.ndarray,
                      pad_to: Optional[int] = None) -> list:
        """Decode and convert SS logits -> one-hot; returns a list of
        per-curve [L_i, 6] arrays trimmed to their lengths
        (run_aeot_end2end.py:843-857)."""
        lengths = np.asarray(lengths, np.int64)
        Lmax = int(pad_to or max(1, lengths.max()))
        mask = np.arange(Lmax)[None, :] < lengths[:, None]
        out = self.decode(z_tokens, mask)
        coords = out[..., :3]
        ss_idx = np.argmax(out[..., 3:], axis=-1)
        one_hot = np.eye(3, dtype=np.float32)[ss_idx]
        arr6 = np.concatenate([coords, one_hot], axis=-1).astype(np.float32)
        return [arr6[i, : lengths[i]] for i in range(arr6.shape[0])]


def mask_from_lengths(lengths: np.ndarray,
                      max_len: Optional[int] = None) -> np.ndarray:
    lengths = np.asarray(lengths, np.int64)
    Lmax = int(max_len or lengths.max())
    return np.arange(Lmax)[None, :] < lengths[:, None]
