"""Curve VQ-VAE: dual-branch transformer encoder, Perceiver tokenizer,
EMA (residual) vector quantizer, learned-query transformer decoder.

TPU-native re-design of the reference `VQVAE` (models/vq_vae.py:365-1423).
The module itself is pure: all step-dependent state the reference keeps on
the nn.Module (training_steps, EMA buffers, epoch usage stats — SURVEY.md
§2.3) is threaded explicitly:

    out, new_vq_state, new_ep_stats, dbg = model.apply(
        {"params": params}, x, mask, vq_state, ep_stats, step=step,
        train=True, rngs={"dropout": kd, "aug": ka, "reinit": kr})

`step` is the number of *completed* training steps; the reference increments
its counter mid-forward (models/vq_vae.py:805-806), so schedules that read
the counter after the increment (EMA freeze, soft-VQ tau/alpha, dead-code
reinit cadence) are evaluated here at step+1 while the EMA-decay
interpolation (read before the increment) is evaluated at step — matching
the reference's off-by-one exactly.

Behavioral quirks intentionally preserved (SURVEY.md §2.3):
  - the quantizer is called with mask=None (latent tokens are fixed-N),
  - the encoder output passes through two stacked LayerNorms
    (enc_ln then ln_geo, models/vq_vae.py:645-646),
  - the rigid-rotation augmentation uses ONE coin flip per batch
    (models/vq_vae.py:775) but per-sample rotations.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops import geometry
from . import quantizer as vq
from .layers import (
    CheapDropout,
    DecoderStack,
    EncoderStack,
    LatentTokenizer,
    sinusoidal_pos_enc,
)


def _interp_linear(start: float, end: float, step, warm_steps: int):
    """Linear warm interpolation of a scalar (models/vq_vae.py:621-625)."""
    if warm_steps <= 0:
        return jnp.asarray(end, jnp.float32)
    t = jnp.clip(step / float(warm_steps), 0.0, 1.0)
    return (1.0 - t) * start + t * end


class VQVAE(nn.Module):
    """Flagship curve model. Constructor kwargs mirror the reference
    (models/vq_vae.py:366-408) so YAML `model_params` apply unchanged."""

    input_dim: int = 6
    hidden_dim: int = 512
    num_layers: int = 4
    num_heads: int = 8
    max_seq_len: int = 350
    codebook_size: int = 512      # codes per level
    code_dim: int = 128
    beta: float = 0.25            # used by the loss, kept for API parity
    use_vq: bool = True
    residual_vq: bool = False     # kept for API; derived from num_quantizers
    num_quantizers: int = 1
    ffn_dim: int = 2048           # torch TransformerEncoderLayer default
    dropout: float = 0.1
    label_smoothing: float = 0.0
    ss_tv_lambda: float = 0.0
    usage_entropy_lambda: float = 0.0
    xyz_align_alpha: float = 0.7
    dist_lambda: float = 0.0
    rigid_aug_prob: float = 0.0
    pairwise_sample_k: int = 32
    codebook_init_path: Optional[str] = None
    ema_decay: float = 0.98
    ema_decay_start: float = 0.98
    ema_decay_end: float = 0.98
    ema_decay_warm_steps: int = 0
    soft_vq_use: bool = False
    soft_vq_tau_start: float = 2.0
    soft_vq_tau_end: float = 0.5
    soft_vq_tau_warm_steps: int = 0
    soft_vq_alpha_warm_steps: int = 0
    noise_warmup_steps: int = 0
    max_noise_std: float = 0.0
    latent_tokens: int = 32
    tokenizer_heads: int = 8
    tokenizer_layers: int = 2
    tokenizer_dropout: float = 0.1
    latent_sigmoid: bool = False
    latent_sigmoid_ae_only: bool = True
    reinit_dead_codes: bool = True
    reinit_prob: float = 1.0
    dead_usage_threshold: int = 0
    ema_update_freeze_steps: int = 0
    reinit_interval: int = 500    # models/vq_vae.py:875
    reinit_min_steps: int = 800   # models/vq_vae.py:876
    dtype: Any = jnp.float32
    remat: bool = False           # rematerialize transformer blocks
    # decoder-side bond legalization (round-5 extension, no reference
    # counterpart): clamp each decoded bond length into
    # [legalize_lo, legalize_hi] and re-integrate (ops/geometry.
    # legalize_bond_lengths). Makes every decode path — recon, mix_geom,
    # AE-OT generation, code sampling — legal-by-construction on bonds;
    # directions (angles/dihedrals) are untouched and in-band bonds pass
    # through unchanged. Default band matches the worst-bond band hinge.
    legalize_bonds: bool = False
    legalize_lo: float = 2.5
    legalize_hi: float = 5.2
    # decoder-side collision relaxation (round-5 extension, no reference
    # counterpart): n gradient steps on ops/geometry.collision_energy
    # (filter-matched point/segment/angle hinges) with bond
    # re-legalization after every step. Identity on clash-free decodes;
    # applied with an identity STE (forward relaxed, backward identity).
    # Implies bond legalization (the relaxation re-legalizes per step
    # using legalize_lo/hi).
    relax_collisions: bool = False
    relax_steps: int = 40
    relax_step_size: float = 0.2
    name_tag: str = "VQVAE"

    @property
    def vq_config(self) -> vq.VQConfig:
        return vq.VQConfig(
            num_quantizers=int(self.num_quantizers),
            codes_per_level=int(self.codebook_size),
            code_dim=int(self.code_dim),
            reinit_dead_codes=bool(self.reinit_dead_codes),
            reinit_prob=float(self.reinit_prob),
            dead_usage_threshold=int(self.dead_usage_threshold),
        )

    @property
    def is_residual(self) -> bool:
        return self.use_vq and self.num_quantizers > 1

    def setup(self):
        H = self.hidden_dim
        dt = self.dtype
        part = nn.with_logical_partitioning
        init = nn.initializers
        self.input_proj = nn.Dense(
            H, dtype=dt, name="input_proj",
            kernel_init=part(init.xavier_uniform(), (None, "embed")))
        self.ss_input_proj = nn.Dense(
            H, dtype=dt, name="ss_input_proj",
            kernel_init=part(init.xavier_uniform(), (None, "embed")))
        self.encoder = EncoderStack(
            H, self.num_heads, self.num_layers, self.ffn_dim,
            self.dropout, dtype=dt, remat=self.remat, name="encoder")
        self.ss_encoder = EncoderStack(
            H, self.num_heads, 2, self.ffn_dim, self.dropout, dtype=dt,
            remat=self.remat, name="ss_encoder")
        self.enc_ln = nn.LayerNorm(dtype=self.dtype, name="enc_ln")
        self.ln_geo = nn.LayerNorm(dtype=self.dtype, name="ln_geo")
        self.ln_ss = nn.LayerNorm(dtype=self.dtype, name="ln_ss")
        # fuse MLP: Linear(2H->H), GELU, Linear(H->H), LayerNorm
        # (models/vq_vae.py:496-502)
        self.fuse_fc1 = nn.Dense(
            H, dtype=dt, name="fuse_fc1",
            kernel_init=part(init.xavier_uniform(), ("embed", "mlp")))
        self.fuse_fc2 = nn.Dense(
            H, dtype=dt, name="fuse_fc2",
            kernel_init=part(init.xavier_uniform(), ("mlp", "embed")))
        self.fuse_ln = nn.LayerNorm(dtype=self.dtype, name="fuse_ln")
        self.tokenizer = LatentTokenizer(
            H, int(self.latent_tokens), int(self.tokenizer_heads),
            int(self.tokenizer_layers), float(self.tokenizer_dropout),
            dtype=dt, name="tokenizer")
        self.to_code = nn.Dense(
            self.code_dim, dtype=dt, name="to_code",
            kernel_init=part(init.xavier_uniform(), ("embed", None)))
        self.from_code = nn.Dense(
            self.hidden_dim, dtype=dt, name="from_code",
            kernel_init=part(init.xavier_uniform(), (None, "embed")))
        self.mem_ln = nn.LayerNorm(dtype=self.dtype, name="mem_ln")
        self.decoder = DecoderStack(
            H, self.num_heads, self.num_layers, self.ffn_dim,
            self.dropout, dtype=dt, remat=self.remat, name="decoder")
        self.query_embed = self.param(
            "query_embed",
            nn.with_logical_partitioning(
                nn.initializers.normal(stddev=0.02), (None, "embed")),
            (self.max_seq_len, H), jnp.float32)
        self.head_xyz = nn.Dense(3, dtype=dt, name="head_xyz")
        self.head_ss = nn.Dense(3, dtype=dt, name="head_ss")
        self.inp_dropout = CheapDropout(rate=0.1)
        self.pos_enc = sinusoidal_pos_enc(self.max_seq_len, H)

    # ------------------------------------------------------------------
    def encode(self, x, mask=None, train: bool = False):
        """Dual-branch encode -> fused per-position features [B, L, H].

        (reference: VQVAE.encode, models/vq_vae.py:639-660)
        """
        L = x.shape[1]
        det = not train
        pe = self.pos_enc[:, :L, :].astype(self.dtype)

        xyz = x[..., :3].astype(self.dtype)
        h_geo = self.input_proj(xyz)
        h_geo = self.inp_dropout(h_geo, deterministic=det) + pe
        h_enc_geo = self.encoder(h_geo, mask=mask, deterministic=det)
        h_enc_geo = self.enc_ln(h_enc_geo)
        g = self.ln_geo(h_enc_geo)

        ss = x[..., 3:].astype(self.dtype)
        h_ss = self.ss_input_proj(ss) + pe
        h_enc_ss = self.ss_encoder(h_ss, mask=mask, deterministic=det)
        s = self.ln_ss(h_enc_ss)

        fused = jnp.concatenate([g, s], axis=-1)
        fused = self.fuse_fc2(nn.gelu(self.fuse_fc1(fused)))
        fused = self.fuse_ln(fused)
        return fused, h_enc_geo, h_enc_ss

    def tokenize_to_codes(self, h_tokens, mask=None, train: bool = False):
        """L positions -> N latent code tokens [B, N, code_dim].

        Optional sigmoid squash on z_e in AE-only mode
        (models/vq_vae.py:736-743).
        """
        h_mem = self.tokenizer(h_tokens, mask=mask, deterministic=not train)
        z_e = self.to_code(h_mem)
        if self.latent_sigmoid and (
            (not self.latent_sigmoid_ae_only) or (not self.use_vq)
        ):
            z_e = nn.sigmoid(z_e)
        return z_e

    def decode(self, z_for_decode, mask=None, train: bool = False):
        """Latent tokens -> [B, L, 6] (xyz + 3 SS logits).

        Learned per-position queries + sinusoidal PE attend over the latent
        tokens (models/vq_vae.py:745-765). tgt self-attention is
        bidirectional; memory is unmasked.
        """
        B = z_for_decode.shape[0]
        L = mask.shape[1] if mask is not None else self.max_seq_len
        memory = self.mem_ln(self.from_code(z_for_decode.astype(self.dtype)))
        q = jnp.broadcast_to(
            self.query_embed[None, :L].astype(self.dtype),
            (B, L, self.hidden_dim),
        )
        q = q + self.pos_enc[:, :L, :].astype(self.dtype)
        h = self.decoder(q, memory, tgt_mask=mask, memory_mask=None,
                         deterministic=not train)
        xyz = self.head_xyz(h).astype(jnp.float32)
        if self.legalize_bonds:
            xyz = geometry.legalize_bond_lengths(
                xyz, mask, self.legalize_lo, self.legalize_hi)
        if self.relax_collisions:
            relaxed = geometry.relax_collisions(
                xyz, mask, n_steps=int(self.relax_steps),
                step_size=float(self.relax_step_size),
                bond_lo=self.legalize_lo, bond_hi=self.legalize_hi)
            xyz = xyz + jax.lax.stop_gradient(relaxed - xyz)
        ss_logits = self.head_ss(h)
        return jnp.concatenate(
            [xyz, ss_logits.astype(jnp.float32)], axis=-1
        )

    # ------------------------------------------------------------------
    def __call__(
        self,
        x: jnp.ndarray,
        mask: Optional[jnp.ndarray],
        vq_state: Optional[vq.VQState] = None,
        epoch_stats: Optional[vq.VQEpochStats] = None,
        step: jnp.ndarray | int = 0,
        train: bool = False,
    ):
        """Full forward. Returns ((recons, target, vq_pack, mask),
        new_vq_state, new_epoch_stats, debug_scalars).

        vq_pack = (z_q_raw, z_e_tokens, indices, perplexity, dead_ratio) as
        in the reference (models/vq_vae.py:900-901).
        """
        step = jnp.asarray(step, jnp.float32)
        target = x.astype(jnp.float32)
        x_in = x

        if train and self.rigid_aug_prob > 0.0:
            key = self.make_rng("aug")
            k_coin, k_rot, k_t = jax.random.split(key, 3)
            B = x_in.shape[0]
            coin = jax.random.uniform(k_coin, ()) < self.rigid_aug_prob
            R = geometry.random_rotation(k_rot, B)
            t = jax.random.normal(k_t, (B, 1, 3)) * 0.02
            xyz = x_in[..., :3]
            xyz_aug = jnp.einsum("bij,blj->bli", R, xyz) + t
            aug = jnp.concatenate([xyz_aug, x_in[..., 3:]], axis=-1)
            x_in = jnp.where(coin, aug, x_in)

        if train and self.max_noise_std > 0.0:
            factor = (
                jnp.clip(step / float(self.noise_warmup_steps), 0.0, 1.0)
                if self.noise_warmup_steps > 0 else 1.0
            )
            noise_std = self.max_noise_std * factor
            noise = (
                jax.random.normal(self.make_rng("aug"), x_in[..., :3].shape)
                * noise_std
            )
            x_in = jnp.concatenate(
                [x_in[..., :3] + noise, x_in[..., 3:]], axis=-1)

        # EMA decay is interpolated at the PRE-increment step
        # (models/vq_vae.py:794-802 runs before `training_steps += 1`)
        decay = _interp_linear(self.ema_decay_start, self.ema_decay_end,
                               step, self.ema_decay_warm_steps)
        # everything after the increment sees step+1
        step_after = step + (1.0 if train else 0.0)

        h_fuse, _h_geo, _h_ss = self.encode(x_in, mask=mask, train=train)
        z_e = self.tokenize_to_codes(h_fuse, mask=mask, train=train)

        dbg = {"decay": decay, "tau": jnp.asarray(0.0, jnp.float32)}
        new_state = vq_state
        new_ep = epoch_stats

        if not self.use_vq or vq_state is None:
            z_for_decode = z_e
            z_q_raw = z_e
            indices = jnp.zeros(z_e.shape[:2], jnp.int32)
            ppl = jnp.asarray(0.0, jnp.float32)
            dead = jnp.asarray(0.0, jnp.float32)
        else:
            cfg = self.vq_config
            do_ema = jnp.asarray(train) & (
                step_after >= float(self.ema_update_freeze_steps)
            )

            if self.soft_vq_use and train and not self.is_residual:
                (z_for_decode, z_q_raw, indices, stats, new_state, new_ep,
                 tau) = self._soft_vq(
                    z_e, vq_state, epoch_stats, cfg, step_after, decay,
                    do_ema)
                ppl, dead = stats[0], stats[1]
                dbg["tau"] = tau
            else:
                # NOTE: mask=None on purpose (models/vq_vae.py:869)
                (z_q_st, z_q_raw, indices, stats), new_state, new_ep = (
                    vq.quantize_ema(
                        vq_state, z_e, cfg, train=train,
                        do_ema_update=do_ema, decay=decay,
                        epoch_stats=epoch_stats, mask=None,
                    )
                )
                ppl, dead = stats[0], stats[1]
                z_for_decode = z_q_st

            if train:
                # periodic dead-code reinit (models/vq_vae.py:874-891)
                min_steps = max(self.ema_update_freeze_steps,
                                self.reinit_min_steps)
                do_reinit = (
                    do_ema
                    & (jnp.mod(step_after, float(self.reinit_interval)) == 0)
                    & (step_after >= float(min_steps))
                )
                flat = z_e.reshape(-1, z_e.shape[-1])
                if new_ep is not None:
                    # epoch-accumulated usage histogram: matches the
                    # reference's reinit window, which reads usage_counts
                    # accumulated since reset_epoch_stats
                    # (models/vq_vae.py:91-107,109-164)
                    usage_signal = new_ep.usage
                else:
                    # no epoch stats carried (e.g. bare forward): fall
                    # back to this batch's histogram — a narrower window
                    # that can only over-trigger reinit, never miss a
                    # truly dead code
                    if indices.ndim == 1:
                        idx_for_usage = indices
                    else:
                        idx_for_usage = indices.reshape(-1)
                    usage_signal = jnp.zeros(
                        (cfg.total_codes,), jnp.float32
                    ).at[idx_for_usage].add(1.0)
                new_state = vq.maybe_reinit_dead_codes(
                    new_state, flat, usage_signal, cfg,
                    self.make_rng("reinit"), do_reinit)

        recons = self.decode(z_for_decode, mask=mask, train=train)
        vq_pack = (z_q_raw, z_e, indices, ppl, dead)
        return (recons, target, vq_pack, mask), new_state, new_ep, dbg

    def _soft_vq(self, z_e, vq_state, epoch_stats, cfg, step_after, decay,
                 do_ema):
        """Soft-VQ annealed mix (models/vq_vae.py:828-861), single-level only.

        Uses the expanded-norm distance form instead of materializing the
        [N, K, D] difference tensor (SURVEY.md §7.3 hard part 7). The decode
        input's gradient path is z_e only (the reference detaches the mix
        delta), so the soft probabilities never need a backward pass.
        """
        B, M, D = z_e.shape
        flat = z_e.reshape(-1, D).astype(jnp.float32)
        emb = jax.lax.stop_gradient(vq_state.embedding)
        tau = _interp_linear(self.soft_vq_tau_start, self.soft_vq_tau_end,
                             step_after, self.soft_vq_tau_warm_steps)
        flat_sg = jax.lax.stop_gradient(flat)
        d2 = (
            jnp.sum(flat_sg**2, axis=1, keepdims=True)
            - 2.0 * flat_sg @ emb.T
            + jnp.sum(emb**2, axis=1)[None, :]
        )
        logits = -d2 / jnp.clip(tau, 1e-8, None)
        probs = jax.nn.softmax(logits, axis=-1)
        z_soft = (probs @ emb).reshape(B, M, D)

        idx = jnp.argmin(d2, axis=1).astype(jnp.int32)
        z_hard = jnp.take(emb, idx, axis=0).reshape(B, M, D)

        # alpha ramps 0 -> 1 over alpha_warm_steps (models/vq_vae.py:615-619)
        if self.soft_vq_alpha_warm_steps > 0:
            alpha = jnp.clip(
                step_after / float(self.soft_vq_alpha_warm_steps), 0.0, 1.0)
        else:
            alpha = jnp.asarray(1.0, jnp.float32)
        z_mix = (1.0 - alpha) * z_soft + alpha * z_hard
        z_for_decode = z_e + jax.lax.stop_gradient(
            z_mix.astype(z_e.dtype) - z_e)

        upd = vq._ema_step(vq_state, flat, idx, None, decay, cfg.eps,
                           cfg.total_codes)
        new_state = vq._where_state(do_ema, upd, vq_state)

        usage_inst = jnp.zeros((cfg.total_codes,), jnp.float32).at[idx].add(
            1.0)
        ppl, dead = vq._perplexity_dead(usage_inst)
        stats = jnp.stack([ppl, dead])

        new_ep = epoch_stats
        if epoch_stats is not None:
            d1 = jnp.take_along_axis(d2, idx[:, None], axis=1)[:, 0]
            d1 = jnp.maximum(d1, 0.0)
            hist_idx = jnp.clip(
                (d1 / (cfg.diag_qe_cap / cfg.diag_qe_bins)).astype(jnp.int32),
                0, cfg.diag_qe_bins - 1)
            new_ep = vq.VQEpochStats(
                usage=epoch_stats.usage + usage_inst,
                count=epoch_stats.count + float(flat.shape[0]),
                top1_sum=epoch_stats.top1_sum + jnp.sum(d1),
                top2_sum=epoch_stats.top2_sum + jnp.sum(d1),
                qe_sum=epoch_stats.qe_sum + jnp.sum(d1),
                qe_hist=epoch_stats.qe_hist.at[hist_idx].add(1.0),
            )
        return (z_for_decode, z_hard, idx.reshape(B, M), stats, new_state,
                new_ep, tau)

    # ------------------------------------------------------------------
    def sample(
        self,
        vq_state: vq.VQState,
        num_samples: int,
        key: jax.Array,
        out_len: Optional[int] = None,
    ) -> jnp.ndarray:
        """Unconditional decode from random codebook indices.

        RVQ sums one random code per level (models/vq_vae.py:1394-1422).
        Call via model.apply(vars, ..., method="sample").
        """
        if not self.use_vq:
            raise RuntimeError("Quantizer is not initialized for sampling.")
        N = int(self.latent_tokens)
        L_out = int(out_len) if out_len is not None else self.max_seq_len
        K_per = int(self.codebook_size)
        if self.is_residual:
            z_q = jnp.zeros((num_samples, N, self.code_dim), jnp.float32)
            for lvl in range(self.num_quantizers):
                key, sub = jax.random.split(key)
                idx = jax.random.randint(sub, (num_samples, N), 0, K_per)
                emb_l = vq_state.embedding[lvl * K_per : (lvl + 1) * K_per]
                z_q = z_q + jnp.take(emb_l, idx, axis=0)
        else:
            idx = jax.random.randint(key, (num_samples, N), 0, K_per)
            z_q = jnp.take(vq_state.embedding, idx, axis=0)
        mask = jnp.ones((num_samples, L_out), bool)
        return self.decode(z_q, mask=mask, train=False)

    def generate(self, x, mask=None, vq_state=None):
        """Reconstruction pass (models/vq_vae.py:1390-1392)."""
        out, _, _, _ = self(x, mask, vq_state, None, step=0, train=False)
        return out[0]
