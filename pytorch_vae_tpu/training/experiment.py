"""Experiment orchestration: YAML -> model + data + jitted train/eval loop.

TPU-native rebuild of the reference `VQVAEExperiment` LightningModule
(experiment.py:49-502) and the `run.py` trainer wiring:

  - epoch-indexed piecewise-linear schedules for ~20 loss weights + LR
    (experiment.py:14-34, 309-343) are computed host-side per epoch and
    passed as *dynamic scalars* into one compiled step (no recompiles),
  - the jitted step is pure: (TrainState, batch, weights, rng) ->
    (TrainState, metrics); gradients/metrics are global means, so under a
    sharded mesh XLA emits the cross-chip reductions that replace DDP
    all-reduce + sync_dist,
  - three restore modes: resume / warm-start / codebook-init
    (training/checkpoints.py),
  - the quantizer epoch stats reset/report hooks (experiment.py:155-164)
    act on the ep_stats leaf of the train state.
"""

from __future__ import annotations

import dataclasses
import os
import time
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from .. import config as cfglib
from ..data.curves import CurveDataset, CurveLoader, default_buckets
from ..models.quantizer import init_epoch_stats, init_vq_state
from ..models.vq_vae import VQVAE
from ..ops import geometry
from ..ops.losses import (LossStatics, curve_loss, pairwise_repulsion_loss,
                          segment_repulsion_loss)
from ..ops.masking import masked_mean, pair_mask
from ..parallel.mesh import make_mesh
from ..parallel.sharding import batch_sharding, shard_params
from .checkpoints import (
    load_codebook_centroids,
    restore_checkpoint,
    save_checkpoint,
    warm_start_params,
)
from .metrics import MetricWriter
from .optim import build_optimizer
from .state import TrainState

_MODEL_FIELDS = {f.name for f in dataclasses.fields(VQVAE)}

_DTYPES = {"float32": jnp.float32, "bfloat16": jnp.bfloat16,
           "bf16": jnp.bfloat16, "fp32": jnp.float32}


def filter_model_params(model_params: Dict) -> Dict:
    """Drop non-constructor keys (the reference swallows them via **kwargs,
    models/vq_vae.py:408); map dtype strings to jnp dtypes."""
    out = {k: v for k, v in model_params.items() if k in _MODEL_FIELDS}
    if isinstance(out.get("dtype"), str):
        out["dtype"] = _DTYPES[out["dtype"].lower()]
    return out


def apply_rng_impl(exp_params: Dict) -> None:
    """Select the PRNG implementation BEFORE any key is created.

    Dropout-mask generation with the default threefry costs ~50% of the
    flagship train step on TPU v5e (measured: 340 -> 171 ms/step with
    dropout off). 'rbg' keeps identical API semantics at a fraction of the
    cost and is the default here; set exp_params.rng_impl: threefry2x32
    for bit-exact legacy streams.
    """
    impl = str(exp_params.get("rng_impl", "rbg"))
    try:
        jax.config.update("jax_default_prng_impl", impl)
    except Exception as e:  # unknown impl name: fail loudly
        raise ValueError(f"bad exp_params.rng_impl={impl!r}: {e}")


class VQVAEExperiment:
    def __init__(
        self,
        model_params: Dict,
        exp_params: Dict,
        data_params: Dict,
        trainer_params: Optional[Dict] = None,
        logging_params: Optional[Dict] = None,
        mesh=None,
        verbose: bool = True,
    ):
        self.model_params = dict(model_params)
        self.exp_params = dict(exp_params)
        self.data_params = dict(data_params)
        self.trainer_params = dict(trainer_params or {})
        self.logging_params = dict(logging_params or {})
        self.verbose = verbose

        self.LR = float(exp_params.get("LR", 1e-3))
        self.weight_decay = float(exp_params.get("weight_decay", 0.0))
        self.manual_seed = int(exp_params.get("manual_seed", 42))

        apply_rng_impl(exp_params)
        # trainer_params.detect_anomaly -> jax debug_nans (the TPU
        # equivalent of torch autograd anomaly mode; SURVEY.md §5)
        if (trainer_params or {}).get("detect_anomaly", False):
            jax.config.update("jax_debug_nans", True)
        self.model = VQVAE(**filter_model_params(model_params))
        self.use_vq = bool(self.model.use_vq)

        self._warm_start_ckpt = cfglib.normalize_path(
            exp_params.get("warm_start_ckpt"))
        self._init_codebook_path = cfglib.normalize_path(
            exp_params.get("init_codebook_path")
        ) or cfglib.normalize_path(model_params.get("codebook_init_path"))

        self.schedules = exp_params.get("schedules", {}) or {}
        self.base_weights = cfglib.initial_weights(model_params, exp_params)
        self.statics = self._build_statics()

        self.mesh = mesh if mesh is not None else make_mesh(model=1)
        self.train_dataset: Optional[CurveDataset] = None
        self.val_dataset: Optional[CurveDataset] = None
        self.state: Optional[TrainState] = None
        self.tx = None
        self.lr_fn = None
        self._train_step = None
        self._eval_step = None
        self._data_stats: Tuple[Optional[np.ndarray], Optional[np.ndarray]] \
            = (None, None)
        self._base_rng = jax.random.PRNGKey(self.manual_seed)

        if verbose and self.use_vq:
            q = self.model.num_quantizers
            K = self.model.codebook_size
            tag = "RVQ" if q > 1 else "VQ"
            print(f"[{tag}] EMA (L2): L={q}, K_per={K}, K_total={q * K}, "
                  f"D={self.model.code_dim}")
        if verbose:
            print(f"[Model] VQVAE: H={self.model.hidden_dim}, "
                  f"Dcode={self.model.code_dim}, use_vq={self.use_vq}, "
                  f"residual_vq={self.model.is_residual}, "
                  f"q_levels={self.model.num_quantizers}, "
                  f"tokensN={self.model.latent_tokens}")

    # ------------------------------------------------------------------
    def _build_statics(self) -> LossStatics:
        bw, sch = self.base_weights, self.schedules
        ever = lambda k: cfglib.term_ever_active(bw, sch, k)  # noqa: E731
        return LossStatics(
            use_vq=self.use_vq,
            seq_len=int(self.model.max_seq_len),
            bond_hinge_margin=float(
                self.exp_params.get("bond_hinge_margin", 2.5)),
            bond_band=ever("bond_band_max_weight"),
            bond_band_lo=float(
                self.exp_params.get("bond_band_lo", 2.5)),
            bond_band_hi=float(
                self.exp_params.get("bond_band_hi", 5.2)),
            ss_tv=ever("ss_tv_lambda"),
            usage_entropy=ever("usage_entropy_lambda"),
            xyz_tv=ever("xyz_tv_lambda"),
            pdm=ever("pdm_weight"),
            win_kabsch=ever("win_kabsch_weight"),
            kappa=ever("kappa_weight"),
            tau=ever("tau_weight"),
            lr_pdm=ever("lr_pdm_weight"),
            repulsion=ever("repulsion_weight"),
            mix_geom=ever("mix_geom_weight"),
            mix_bond_max_margin=float(
                self.exp_params.get("mix_bond_max_margin", 7.0)),
            mix_nearest=bool(self.exp_params.get("mix_nearest", False)),
            mix_max_weight=float(
                self.exp_params.get("mix_max_weight", 0.0)),
            mix_seg_weight=float(
                self.exp_params.get("mix_seg_weight", 0.0)),
            mix_seg_min_dist=float(
                self.exp_params.get("mix_seg_min_dist", 1.8)),
            mix_seg_exclude=int(
                self.exp_params.get("mix_seg_exclude", 1)),
            mix_seg_samples=int(
                self.exp_params.get("mix_seg_samples", 3)),
            mix_rep_max_weight=float(
                self.exp_params.get("mix_rep_max_weight", 0.0)),
            mix_seg_max_weight=float(
                self.exp_params.get("mix_seg_max_weight", 0.0)),
            repulsion_min_dist=float(
                self.exp_params.get("repulsion_min_dist", 2.0)),
            repulsion_exclude=int(
                self.exp_params.get("repulsion_exclude", 2)),
            pdm_window=int(bw["pdm_window"]),
            win_kabsch_size=int(bw["win_kabsch_size"]),
            win_kabsch_stride=int(bw["win_kabsch_stride"]),
            lr_min_sep=int(bw["lr_min_sep"]),
            lr_stride=int(bw["lr_stride"]),
            lr_max_offsets=int(bw["lr_max_offsets"]),
        )

    def set_data_stats(self, mean_xyz, std_xyz) -> None:
        """Reference API: de-normalization stats for geometry losses
        (models/vq_vae.py:568-574)."""
        self._data_stats = (
            np.asarray(mean_xyz, np.float32).reshape(1, 1, 3),
            np.asarray(std_xyz, np.float32).reshape(1, 1, 3),
        )

    # ------------------------------------------------------------------
    def setup(self) -> None:
        dp = self.data_params
        npy_dir = dp["npy_dir"]
        train_list = cfglib.resolve_path(npy_dir, dp["train_list"])
        val_list = cfglib.resolve_path(npy_dir, dp["val_list"])
        msl = int(self.model.max_seq_len)
        cache = bool(dp.get("cache_dataset", True))
        self.train_dataset = CurveDataset(
            npy_dir, list_path=train_list, train=True, max_seq_len=msl,
            cache=cache, verbose=self.verbose)
        self.val_dataset = CurveDataset(
            npy_dir, list_path=val_list, train=False, max_seq_len=msl,
            cache=cache, verbose=self.verbose)

        buckets = dp.get("buckets")
        if buckets is None:
            buckets = default_buckets(msl, int(dp.get("bucket_step", 32)))
        pad_to = msl if dp.get("pad_to_max", False) else None
        n_data = self.mesh.devices.shape[0]
        proc_idx, proc_cnt = jax.process_index(), jax.process_count()
        self.train_loader = CurveLoader(
            self.train_dataset,
            batch_size=int(dp.get("train_batch_size", 256)),
            shuffle=True, drop_last=True, seed=self.manual_seed,
            buckets=buckets, pad_to=pad_to,
            process_index=proc_idx, process_count=proc_cnt,
        )
        # val keeps partial batches (experiment.py:143-153 drop_last=False);
        # a partial final batch costs one extra compile, never correctness
        self.val_loader = CurveLoader(
            self.val_dataset,
            batch_size=int(dp.get("val_batch_size", 256)),
            shuffle=False, drop_last=False, seed=self.manual_seed,
            buckets=buckets, pad_to=pad_to,
            process_index=proc_idx, process_count=proc_cnt,
        )
        bs = self.train_loader.batch_size
        assert bs % n_data == 0, (
            f"batch size {bs} must divide the data-parallel axis {n_data}")

    # ------------------------------------------------------------------
    def init_state(self, steps_per_epoch: Optional[int] = None,
                   max_epochs: Optional[int] = None) -> TrainState:
        msl = int(self.model.max_seq_len)
        dummy_x = jnp.zeros((1, msl, int(self.model.input_dim)), jnp.float32)
        dummy_mask = jnp.ones((1, msl), bool)
        vqs = (init_vq_state(jax.random.PRNGKey(self.manual_seed + 1),
                             self.model.vq_config) if self.use_vq else None)
        eps = init_epoch_stats(self.model.vq_config) if self.use_vq else None
        k = jax.random.PRNGKey(self.manual_seed)
        variables = self.model.init(
            {"params": k, "dropout": k, "aug": k, "reinit": k},
            dummy_x, dummy_mask, vqs, eps, step=0, train=False)
        params = shard_params(variables["params"], self.mesh)

        spe = steps_per_epoch if steps_per_epoch is not None else max(
            1, len(self.train_loader) if self.train_dataset else 1)
        me = max_epochs if max_epochs is not None else int(
            self.trainer_params.get("max_epochs", 100))
        clip = float(self.trainer_params.get("gradient_clip_val", 1.0))
        self.tx, self.lr_fn = build_optimizer(self.exp_params, spe, me, clip)
        opt_state = self.tx.init(params)

        self.state = TrainState(
            params=params, opt_state=opt_state, vq_state=vqs, ep_stats=eps,
            step=jnp.asarray(0, jnp.int32), epoch=jnp.asarray(0, jnp.int32))
        return self.state

    def apply_restore_modes(self, resume_ckpt: Optional[str] = None,
                            warm_start_ckpt: Optional[str] = None,
                            init_codebook: Optional[str] = None) -> None:
        """Resume wins and disables the other two (run.py:130-157)."""
        assert self.state is not None, "call init_state() first"
        if resume_ckpt:
            self.state, _ = restore_checkpoint(resume_ckpt, self.state)
            print(f"[Resume] restored full state from {resume_ckpt} "
                  f"(step={int(self.state.step)}, "
                  f"epoch={int(self.state.epoch)})")
            return
        ws = warm_start_ckpt or self._warm_start_ckpt
        from ..utils.golden import is_golden, load_golden
        if ws and is_golden(ws):
            # golden params-only bundle (utils/golden.py): warm-start
            # params AND — unlike a cross-stage orbax warm start — the
            # EMA codebook, because a golden bundle of the SAME model is
            # a checkpoint substitute, not a partial-architecture load.
            from ..models.quantizer import VQState

            g_params, g_vq, _ = load_golden(ws)
            merged, kept, skipped = warm_start_params(
                ws, self.state.params, preloaded_src=g_params)
            params = shard_params(merged, self.mesh)
            repl = {"params": params, "opt_state": self.tx.init(params)}
            if self.use_vq and g_vq is not None:
                # shape-validate against the fresh codebook so a
                # cross-geometry warm start (2x256 -> 4x1024 capacity
                # escalations are a real repo pattern) keeps the fresh
                # codebook instead of crashing at first trace — the same
                # strict=False semantics the params merge applies.
                g_emb = jnp.asarray(g_vq["embedding"])
                fresh = self.state.vq_state.embedding
                if tuple(g_emb.shape) == tuple(fresh.shape):
                    repl["vq_state"] = VQState(
                        embedding=g_emb,
                        ema_cluster_size=jnp.asarray(
                            g_vq["ema_cluster_size"]),
                        ema_embedding=jnp.asarray(g_vq["ema_embedding"]))
                else:
                    print(f"[Warm-start] golden vq_state shape "
                          f"{tuple(g_emb.shape)} != fresh "
                          f"{tuple(fresh.shape)}; keeping fresh codebook")
            self.state = self.state.replace(**repl)
            print(f"[Warm-start] golden bundle {ws}: kept={len(kept)} "
                  f"skipped={len(skipped)}"
                  + (" + vq_state" if "vq_state" in repl else ""))
        elif ws and os.path.isfile(ws):
            # a FILE is a foreign torch/Lightning checkpoint (orbax saves
            # directories): route through the state_dict key mapper with
            # the reference's prefix-strip/quantizer-drop/shape-filter
            # semantics (training/torch_interop.py)
            from .torch_interop import warm_start_from_torch

            merged, kept, skipped = warm_start_from_torch(
                ws, self.state.params)
            params = shard_params(merged, self.mesh)
            self.state = self.state.replace(
                params=params, opt_state=self.tx.init(params))
        elif ws and os.path.exists(ws):
            merged, kept, skipped = warm_start_params(ws, self.state.params)
            params = shard_params(merged, self.mesh)
            # fresh optimizer state for the new params (warm start != resume)
            self.state = self.state.replace(
                params=params, opt_state=self.tx.init(params))
        elif ws:
            print(f"[Warm-start] skipped (no valid ckpt at {ws})")
        cb = init_codebook or self._init_codebook_path
        if self.use_vq and cb and os.path.exists(cb):
            vqs = load_codebook_centroids(cb, self.model.vq_config)
            self.state = self.state.replace(vq_state=vqs)
            print(f"[Codebook Init] Loaded centroids from {cb}")
        elif cb:
            print(f"[Codebook init] skipped (invalid path: {cb})")

    # ------------------------------------------------------------------
    def _dynamic_weights(self, epoch: int) -> Dict[str, jnp.ndarray]:
        w = cfglib.weights_for_epoch(self.base_weights, self.schedules, epoch)
        return {
            k: jnp.asarray(float(v), jnp.float32)
            for k, v in w.items()
            if k not in cfglib.STATIC_WEIGHT_KEYS
        }

    def _loss_and_aux(self, params, x, mask, vq_state, ep_stats, step,
                      weights, rngs, train):
        out, new_vq, new_ep, dbg = self.model.apply(
            {"params": params}, x, mask, vq_state, ep_stats,
            step=step, train=train, rngs=rngs if train else None)
        recons, target, vq_pack, m = out
        emb = new_vq.embedding if new_vq is not None else None
        mean, std = self._data_stats
        ld = curve_loss(
            recons, target, vq_pack, m, weights, self.statics,
            embedding=emb,
            data_mean=None if mean is None else jnp.asarray(mean),
            data_std=None if std is None else jnp.asarray(std),
        )
        if train and self.statics.mix_geom:
            # Mixup-geometry aux loss: AE-OT generation decodes CONVEX
            # COMBINATIONS of bank latents (pipelines/aeot.py, reference
            # run_aeot_end2end.py:256-265) — a region recon-side geometry
            # losses never see (measured: r3_ft3 A/B in BASELINE.md).
            # Decode in-batch latent mixes and hinge the two hard-reject
            # classes (min-bond, pairwise collision) directly on them.
            # Mix source is z_q_raw (vq_pack[0]): in AE mode it IS z_e
            # (models/vq_vae.py:299-300), so gradients reach decoder AND
            # encoder; in VQ mode it is the hard-quantized vectors —
            # the space stage-2 generation actually decodes — and only
            # the decoder gets gradients (the intended regularization).
            z_e = vq_pack[0]
            km = jax.random.fold_in(rngs["aug"], 7)
            kp, ka = jax.random.split(km)
            bsz = z_e.shape[0]
            if self.statics.mix_nearest:
                # nearest in-batch latent (excluding self): mirrors the
                # OT sampler, which only combines neighboring cells
                zf = z_e.reshape(bsz, -1).astype(jnp.float32)
                sq = jnp.sum(zf * zf, axis=-1)
                d2 = sq[:, None] + sq[None, :] - 2.0 * (zf @ zf.T)
                d2 = d2 + jnp.eye(bsz, dtype=jnp.float32) * 1e30
                perm = jnp.argmin(d2, axis=-1)
            else:
                perm = jax.random.permutation(kp, bsz)
            alpha = jax.random.uniform(ka, (bsz, 1, 1), jnp.float32)
            z_mix = (alpha * z_e.astype(jnp.float32)
                     + (1.0 - alpha) * z_e[perm].astype(jnp.float32))
            dec = self.model.apply({"params": params}, z_mix, m,
                                   train=False, method="decode")
            xyz = dec[..., :3].astype(jnp.float32)
            if std is not None:
                xyz = xyz * jnp.asarray(std) + (
                    jnp.asarray(mean) if mean is not None else 0.0)
            bl = geometry.bond_lengths(xyz)
            # two-sided: the filter hard-rejects bonds outside
            # [bond_min_allowed, bond_max_allowed] (pipelines/filtering.py)
            hinge = (jnp.maximum(
                self.statics.bond_hinge_margin - bl, 0.0) ** 2
                + jnp.maximum(
                    bl - self.statics.mix_bond_max_margin, 0.0) ** 2)
            bond_m = pair_mask(m, 2)
            mix_bond = masked_mean(hinge, bond_m)
            if self.statics.mix_max_weight > 0.0:
                # per-curve WORST violation: the filter rejects on the
                # single worst bond, which a mean over ~L bonds dilutes
                hv = hinge if bond_m is None else jnp.where(
                    bond_m, hinge, 0.0)
                worst = jnp.max(hv, axis=-1)                 # [B]
                mix_bond = mix_bond + (
                    self.statics.mix_max_weight * jnp.mean(worst))
            mix_rep = pairwise_repulsion_loss(
                xyz, m, self.statics.repulsion_min_dist,
                self.statics.repulsion_exclude,
                worst_weight=self.statics.mix_rep_max_weight)
            ld = dict(ld)
            ld["Mix_BondHinge"] = jax.lax.stop_gradient(mix_bond)
            ld["Mix_Repulsion"] = jax.lax.stop_gradient(mix_rep)
            mix_total = mix_bond + mix_rep
            if self.statics.mix_seg_weight > 0.0:
                # segment-clearance hinge: the point hinge cannot see
                # segments crossing between points (r3_ft6_bankx: 76 of
                # 157 rejects were segment_collision)
                mix_seg = segment_repulsion_loss(
                    xyz, m, self.statics.mix_seg_min_dist,
                    self.statics.mix_seg_exclude,
                    self.statics.mix_seg_samples,
                    worst_weight=self.statics.mix_seg_max_weight)
                ld["Mix_SegRepulsion"] = jax.lax.stop_gradient(mix_seg)
                mix_total = mix_total + (
                    self.statics.mix_seg_weight * mix_seg)
            ld["loss"] = ld["loss"] + jnp.asarray(
                weights["mix_geom_weight"], jnp.float32) * mix_total
        return ld["loss"], (ld, new_vq, new_ep)

    def make_train_step(self):
        def step_fn(state: TrainState, x, mask, weights, rng):
            rng = jax.random.fold_in(rng, state.step)
            kd, ka, kr = jax.random.split(rng, 3)
            rngs = {"dropout": kd, "aug": ka, "reinit": kr}

            def loss_fn(params):
                return self._loss_and_aux(
                    params, x, mask, state.vq_state, state.ep_stats,
                    state.step, weights, rngs, train=True)

            grads, (ld, new_vq, new_ep) = jax.grad(
                loss_fn, has_aux=True)(state.params)
            updates, new_opt = self.tx.update(grads, state.opt_state,
                                              state.params)
            new_params = optax.apply_updates(state.params, updates)
            new_state = state.next(new_params, new_opt, new_vq, new_ep)
            ld = dict(ld)
            ld["grad_norm"] = optax.global_norm(grads)
            return new_state, ld

        return jax.jit(step_fn, donate_argnums=(0,))

    def make_eval_step(self):
        def step_fn(state: TrainState, x, mask, weights):
            _, (ld, _, new_ep) = self._loss_and_aux(
                state.params, x, mask, state.vq_state, state.ep_stats,
                state.step, weights, None, train=False)
            return new_ep, ld

        return jax.jit(step_fn)

    def _put(self, x, mask):
        x = jnp.asarray(x)
        mask = jnp.asarray(mask)
        n_data = self.mesh.devices.shape[0]
        if x.shape[0] % n_data == 0:
            sh = batch_sharding(self.mesh)
        else:
            # partial val tail batches can't split across the data axis
            from ..parallel.sharding import replicated

            sh = replicated(self.mesh)
        return jax.device_put(x, sh), jax.device_put(mask, sh)

    # ------------------------------------------------------------------
    def fit(
        self,
        max_epochs: Optional[int] = None,
        resume_ckpt: Optional[str] = None,
        warm_start_ckpt: Optional[str] = None,
        init_codebook: Optional[str] = None,
        log_dir: Optional[str] = None,
        ckpt_dir: Optional[str] = None,
        limit_train_batches: Optional[int] = None,
        limit_val_batches: Optional[float] = None,
    ) -> TrainState:
        tp = self.trainer_params
        max_epochs = int(max_epochs if max_epochs is not None
                         else tp.get("max_epochs", 40))
        if self.train_dataset is None:
            self.setup()
        spe = len(self.train_loader)
        if self.state is None:
            self.init_state(steps_per_epoch=spe, max_epochs=max_epochs)
            self.apply_restore_modes(resume_ckpt, warm_start_ckpt,
                                     init_codebook)
        if self._train_step is None:
            self._train_step = self.make_train_step()
            self._eval_step = self.make_eval_step()

        is_main = jax.process_index() == 0
        writer = MetricWriter(
            log_dir or os.path.join(
                self.logging_params.get("save_dir", "./logs"),
                self.logging_params.get("name", "exp")),
            enabled=is_main)
        ckpt_dir = ckpt_dir or self.exp_params.get(
            "checkpoint_dir", "./checkpoints/default")
        save_every = int(self.exp_params.get("save_every_epochs", 10))
        print_every = int(self.exp_params.get("print_every", 0))
        if limit_val_batches is None:
            limit_val_batches = float(tp.get("limit_val_batches", 1.0))

        start_epoch = int(self.state.epoch)
        t0 = time.time()
        for epoch in range(start_epoch, max_epochs):
            weights = self._dynamic_weights(epoch)
            if is_main:
                brief = {k: round(float(weights[k]), 6)
                         for k in ("beta", "ss_weight", "rmsd_weight")
                         if k in weights}
                print(f"[Schedule] Epoch {epoch}: {brief}")
            # reset quantizer epoch stats (experiment.py:322-323)
            if self.use_vq:
                self.state = self.state.replace(
                    ep_stats=init_epoch_stats(self.model.vq_config))

            self.train_loader.set_epoch(epoch)
            ep_sums: Dict[str, float] = {}
            nb = 0
            for bi, (x, mask) in enumerate(self.train_loader):
                if limit_train_batches and bi >= limit_train_batches:
                    break
                xb, mb = self._put(x, mask)
                self.state, ld = self._train_step(
                    self.state, xb, mb, weights, self._base_rng)
                nb += 1
                if print_every and bi % print_every == 0:
                    ld_h = {k: float(v) for k, v in ld.items()}
                    lr = float(self.lr_fn(int(self.state.step)))
                    if is_main:
                        print(
                            f"step={bi:05d} | "
                            f"loss={ld_h['loss']:.3f} | "
                            f"xyz={ld_h['Reconstruction_Loss_XYZ']:.3f} | "
                            f"vq={ld_h['VQ_Loss']:.3f} | "
                            f"ppl={ld_h['VQ_Perplexity']:.3f} | "
                            f"ss_acc={ld_h['SS_Accuracy']:.3f} | "
                            f"lr={lr:.6f}", flush=True)
                agg_keys = ("loss", "Reconstruction_Loss_XYZ",
                            "Reconstruction_Loss_SS", "VQ_Loss", "RMSD_Raw",
                            "RMSD_Aligned") + tuple(
                    k for k in ld if k.startswith("Mix_"))
                for k in agg_keys:
                    ep_sums[k] = ep_sums.get(k, 0.0) + float(ld[k])
            if nb and is_main:
                lr = float(self.lr_fn(int(self.state.step)))
                writer.write(int(self.state.step),
                             {k: v / nb for k, v in ep_sums.items()} |
                             {"lr": lr}, prefix="train")
                print(
                    f"[Epoch {epoch}] "
                    f"loss={ep_sums['loss'] / nb:.4f} "
                    f"xyz={ep_sums['Reconstruction_Loss_XYZ'] / nb:.4f} "
                    f"ss_loss={ep_sums['Reconstruction_Loss_SS'] / nb:.4f} "
                    f"rmsd_aln={ep_sums['RMSD_Aligned'] / nb:.4f}A "
                    f"rmsd_raw={ep_sums['RMSD_Raw'] / nb:.4f}A "
                    f"vq={ep_sums['VQ_Loss'] / nb:.4f} lr={lr:.6f}")

            # ---- validation ----
            val_metrics = self.validate(weights, limit_val_batches)
            if val_metrics and is_main:
                writer.write(int(self.state.step), val_metrics, prefix="val")

            self.state = self.state.replace(
                epoch=jnp.asarray(epoch + 1, jnp.int32))
            use_async = bool(self.exp_params.get("async_checkpoint", False))
            if is_main and ((epoch + 1) % save_every == 0
                            or epoch + 1 == max_epochs):
                save_checkpoint(ckpt_dir, f"epoch{epoch:03d}", self.state,
                                use_async=use_async)
            if is_main:
                save_checkpoint(ckpt_dir, "last", self.state,
                                use_async=use_async)

        if is_main:
            mins = (time.time() - t0) / 60.0
            print(f"[Fit] {max_epochs - start_epoch} epochs in "
                  f"{mins:.2f} minutes.")
        writer.close()
        return self.state

    def validate(self, weights=None, limit: float = 1.0) -> Dict[str, float]:
        if self.val_dataset is None or len(self.val_loader) == 0:
            return {}
        if weights is None:
            weights = self._dynamic_weights(int(self.state.epoch))
        if self._eval_step is None:
            self._eval_step = self.make_eval_step()
        # reset epoch stats for the val pass (experiment.py:155-158)
        if self.use_vq:
            ep_backup = self.state.ep_stats
            self.state = self.state.replace(
                ep_stats=init_epoch_stats(self.model.vq_config))
        sums: Dict[str, float] = {}
        nb = 0
        max_batches = len(self.val_loader)
        if limit < 1.0:
            max_batches = max(1, int(max_batches * limit))
        elif limit > 1.0:
            max_batches = int(limit)
        for bi, (x, mask) in enumerate(self.val_loader):
            if bi >= max_batches:
                break
            xb, mb = self._put(x, mask)
            new_ep, ld = self._eval_step(self.state, xb, mb, weights)
            self.state = self.state.replace(ep_stats=new_ep)
            for k, v in ld.items():
                sums[k] = sums.get(k, 0.0) + float(v)
            nb += 1
        out = {k: v / max(nb, 1) for k, v in sums.items()}
        if self.use_vq and jax.process_index() == 0:
            from ..models.quantizer import epoch_stats_summary

            st = epoch_stats_summary(self.state.ep_stats,
                                     self.model.vq_config)
            print(f"[Val Stats] PPL: {st['perplexity']:.2f}, "
                  f"Dead Ratio: {st['dead_ratio']:.3f}")
            out["epoch_perplexity"] = st["perplexity"]
            out["epoch_dead_ratio"] = st["dead_ratio"]
        if self.use_vq:
            self.state = self.state.replace(ep_stats=ep_backup)
        return out


def build_experiment_from_yaml(yaml_path: str,
                               verbose: bool = True
                               ) -> Tuple[VQVAEExperiment, Dict[str, Any]]:
    """YAML -> experiment (reference: experiment.py:505-525, with env
    expansion)."""
    cfg = cfglib.load_yaml(yaml_path)
    exp = VQVAEExperiment(
        cfg["model_params"], cfg["exp_params"], cfg["data_params"],
        cfg.get("trainer_params"), cfg.get("logging_params"),
        verbose=verbose)
    return exp, cfg
