"""Generic train loop for the classic image zoo.

Same YAML 4-section loop as the curve experiment, but model-agnostic: the
model comes from the registry by `model_params.name` (reference
models/__init__.py:8 `vae_models` convention), its forward returns the
argument list for its `loss`, and the jitted step threads params +
batch_stats + optimizer + step.

Optimizer matches the upstream zoo: Adam with optional exponential decay
(`scheduler_gamma` per epoch) and `kld_weight` (a.k.a. M_N) on the KL.
"""

from __future__ import annotations

import dataclasses
import os
import time
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct

from ..data.images import ImageDataset, ImageLoader, SyntheticImages
from ..parallel.mesh import make_mesh
from ..parallel.sharding import batch_sharding, replicated, shard_params
from .checkpoints import restore_checkpoint, save_checkpoint
from .metrics import MetricWriter


class ZooTrainState(struct.PyTreeNode):
    params: Any
    batch_stats: Any
    opt_state: Any
    step: jnp.ndarray
    epoch: jnp.ndarray


def _filter_fields(cls, params: Dict) -> Dict:
    fields = {f.name for f in dataclasses.fields(cls)}
    return {k: v for k, v in params.items() if k in fields}


class ZooExperiment:
    """YAML-driven experiment for registry models (VanillaVAE etc.)."""

    def __init__(self, model_params: Dict, exp_params: Dict,
                 data_params: Dict, trainer_params: Optional[Dict] = None,
                 logging_params: Optional[Dict] = None, mesh=None,
                 verbose: bool = True):
        from ..models import vae_models

        name = model_params["name"]
        if name not in vae_models:
            raise KeyError(f"Unknown model {name!r}; registry has "
                           f"{sorted(vae_models)}")
        cls = vae_models[name]
        mp = dict(model_params)
        if exp_params.get("bf16") or mp.get("bf16"):
            mp["dtype"] = jnp.bfloat16
        self.model = cls(**_filter_fields(cls, mp))
        self.model_name = name
        self.exp_params = dict(exp_params)
        self.data_params = dict(data_params)
        self.trainer_params = dict(trainer_params or {})
        self.logging_params = dict(logging_params or {})
        self.manual_seed = int(exp_params.get("manual_seed", 42))
        self.kld_weight = float(exp_params.get("kld_weight",
                                               exp_params.get("M_N", 1.0)))
        self.mesh = mesh if mesh is not None else make_mesh(model=1)
        self.verbose = verbose
        self.state: Optional[ZooTrainState] = None
        self.tx = None
        self._train_step = None
        self._eval_step = None
        self._base_rng = jax.random.PRNGKey(self.manual_seed)

    # ------------------------------------------------------------------
    def setup(self) -> None:
        dp = self.data_params
        data_dir = dp.get("data_path") or dp.get("data_dir")
        size = int(dp.get("img_size", dp.get("image_size", 64)))
        if data_dir and os.path.isdir(data_dir):
            self.train_ds = ImageDataset(data_dir, size,
                                         int(dp.get("center_crop", 148)),
                                         split="train")
            self.val_ds = ImageDataset(data_dir, size,
                                       int(dp.get("center_crop", 148)),
                                       split="val")
        else:
            n = int(dp.get("synthetic_size", 2048))
            if self.verbose:
                print(f"[Data] using {n} synthetic images (no data_path)")
            self.train_ds = SyntheticImages(n, size, seed=self.manual_seed)
            self.val_ds = SyntheticImages(max(n // 10, 1), size,
                                          seed=self.manual_seed + 1)
        pi, pc = jax.process_index(), jax.process_count()
        self.train_loader = ImageLoader(
            self.train_ds, int(dp.get("train_batch_size", 64)),
            shuffle=True, drop_last=True, seed=self.manual_seed,
            process_index=pi, process_count=pc)
        self.val_loader = ImageLoader(
            self.val_ds, int(dp.get("val_batch_size", 64)),
            shuffle=False, drop_last=False, seed=self.manual_seed,
            process_index=pi, process_count=pc)

    def init_state(self) -> ZooTrainState:
        size = int(self.data_params.get("img_size", 64))
        dummy = jnp.zeros((2, size, size, int(
            getattr(self.model, "in_channels", 3))), jnp.float32)
        k = jax.random.PRNGKey(self.manual_seed)
        variables = self.model.init(
            {"params": k, "reparam": k, "dropout": k}, dummy, train=False,
            **self._call_kwargs(dummy, 0, k, False))
        params = shard_params(variables["params"], self.mesh)
        batch_stats = variables.get("batch_stats", {})

        lr = float(self.exp_params.get("LR", 5e-3))
        wd = float(self.exp_params.get("weight_decay", 0.0))
        gamma = self.exp_params.get("scheduler_gamma")
        spe = max(1, len(self.train_loader)) if hasattr(self, "train_loader") \
            else 1
        if gamma is not None:
            lr_fn = optax.exponential_decay(
                lr, transition_steps=spe, decay_rate=float(gamma),
                staircase=True)
        else:
            lr_fn = optax.constant_schedule(lr)
        self.lr_fn = lr_fn
        chain = [optax.clip_by_global_norm(
            float(self.trainer_params.get("gradient_clip_val", 5.0)))]
        if wd > 0:
            chain.append(optax.adamw(lr_fn, weight_decay=wd))
        else:
            chain.append(optax.adam(lr_fn))
        self.tx = optax.chain(*chain)
        self.state = ZooTrainState(
            params=params, batch_stats=batch_stats,
            opt_state=self.tx.init(params),
            step=jnp.asarray(0, jnp.int32), epoch=jnp.asarray(0, jnp.int32))
        return self.state

    # ------------------------------------------------------------------
    def _call_kwargs(self, x, step, rng, train: bool):
        """Extra forward kwargs some zoo models need: the global step
        (Gumbel temperature / capacity schedules) and conditioning labels.
        No label files ship with this image, so conditional models train
        on deterministic pseudo-labels drawn from the step PRNG
        (documented deviation; see models/conditional_vae.py)."""
        kw = {}
        if getattr(self.model, "takes_step", False):
            kw["step"] = step
        if getattr(self.model, "conditional", False):
            lk = (jax.random.fold_in(rng, 17) if train
                  else jax.random.PRNGKey(17))
            n_cls = int(self.model.num_classes)
            kw["labels"] = jax.nn.one_hot(
                jax.random.randint(lk, (x.shape[0],), 0, n_cls), n_cls)
        return kw

    def _loss(self, params, batch_stats, x, step, rng, train: bool):
        variables = {"params": params, "batch_stats": batch_stats}
        rngs = None
        if train:
            kr, kd, kl_ = jax.random.split(rng, 3)
            rngs = {"reparam": kr, "dropout": kd}
            loss_key = kl_
        else:
            loss_key = jax.random.PRNGKey(0)
        out, mutated = self.model.apply(
            variables, x, train=train, rngs=rngs,
            mutable=["batch_stats"] if train else [],
            **self._call_kwargs(x, step, rng, train))
        ld = self.model.loss(*out, kld_weight=self.kld_weight, step=step,
                             key=loss_key)
        new_bs = mutated.get("batch_stats", batch_stats) if train \
            else batch_stats
        return ld["loss"], (ld, new_bs)

    def make_train_step(self):
        def step_fn(state: ZooTrainState, x, rng):
            rng = jax.random.fold_in(rng, state.step)

            def loss_fn(p):
                return self._loss(p, state.batch_stats, x, state.step, rng,
                                  True)

            grads, (ld, new_bs) = jax.grad(loss_fn, has_aux=True)(
                state.params)
            updates, opt_state = self.tx.update(grads, state.opt_state,
                                                state.params)
            params = optax.apply_updates(state.params, updates)
            return state.replace(
                params=params, batch_stats=new_bs, opt_state=opt_state,
                step=state.step + 1), ld

        return jax.jit(step_fn, donate_argnums=(0,))

    def make_eval_step(self):
        def step_fn(state: ZooTrainState, x):
            _, (ld, _) = self._loss(state.params, state.batch_stats, x,
                                    state.step, jax.random.PRNGKey(0), False)
            return ld

        return jax.jit(step_fn)

    # ------------------------------------------------------------------
    def fit(self, max_epochs: Optional[int] = None,
            resume_ckpt: Optional[str] = None,
            log_dir: Optional[str] = None,
            ckpt_dir: Optional[str] = None,
            limit_train_batches: Optional[int] = None) -> ZooTrainState:
        if not hasattr(self, "train_loader"):
            self.setup()
        if self.state is None:
            self.init_state()
            if resume_ckpt:
                self.state, _ = restore_checkpoint(resume_ckpt, self.state)
                print(f"[Resume] step={int(self.state.step)}")
        if self._train_step is None:
            self._train_step = self.make_train_step()
            self._eval_step = self.make_eval_step()
        max_epochs = int(max_epochs if max_epochs is not None
                         else self.trainer_params.get("max_epochs", 10))
        is_main = jax.process_index() == 0
        name = self.logging_params.get("name", self.model_name)
        writer = MetricWriter(
            log_dir or os.path.join(
                self.logging_params.get("save_dir", "./logs"), name),
            enabled=is_main)
        ckpt_dir = ckpt_dir or self.exp_params.get(
            "checkpoint_dir", f"./checkpoints/{name}")
        print_every = int(self.exp_params.get("print_every", 100))
        sh = batch_sharding(self.mesh)
        repl = replicated(self.mesh)
        n_data = self.mesh.devices.shape[0]

        def put(x):
            # partial batches (e.g. a short val tail) can't split across
            # the data axis — replicate them instead
            x = jnp.asarray(x)
            return jax.device_put(
                x, sh if x.shape[0] % n_data == 0 else repl)

        t0 = time.time()
        for epoch in range(int(self.state.epoch), max_epochs):
            self.train_loader.set_epoch(epoch)
            sums: Dict[str, float] = {}
            nb = 0
            for bi, x in enumerate(self.train_loader):
                if limit_train_batches and bi >= limit_train_batches:
                    break
                xb = put(x)
                self.state, ld = self._train_step(self.state, xb,
                                                  self._base_rng)
                nb += 1
                for k, v in ld.items():
                    sums[k] = sums.get(k, 0.0) + float(v)
                if print_every and bi % print_every == 0 and is_main:
                    parts = " | ".join(
                        f"{k}={float(v):.4f}" for k, v in ld.items())
                    print(f"[{self.model_name}] e{epoch} b{bi:04d} {parts}",
                          flush=True)
            if nb and is_main:
                writer.write(int(self.state.step),
                             {k: v / nb for k, v in sums.items()},
                             prefix="train")
            # val
            vs: Dict[str, float] = {}
            vn = 0
            for x in self.val_loader:
                ld = self._eval_step(self.state, put(x))
                for k, v in ld.items():
                    vs[k] = vs.get(k, 0.0) + float(v)
                vn += 1
            if vn and is_main:
                writer.write(int(self.state.step),
                             {k: v / vn for k, v in vs.items()}, prefix="val")
                print(f"[{self.model_name}] epoch {epoch} "
                      f"val_loss={vs['loss'] / vn:.4f}")
            self.state = self.state.replace(
                epoch=jnp.asarray(epoch + 1, jnp.int32))
            if is_main:
                save_checkpoint(ckpt_dir, "last", self.state)
                if self.exp_params.get("save_samples", True):
                    try:
                        self.save_grids(os.path.join(writer.log_dir,
                                                     "samples"), epoch)
                    except Exception as e:  # sampling must never kill a run
                        print(f"[warn] sample grid failed: {e!r}")
        if is_main:
            print(f"[Fit] {max_epochs} epochs in "
                  f"{(time.time() - t0) / 60:.2f} min")
        writer.close()
        return self.state

    # ------------------------------------------------------------------
    def sample(self, num_samples: int, seed: int = 0) -> np.ndarray:
        variables = {"params": self.state.params,
                     "batch_stats": self.state.batch_stats}
        out = self.model.apply(variables, num_samples,
                               jax.random.PRNGKey(seed), method="sample")
        return np.asarray(out)

    def save_grids(self, out_dir: str, epoch: int, n: int = 16) -> None:
        """Save sample + reconstruction grids per epoch (the upstream zoo
        saved both every epoch for visual regression)."""
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        os.makedirs(out_dir, exist_ok=True)

        def grid(imgs, path, title):
            k = int(np.ceil(np.sqrt(len(imgs))))
            fig, axes = plt.subplots(k, k, figsize=(k * 1.6, k * 1.6))
            for ax, im in zip(np.asarray(axes).ravel(), imgs):
                ax.imshow(np.clip((im + 1) / 2, 0, 1))
            for ax in np.asarray(axes).ravel():
                ax.axis("off")
            fig.suptitle(title)
            fig.tight_layout()
            fig.savefig(path, dpi=90)
            plt.close(fig)

        try:
            samples = self.sample(n, seed=epoch)
            grid(samples, os.path.join(out_dir, f"samples_e{epoch:03d}.png"),
                 f"{self.model_name} samples (epoch {epoch})")
        except RuntimeError:
            pass  # models without an unconditional prior
        x = next(iter(self.val_loader))[:n]
        rec = self.reconstruct(x)
        if rec.ndim == 5:  # IWAE family returns [B, K, H, W, C]
            rec = rec[:, 0]
        interleaved = np.stack([x, rec], axis=1).reshape(-1, *x.shape[1:])
        grid(interleaved[: n * 2],
             os.path.join(out_dir, f"recons_e{epoch:03d}.png"),
             f"{self.model_name} input/recon pairs (epoch {epoch})")

    def reconstruct(self, x: np.ndarray) -> np.ndarray:
        variables = {"params": self.state.params,
                     "batch_stats": self.state.batch_stats}
        out = self.model.apply(variables, jnp.asarray(x), method="generate")
        return np.asarray(out)
