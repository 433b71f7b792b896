"""Integration tests: full curve experiment on an 8-device CPU mesh,
checkpoint resume roundtrip, warm-start, native filter parity."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pytorch_vae_tpu.data.synthetic import make_synthetic_curve_dir
from pytorch_vae_tpu.parallel.mesh import make_mesh
from pytorch_vae_tpu.training.experiment import VQVAEExperiment

MODEL = {
    "name": "VQVAE-it", "input_dim": 6, "hidden_dim": 32, "num_layers": 1,
    "num_heads": 4, "ffn_dim": 64, "max_seq_len": 64, "use_vq": True,
    "num_quantizers": 2, "codebook_size": 16, "code_dim": 16,
    "latent_tokens": 4, "tokenizer_layers": 1,
}
EXP = {"LR": 1e-3, "weight_decay": 0.01, "manual_seed": 3,
       "lr_scheduler": "none", "save_every_epochs": 1,
       "schedules": {"beta": [[0, 0.001], [2, 0.01]]}}


@pytest.fixture(scope="module")
def data_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("curves")
    make_synthetic_curve_dir(str(d), n_train=24, n_val=8, seed=0,
                             min_len=20, max_len=64)
    return str(d)


def _mk_exp(data_dir, mesh=None, **exp_over):
    data = {"npy_dir": data_dir, "train_list": "train_list.txt",
            "val_list": "val_list.txt", "train_batch_size": 8,
            "val_batch_size": 8, "pad_to_max": True}
    exp = dict(EXP, **exp_over)
    return VQVAEExperiment(MODEL, exp, data, {"max_epochs": 2},
                           mesh=mesh, verbose=False)


def test_single_device_train_steps(data_dir):
    exp = _mk_exp(data_dir, mesh=make_mesh(data=1, model=1,
                                           devices=jax.devices()[:1]))
    exp.setup()
    exp.init_state(steps_per_epoch=3, max_epochs=2)
    step = exp.make_train_step()
    w = exp._dynamic_weights(0)
    losses = []
    for bi, (x, mask) in enumerate(exp.train_loader):
        if bi >= 3:
            break
        xb, mb = exp._put(x, mask)
        exp.state, ld = step(exp.state, xb, mb, w, exp._base_rng)
        losses.append(float(ld["loss"]))
    assert all(np.isfinite(losses))
    assert int(exp.state.step) == 3


def test_data_parallel_8_devices_matches_semantics(data_dir):
    """The sharded step runs on the full 8-device mesh and the EMA
    codebook stays replicated-identical (the reference's DDP never
    synchronized it — SURVEY.md §2.2)."""
    mesh = make_mesh(data=8, model=1)
    exp = _mk_exp(data_dir)
    exp.mesh = mesh
    exp.setup()
    exp.init_state(steps_per_epoch=3, max_epochs=2)
    step = exp.make_train_step()
    w = exp._dynamic_weights(0)
    x, mask = next(iter(exp.train_loader))
    xb, mb = exp._put(x, mask)
    exp.state, ld = step(exp.state, xb, mb, w, exp._base_rng)
    assert np.isfinite(float(ld["loss"]))
    # codebook changed (EMA ran) and is a single global value
    emb = np.asarray(exp.state.vq_state.embedding)
    assert emb.shape == (32, 16)
    assert np.isfinite(emb).all()


def test_checkpoint_resume_roundtrip(data_dir, tmp_path):
    from pytorch_vae_tpu.training.checkpoints import (
        restore_checkpoint,
        save_checkpoint,
    )

    exp = _mk_exp(data_dir)
    exp.setup()
    exp.init_state(steps_per_epoch=3, max_epochs=2)
    step = exp.make_train_step()
    w = exp._dynamic_weights(0)
    x, mask = next(iter(exp.train_loader))
    xb, mb = exp._put(x, mask)
    exp.state, _ = step(exp.state, xb, mb, w, exp._base_rng)
    path = save_checkpoint(str(tmp_path), "ck", exp.state)

    # continue two ways: live state vs restored state -> identical result
    exp2 = _mk_exp(data_dir)
    exp2.setup()
    exp2.init_state(steps_per_epoch=3, max_epochs=2)
    restored, _ = restore_checkpoint(path, exp2.state)
    xb2, mb2 = exp2._put(x, mask)
    s_live, ld_live = step(exp.state, xb, mb, w, exp._base_rng)
    step2 = exp2.make_train_step()
    s_rest, ld_rest = step2(restored, xb2, mb2, w, exp2._base_rng)
    np.testing.assert_allclose(float(ld_live["loss"]),
                               float(ld_rest["loss"]), rtol=1e-5)
    a = np.asarray(jax.tree.leaves(s_live.params)[0])
    b = np.asarray(jax.tree.leaves(s_rest.params)[0])
    np.testing.assert_allclose(a, b, atol=1e-6)


def test_warm_start_drops_nothing_but_shapes(data_dir, tmp_path):
    from pytorch_vae_tpu.training.checkpoints import (
        save_checkpoint,
        warm_start_params,
    )

    exp = _mk_exp(data_dir)
    exp.setup()
    exp.init_state(steps_per_epoch=3, max_epochs=2)
    path = save_checkpoint(str(tmp_path), "ws", exp.state)

    # same architecture: everything restores
    exp2 = _mk_exp(data_dir)
    exp2.setup()
    exp2.init_state(steps_per_epoch=3, max_epochs=2)
    merged, kept, skipped = warm_start_params(path, exp2.state.params,
                                              verbose=False)
    assert len(skipped) == 0 and len(kept) > 0
    # different code_dim: to_code/from_code kernels shape-skip, trunk loads
    model3 = dict(MODEL, code_dim=8)
    exp3 = VQVAEExperiment(model3, EXP, exp2.data_params,
                           {"max_epochs": 1}, verbose=False)
    exp3.setup()
    exp3.init_state(steps_per_epoch=1, max_epochs=1)
    merged3, kept3, skipped3 = warm_start_params(path, exp3.state.params,
                                                 verbose=False)
    assert len(skipped3) > 0 and len(kept3) > 0


def test_vq_state_survives_warm_start(data_dir, tmp_path):
    """Codebook lives outside params, so warm-start can never clobber it
    (the reference drops quantizer.* keys to guarantee this,
    experiment.py:288-293 — here it holds structurally)."""
    exp = _mk_exp(data_dir)
    exp.setup()
    exp.init_state(steps_per_epoch=1, max_epochs=1)
    emb_before = np.asarray(exp.state.vq_state.embedding).copy()
    from pytorch_vae_tpu.training.checkpoints import save_checkpoint

    path = save_checkpoint(str(tmp_path), "c", exp.state)
    exp.apply_restore_modes(warm_start_ckpt=path)
    np.testing.assert_array_equal(
        np.asarray(exp.state.vq_state.embedding), emb_before)


def test_native_filter_matches_numpy_fallback():
    from pytorch_vae_tpu.pipelines import filtering

    lib = filtering._load_native()
    if lib is None:
        pytest.skip("native lib unavailable (no g++?)")
    rng = np.random.default_rng(2)
    for _ in range(3):
        coords = np.cumsum(rng.normal(size=(60, 3)), axis=0).astype(
            np.float32) * 1.3
        c, ptr = filtering._c_coords(coords)
        n_nat = int(lib.ff_point_collisions(ptr, 60, 2.2, 2))
        s_nat = int(lib.ff_segment_clashes(ptr, 60, 1.3, 1, 5))
        saved = filtering._native_lib
        filtering._native_lib = None
        try:
            assert filtering.self_collision_count(coords, 2.2, 2) == n_nat
            assert filtering.segment_clash_count(coords, 1.3, 1, 5) == s_nat
        finally:
            filtering._native_lib = saved
