"""Golden params-only bundles (utils/golden.py, scripts/export_golden.py).

The recycle-proof checkpoint path behind `make reproduce-line`: an orbax
TrainState exported to one compressed .npz must load through
AEBundle.from_checkpoint and produce bit-identical encodes/decodes to the
orbax directory it came from.
"""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _export(ckpt_path, config_path, out):
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts/export_golden.py"),
         "--ckpt", ckpt_path, "--config", config_path, "--out", out],
        capture_output=True, text=True, env={
            **os.environ, "JAX_PLATFORMS": "cpu",
            "PVT_NO_COMPILE_CACHE": "1"})
    assert proc.returncode == 0, proc.stderr[-2000:]
    return json.loads(proc.stdout.strip().splitlines()[-1])


@pytest.fixture(scope="module")
def golden_npz(tiny_ckpt, tmp_path_factory):
    config_path, ckpt_path = tiny_ckpt
    out = str(tmp_path_factory.mktemp("golden") / "tiny_golden.npz")
    meta = _export(ckpt_path, config_path, out)
    return config_path, ckpt_path, out, meta


def test_export_cli_roundtrip_and_meta(golden_npz):
    config_path, ckpt_path, out, meta = golden_npz
    assert meta["roundtrip"] == "bit-exact"
    assert meta["n_arrays"] > 0 and meta["n_bytes"] > 0
    assert meta["source_ckpt"] == ckpt_path
    # params-only: far smaller than the full TrainState directory
    state_bytes = sum(
        os.path.getsize(os.path.join(dp, f))
        for dp, _, fs in os.walk(ckpt_path) for f in fs)
    assert os.path.getsize(out) < state_bytes


def test_bundle_loads_golden_and_matches_orbax(golden_npz):
    from pytorch_vae_tpu.pipelines.inference import AEBundle

    config_path, ckpt_path, out, _ = golden_npz
    b_orbax = AEBundle.from_checkpoint(config_path, ckpt_path)
    b_gold = AEBundle.from_checkpoint(config_path, out)

    rng = np.random.default_rng(0)
    x = np.cumsum(rng.normal(size=(2, 24, 3)), axis=1)
    ss = np.eye(3, dtype=np.float32)[rng.integers(0, 3, (2, 24))]
    curve = np.concatenate([x, ss], -1).astype(np.float32)
    mask = np.ones((2, 24), np.float32)

    z_o = np.asarray(b_orbax._encode_fn(b_orbax.params, curve, mask))
    z_g = np.asarray(b_gold._encode_fn(b_gold.params, curve, mask))
    np.testing.assert_array_equal(z_o, z_g)

    d_o = b_orbax._decode_fn(b_orbax.params, z_o, mask)
    d_g = b_gold._decode_fn(b_gold.params, z_g, mask)
    for a, b in zip(np.asarray(d_o).ravel(), np.asarray(d_g).ravel()):
        assert a == b


def test_golden_rejects_non_bundle(tmp_path):
    from pytorch_vae_tpu.utils import golden

    p = str(tmp_path / "junk.npz")
    np.savez(p, foo=np.zeros(3))
    with pytest.raises(ValueError, match="not a golden bundle"):
        golden.load_golden(p)


def test_vq_state_travels(tmp_path):
    """A VQ model's quantizer EMA state survives the round trip."""
    from pytorch_vae_tpu.utils import golden

    state = {
        "params": {"dense": {"kernel": np.arange(6.0).reshape(2, 3)}},
        "vq_state": {"embedding": np.ones((2, 4, 8), np.float32),
                     "ema_cluster_size": np.full((2, 4), 0.5),
                     "ema_embedding": np.zeros((2, 4, 8), np.float32)},
    }
    out = str(tmp_path / "g.npz")
    golden.export_golden(state, out, source_ckpt="x")
    params, vq, meta = golden.load_golden(out)
    np.testing.assert_array_equal(params["dense"]["kernel"],
                                  state["params"]["dense"]["kernel"])
    assert vq is not None
    for k in state["vq_state"]:
        np.testing.assert_array_equal(vq[k], state["vq_state"][k])
    assert meta["n_arrays"] == 4


def test_golden_warm_starts_training(golden_npz, tmp_path):
    """A golden bundle is a valid --warm_start_ckpt: params AND the EMA
    codebook come back, so a fine-tune leg can bootstrap from the
    committed bundle when the orbax checkpoint line is lost to machine
    recycling (CLAUDE.md; consumers: scripts/ft9_keeppush_r4.sh,
    configs/synth_vq_huge_ft3g.yaml)."""
    import jax
    import yaml

    from pytorch_vae_tpu.parallel.mesh import make_mesh
    from pytorch_vae_tpu.training.experiment import VQVAEExperiment
    from tests.conftest import TINY_MODEL

    config_path, ckpt_path, out, _ = golden_npz
    with open(config_path) as f:
        cfg = yaml.safe_load(f)
    dp = {**cfg["data_params"], "train_batch_size": 4,
          "val_batch_size": 4, "pad_to_max": True}
    exp = VQVAEExperiment(
        TINY_MODEL,
        {"LR": 1e-3, "weight_decay": 0.01, "manual_seed": 1,
         "lr_scheduler": "none", "save_every_epochs": 1},
        dp, {"max_epochs": 1}, verbose=False,
        mesh=make_mesh(data=1, model=1, devices=jax.devices()[:1]))
    exp.setup()
    exp.init_state(steps_per_epoch=2, max_epochs=1)
    fresh_emb = np.asarray(exp.state.vq_state.embedding).copy()

    exp.apply_restore_modes(warm_start_ckpt=out)

    from pytorch_vae_tpu.utils.golden import load_golden
    g_params, g_vq, _ = load_golden(out)
    got = jax.tree_util.tree_leaves(jax.device_get(exp.state.params))
    want = jax.tree_util.tree_leaves(g_params)
    assert len(got) == len(want)
    for a, b in zip(got, want):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    np.testing.assert_array_equal(
        np.asarray(exp.state.vq_state.embedding), g_vq["embedding"])
    np.testing.assert_array_equal(
        np.asarray(exp.state.vq_state.ema_cluster_size),
        g_vq["ema_cluster_size"])
    # the trained-one-step codebook differs from a fresh init
    assert not np.array_equal(np.asarray(exp.state.vq_state.embedding),
                              fresh_emb)
    # step/epoch stay zero: warm start is not resume
    assert int(exp.state.step) == 0 and int(exp.state.epoch) == 0


def test_golden_warm_start_cross_geometry_keeps_fresh_codebook(
        golden_npz, capsys):
    """A golden bundle whose codebook geometry differs from the target
    model (the 2x256 -> 4x1024 -> 8x1024 capacity-escalation pattern)
    must NOT install the mismatched VQState: the fresh codebook stays,
    matching the strict=False shape-filter semantics of the params merge
    (ADVICE r4: experiment.py golden vq_state had no shape validation)."""
    import jax
    import yaml

    from pytorch_vae_tpu.parallel.mesh import make_mesh
    from pytorch_vae_tpu.training.experiment import VQVAEExperiment
    from tests.conftest import TINY_MODEL

    config_path, _, out, _ = golden_npz
    with open(config_path) as f:
        cfg = yaml.safe_load(f)
    dp = {**cfg["data_params"], "train_batch_size": 4,
          "val_batch_size": 4, "pad_to_max": True}
    # double the codebook: golden vq_state (2x16x16) no longer matches
    big = {**TINY_MODEL, "codebook_size": 32}
    exp = VQVAEExperiment(
        big,
        {"LR": 1e-3, "weight_decay": 0.01, "manual_seed": 1,
         "lr_scheduler": "none", "save_every_epochs": 1},
        dp, {"max_epochs": 1}, verbose=False,
        mesh=make_mesh(data=1, model=1, devices=jax.devices()[:1]))
    exp.setup()
    exp.init_state(steps_per_epoch=2, max_epochs=1)
    fresh_emb = np.asarray(exp.state.vq_state.embedding).copy()

    exp.apply_restore_modes(warm_start_ckpt=out)

    # codebook untouched, warning printed, no crash at trace time
    np.testing.assert_array_equal(
        np.asarray(exp.state.vq_state.embedding), fresh_emb)
    assert "keeping fresh codebook" in capsys.readouterr().out
