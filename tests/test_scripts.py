"""CLI script coverage: generated-feature decoder (reference
scripts/decode_gen_features_to_npy.py:83-157) driven end-to-end against a
tiny trained checkpoint."""

import os
import runpy
import sys

import jax
import numpy as np
import pytest
import yaml

from pytorch_vae_tpu.data.synthetic import make_synthetic_curve_dir
from pytorch_vae_tpu.parallel.mesh import make_mesh
from pytorch_vae_tpu.training.experiment import VQVAEExperiment

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

MODEL = {
    "name": "VQVAE-sc", "input_dim": 6, "hidden_dim": 32, "num_layers": 1,
    "num_heads": 4, "ffn_dim": 64, "max_seq_len": 48, "use_vq": True,
    "num_quantizers": 2, "codebook_size": 16, "code_dim": 16,
    "latent_tokens": 4, "tokenizer_layers": 1,
}


@pytest.fixture(scope="module")
def tiny_ckpt(tmp_path_factory):
    """One trained step -> orbax checkpoint + matching YAML config."""
    from pytorch_vae_tpu.training.checkpoints import save_checkpoint

    root = tmp_path_factory.mktemp("tiny_ckpt")
    data_dir = str(root / "curves")
    make_synthetic_curve_dir(data_dir, n_train=8, n_val=4, seed=0,
                             min_len=16, max_len=48)
    exp = VQVAEExperiment(
        MODEL,
        {"LR": 1e-3, "weight_decay": 0.01, "manual_seed": 0,
         "lr_scheduler": "none", "save_every_epochs": 1},
        {"npy_dir": data_dir, "train_list": "train_list.txt",
         "val_list": "val_list.txt", "train_batch_size": 4,
         "val_batch_size": 4, "pad_to_max": True},
        {"max_epochs": 1}, verbose=False,
        mesh=make_mesh(data=1, model=1, devices=jax.devices()[:1]))
    exp.setup()
    exp.init_state(steps_per_epoch=2, max_epochs=1)
    step = exp.make_train_step()
    w = exp._dynamic_weights(0)
    x, mask = next(iter(exp.train_loader))
    xb, mb = exp._put(x, mask)
    exp.state, _ = step(exp.state, xb, mb, w, exp._base_rng)
    ckpt_path = save_checkpoint(str(root / "ckpts"), "tiny", exp.state)

    config_path = str(root / "tiny.yaml")
    with open(config_path, "w") as f:
        yaml.safe_dump({"model_params": MODEL}, f)
    return config_path, ckpt_path


def run_script(name, argv):
    old = sys.argv
    sys.argv = [name] + argv
    try:
        runpy.run_path(os.path.join(REPO, "scripts", name),
                       run_name="__main__")
    finally:
        sys.argv = old


@pytest.mark.parametrize("fmt", ["npy", "pt", "npz"])
def test_decode_gen_features(tiny_ckpt, tmp_path, fmt):
    config_path, ckpt_path = tiny_ckpt
    n, target_len = 5, 40
    feats = np.random.default_rng(0).normal(
        size=(n, MODEL["latent_tokens"], MODEL["code_dim"])
    ).astype(np.float32)
    fp = str(tmp_path / f"gen_features.{fmt}")
    if fmt == "npy":
        np.save(fp, feats)
    elif fmt == "npz":
        np.savez(fp, features=feats)
    else:
        import torch

        torch.save(torch.from_numpy(feats), fp)

    out_dir = str(tmp_path / "out")
    run_script("decode_gen_features_to_npy.py", [
        "--config", config_path, "--ckpt", ckpt_path,
        "--features", fp, "--out_dir", out_dir,
        "--target_len", str(target_len), "--batch_size", "3"])

    files = sorted(os.listdir(out_dir))
    assert files == [f"curve_{i:05d}.npy" for i in range(n)]
    for fn in files:
        c = np.load(os.path.join(out_dir, fn))
        # raw decoder output: [target_len, 6] (xyz + SS logits, no argmax)
        assert c.shape == (target_len, 6)
        assert np.isfinite(c).all()
        # SS columns are logits, not one-hot
        assert not np.allclose(np.sort(c[:, 3:], axis=-1)[:, :2], 0.0)


def test_decode_gen_features_shape_mismatch(tiny_ckpt, tmp_path):
    config_path, ckpt_path = tiny_ckpt
    bad = np.zeros((3, 7, MODEL["code_dim"]), np.float32)
    fp = str(tmp_path / "bad.npy")
    np.save(fp, bad)
    with pytest.raises(RuntimeError, match="do not match"):
        run_script("decode_gen_features_to_npy.py", [
            "--config", config_path, "--ckpt", ckpt_path,
            "--features", fp, "--out_dir", str(tmp_path / "o"),
            "--target_len", "16"])
