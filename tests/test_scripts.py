"""CLI script coverage: generated-feature decoder (reference
scripts/decode_gen_features_to_npy.py:83-157) driven end-to-end against a
tiny trained checkpoint."""

import os
import runpy
import sys

import numpy as np
import pytest

from conftest import TINY_MODEL as MODEL

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


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
