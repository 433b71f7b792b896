"""Real image files through the PIL decode/crop/resize/normalize path and
a zoo train step (reference dataset.py CelebA semantics: 148 center-crop
-> 64x64 -> [-1, 1]; here scaled-down fixtures exercise the same code)."""

import os

import numpy as np
import pytest

from pytorch_vae_tpu.data.images import ImageDataset, ImageLoader

FIXTURES = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "fixtures", "images")


def test_pil_crop_resize_normalize():
    pytest.importorskip("PIL")
    ds = ImageDataset(FIXTURES, image_size=64, center_crop=80,
                      split="train")
    assert len(ds) == 5  # 6 files, 5% val split -> 1 val file
    img = ds[0]
    assert img.shape == (64, 64, 3)
    assert img.dtype == np.float32
    assert -1.0 <= img.min() and img.max() <= 1.0
    assert img.std() > 0.05  # decoded real content, not constants
    # deterministic decode
    np.testing.assert_array_equal(img, ds[0])
    val = ImageDataset(FIXTURES, image_size=64, center_crop=80, split="val")
    assert len(val) == 1
    # center crop actually crops: full-frame resize differs
    full = ImageDataset(FIXTURES, image_size=64, center_crop=0,
                        split="train")
    assert not np.allclose(full[0], img)


def test_loader_batches_real_files():
    pytest.importorskip("PIL")
    ds = ImageDataset(FIXTURES, image_size=32, center_crop=80)
    loader = ImageLoader(ds, batch_size=4, shuffle=True, drop_last=True,
                         seed=0)
    batches = list(loader)
    assert len(batches) == 1
    assert batches[0].shape == (4, 32, 32, 3)
    loader.set_epoch(1)
    b2 = next(iter(loader))
    assert not np.array_equal(batches[0], b2)  # reshuffled


def test_zoo_train_step_on_real_images():
    """VanillaVAE end-to-end: real PNGs -> loader -> jitted train step."""
    pytest.importorskip("PIL")
    import jax
    import jax.numpy as jnp

    from pytorch_vae_tpu.parallel.mesh import make_mesh
    from pytorch_vae_tpu.training.zoo_experiment import ZooExperiment

    exp = ZooExperiment(
        {"name": "VanillaVAE", "in_channels": 3, "latent_dim": 8,
         "hidden_dims": (8, 16), "image_size": 16},
        {"LR": 1e-3, "kld_weight": 0.00025, "manual_seed": 0},
        {"data_path": FIXTURES, "img_size": 16, "center_crop": 80,
         "train_batch_size": 4},
        {"max_epochs": 1}, verbose=False,
        mesh=make_mesh(data=1, model=1, devices=jax.devices()[:1]))
    exp.setup()
    assert isinstance(exp.train_ds, ImageDataset)  # real files, not synth
    exp.init_state()
    step = exp.make_train_step()
    x = jnp.asarray(next(iter(exp.train_loader)))
    losses = []
    for i in range(3):
        exp.state, ld = step(exp.state, x, exp._base_rng)
        losses.append(float(ld["loss"]))
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0]  # it learns the 4 images quickly
