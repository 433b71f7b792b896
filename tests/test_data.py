"""Data layer tests: curve dataset, bucketed padding, loader sharding,
synthetic generator sanity, image pipeline."""

import numpy as np
import pytest

from pytorch_vae_tpu.data.curves import (
    CurveDataset,
    CurveLoader,
    bucket_for,
    default_buckets,
    pad_batch,
    shard_by_process,
)
from pytorch_vae_tpu.data.images import ImageLoader, SyntheticImages
from pytorch_vae_tpu.data.synthetic import make_synthetic_curve_dir


@pytest.fixture(scope="module")
def curve_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("dl_curves")
    make_synthetic_curve_dir(str(d), n_train=20, n_val=6, seed=1,
                             min_len=30, max_len=120)
    return str(d)


def test_default_buckets_cover_max():
    b = default_buckets(350, 32)
    assert b[-1] == 350
    assert bucket_for(1, b) == 32
    assert bucket_for(33, b) == 64
    assert bucket_for(350, b) == 350


def test_pad_batch_bucket_and_mask():
    s = [np.ones((10, 6), np.float32), np.ones((40, 6), np.float32)]
    x, mask = pad_batch(s, buckets=(32, 64, 96))
    assert x.shape == (2, 64, 6)
    assert mask.sum() == 50
    assert (x[0, 10:] == 0).all()
    with pytest.raises(ValueError):
        pad_batch(s, pad_to=20)


def test_dataset_centering_and_sanitize(curve_dir):
    ds = CurveDataset(curve_dir,
                      list_path=f"{curve_dir}/train_list.txt",
                      verbose=False)
    s = ds[0]
    assert s.shape[1] == 6
    # per-curve centered xyz
    np.testing.assert_allclose(s[:, :3].mean(axis=0), 0.0, atol=1e-4)
    # one-hot SS
    np.testing.assert_allclose(s[:, 3:].sum(axis=1), 1.0, atol=1e-6)
    assert np.isfinite(s).all()


def test_dataset_max_seq_len_truncates(curve_dir):
    ds = CurveDataset(curve_dir, list_path=f"{curve_dir}/train_list.txt",
                      max_seq_len=25, verbose=False)
    assert all(ds[i].shape[0] <= 25 for i in range(len(ds)))


def test_loader_epoch_shuffle_and_drop_last(curve_dir):
    ds = CurveDataset(curve_dir, list_path=f"{curve_dir}/train_list.txt",
                      verbose=False)
    dl = CurveLoader(ds, batch_size=6, shuffle=True, drop_last=True,
                     seed=0, prefetch=0, pad_to=128)
    assert len(dl) == 3  # 20 // 6
    b0_e0 = next(iter(dl))[0]
    dl.set_epoch(1)
    b0_e1 = next(iter(dl))[0]
    assert b0_e0.shape == b0_e1.shape == (6, 128, 6)
    assert not np.array_equal(b0_e0, b0_e1)  # different shuffle per epoch
    dl.set_epoch(0)
    b0_again = next(iter(dl))[0]
    np.testing.assert_array_equal(b0_e0, b0_again)  # deterministic


def test_shard_by_process_partitions():
    idx = np.arange(22)
    shards = [shard_by_process(idx, r, 4) for r in range(4)]
    tot = np.sort(np.concatenate(shards))
    np.testing.assert_array_equal(tot, np.arange(20))  # remainder dropped
    assert all(len(s) == 5 for s in shards)
    assert len(set(map(tuple, shards))) == 4  # disjoint


def test_loader_prefetch_thread(curve_dir):
    ds = CurveDataset(curve_dir, list_path=f"{curve_dir}/train_list.txt",
                      verbose=False)
    dl = CurveLoader(ds, batch_size=4, prefetch=2, pad_to=128)
    batches = list(dl)
    assert len(batches) == len(dl)


def test_synthetic_curves_protein_like(curve_dir):
    ds = CurveDataset(curve_dir, list_path=f"{curve_dir}/train_list.txt",
                      verbose=False)
    s = ds[3]
    bonds = np.linalg.norm(np.diff(s[:, :3], axis=0), axis=1)
    assert 2.0 < bonds.mean() < 5.0  # ~C-alpha spacing


def test_synthetic_images_deterministic_and_bounded():
    ds = SyntheticImages(10, 32, seed=4)
    a, b = ds[3], ds[3]
    np.testing.assert_array_equal(a, b)
    assert a.shape == (32, 32, 3)
    assert a.min() >= -1.0 and a.max() <= 1.0
    assert not np.array_equal(ds[3], ds[4])


def test_image_loader_batches():
    ds = SyntheticImages(20, 16, seed=0)
    dl = ImageLoader(ds, batch_size=8, drop_last=True)
    bs = list(dl)
    assert len(bs) == 2 and bs[0].shape == (8, 16, 16, 3)
