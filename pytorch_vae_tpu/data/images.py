"""Image dataset/loader for the classic VAE model zoo.

Rebuilds the reference CelebA path (/root/reference upstream
`dataset.py` semantics preserved by this fork's README zoo): decode ->
center-crop 148 -> resize 64x64 -> scale to [-1, 1], NHWC float32 (TPU
convs are NHWC-native; torch's NCHW is a CUDA convention).

`SyntheticImages` is the no-dataset fallback: deterministic smooth
blob/gradient images a small VAE can actually fit, used by tests and the
bench (no image corpus ships with this environment).
"""

from __future__ import annotations

import os
import queue
import threading
from typing import List, Optional

import numpy as np

from .curves import shard_by_process

__all__ = ["ImageDataset", "ImageLoader", "SyntheticImages"]

_IMG_EXTS = (".png", ".jpg", ".jpeg", ".bmp", ".webp")


class ImageDataset:
    """Directory of image files -> [H, W, 3] float32 in [-1, 1].

    Split semantics: deterministic 95/5 train/val on the sorted file list
    (the reference fork trains CelebA with a fixed split; with no
    partition file present, a sorted-tail split is reproducible across
    hosts). center_crop=0 disables cropping.
    """

    def __init__(self, data_dir: str, image_size: int = 64,
                 center_crop: int = 148, split: str = "train"):
        self.data_dir = data_dir
        self.image_size = int(image_size)
        self.center_crop = int(center_crop)
        files = sorted(
            f for f in os.listdir(data_dir)
            if f.lower().endswith(_IMG_EXTS))
        if not files:
            raise FileNotFoundError(f"No image files in {data_dir}")
        n_val = max(1, round(0.05 * len(files))) if len(files) > 1 else 0
        if split == "train":
            keep = files[: len(files) - n_val]
        elif split == "val":
            keep = files[len(files) - n_val:]
        else:
            raise ValueError(f"split must be train|val, got {split!r}")
        if not keep:
            raise FileNotFoundError(
                f"Split {split!r} of {data_dir} is empty "
                f"({len(files)} file(s) total; 95/5 split)")
        self.files: List[str] = [os.path.join(data_dir, f) for f in keep]

    def __len__(self) -> int:
        return len(self.files)

    def __getitem__(self, idx: int) -> np.ndarray:
        from PIL import Image

        with Image.open(self.files[idx]) as im:
            im = im.convert("RGB")
            if self.center_crop > 0:
                w, h = im.size
                c = min(self.center_crop, w, h)
                left, top = (w - c) // 2, (h - c) // 2
                im = im.crop((left, top, left + c, top + c))
            im = im.resize((self.image_size, self.image_size),
                           Image.BILINEAR)
            arr = np.asarray(im, np.float32)
        return arr / 127.5 - 1.0


class SyntheticImages:
    """Deterministic procedural images: smooth gradients + soft blobs.

    ds[i] is a pure function of (seed, i): reproducible across epochs and
    hosts with zero storage. Values bounded to [-1, 1]; low-frequency
    content so small VAEs converge in a few steps (used by fit-smoke
    tests and the throughput bench).
    """

    def __init__(self, n: int, image_size: int = 64, seed: int = 0):
        self.n = int(n)
        self.image_size = int(image_size)
        self.seed = int(seed)

    def __len__(self) -> int:
        return self.n

    def __getitem__(self, idx: int) -> np.ndarray:
        if not 0 <= idx < self.n:
            raise IndexError(idx)
        rng = np.random.default_rng((self.seed, int(idx)))
        s = self.image_size
        yy, xx = np.mgrid[0:s, 0:s].astype(np.float32) / max(s - 1, 1)
        img = np.zeros((s, s, 3), np.float32)
        for ch in range(3):
            gx, gy, g0 = rng.uniform(-1, 1, size=3)
            img[:, :, ch] = 0.4 * (gx * xx + gy * yy) + 0.2 * g0
        for _ in range(int(rng.integers(2, 5))):
            cx, cy = rng.uniform(0.15, 0.85, size=2)
            r = rng.uniform(0.08, 0.3)
            amp = rng.uniform(-0.6, 0.6, size=3)
            blob = np.exp(-(((xx - cx) ** 2 + (yy - cy) ** 2)
                            / (2 * r * r)))
            img += blob[:, :, None] * amp[None, None, :]
        return np.clip(img, -1.0, 1.0).astype(np.float32)


class ImageLoader:
    """Deterministic epoch-shuffled batch iterator -> [B, H, W, 3] float32.

    Same contract as CurveLoader (data/curves.py) minus padding: images
    are fixed-shape. Single prefetch thread overlaps PIL decode with
    device compute; explicit multi-host sharding replaces
    DistributedSampler.
    """

    def __init__(self, dataset, batch_size: int, shuffle: bool = False,
                 drop_last: bool = False, seed: int = 0, prefetch: int = 2,
                 process_index: int = 0, process_count: int = 1):
        self.dataset = dataset
        self.batch_size = int(batch_size)
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.seed = int(seed)
        self.prefetch = int(prefetch)
        self.process_index = int(process_index)
        self.process_count = int(process_count)
        self._epoch = 0

    def set_epoch(self, epoch: int) -> None:
        self._epoch = int(epoch)

    def _indices(self) -> np.ndarray:
        idx = np.arange(len(self.dataset))
        if self.shuffle:
            rng = np.random.default_rng((self.seed, self._epoch))
            idx = rng.permutation(idx)
        if self.process_count > 1:
            idx = shard_by_process(idx, self.process_index,
                                   self.process_count)
        return idx

    def __len__(self) -> int:
        n = len(self.dataset) // self.process_count \
            if self.process_count > 1 else len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def _batches(self):
        idx = self._indices()
        for b in range(len(self)):
            ids = idx[b * self.batch_size : (b + 1) * self.batch_size]
            yield np.stack([self.dataset[int(i)] for i in ids], axis=0)

    def __iter__(self):
        if self.prefetch <= 0:
            yield from self._batches()
            return
        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        sentinel = object()
        err: List[BaseException] = []

        def worker():
            try:
                for item in self._batches():
                    q.put(item)
            except BaseException as e:
                err.append(e)
            finally:
                q.put(sentinel)

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is sentinel:
                break
            yield item
        t.join()
        if err:
            raise err[0]
