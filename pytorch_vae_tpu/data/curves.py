"""Protein-curve dataset + static-shape batch loader.

Rebuilds /root/reference/dataset.py:55-139 (CurveDataset: per-curve
centering, NaN sanitize, [L, 6] = centered xyz ++ one-hot SS) and
:30-49 (pad_collate: zero pad + True=valid bool mask).

TPU-first deviations (documented):
- pad_collate pads to the *batch max length* (dynamic shape per batch);
  here `pad_batch` pads to a fixed `pad_to` or to the smallest of a
  static bucket ladder, so XLA compiles one executable per bucket
  instead of one per distinct batch max (reference relies on CUDA's
  shape-agnostic kernels; XLA is trace-once).
- the torch DataLoader worker pool is replaced by an optional single
  prefetch thread: decode cost is tiny (np.load of small dicts) and the
  in-memory cache makes epochs after the first allocation-free.
- multi-host sharding is explicit (`shard_by_process`, `process_index`/
  `process_count` args) instead of torch DistributedSampler.
"""

from __future__ import annotations

import os
import queue
import threading
from typing import List, Optional, Sequence, Tuple

import numpy as np

__all__ = [
    "load_curve_npy",
    "CurveDataset",
    "CurveLoader",
    "pad_batch",
    "default_buckets",
    "bucket_for",
    "shard_by_process",
]


def load_curve_npy(path: str) -> Tuple[np.ndarray, np.ndarray]:
    """Read one curve file -> (coords [L,3] f32 raw Å, ss_one_hot [L,3] f32).

    Accepts the reference's on-disk formats (dataset.py:105-112): a pickled
    0-d dict .npy, an .npz, or a plain [L, 6] / [L, 4] array (xyz ++ one-hot
    or xyz ++ ss-class-index, the decode scripts' output shapes).
    """
    data = np.load(path, allow_pickle=True)
    if isinstance(data, np.lib.npyio.NpzFile):
        data = {k: data[k] for k in data.files}
    elif isinstance(data, np.ndarray) and data.dtype == object:
        data = data.item()

    if isinstance(data, dict):
        try:
            coords = np.asarray(data["curve_coords"], np.float32)
            ss = np.asarray(data["ss_one_hot"], np.float32)
        except KeyError as e:
            raise ValueError(
                f"Curve dict at {path} is missing key {e.args[0]!r}; "
                f"expected 'curve_coords'/'ss_one_hot', found "
                f"{sorted(data)[:8]}") from None
    else:
        arr = np.asarray(data, np.float32)
        if arr.ndim != 2 or arr.shape[1] not in (4, 6):
            raise ValueError(f"Bad curve array shape at {path}: {arr.shape}")
        coords = arr[:, :3]
        if arr.shape[1] == 6:
            ss = arr[:, 3:]
        else:  # class-index column -> one-hot
            idx = np.clip(arr[:, 3].astype(np.int64), 0, 2)
            ss = np.eye(3, dtype=np.float32)[idx]

    if coords.ndim != 2 or coords.shape[1] != 3:
        raise ValueError(f"Bad coords shape at {path}: {coords.shape}")
    if ss.shape != coords.shape:
        raise ValueError(f"Bad ss_one_hot shape at {path}: {ss.shape}")
    coords = np.nan_to_num(coords, nan=0.0, posinf=0.0, neginf=0.0)
    ss = np.nan_to_num(ss, nan=0.0, posinf=0.0, neginf=0.0)
    return coords, ss


class CurveDataset:
    """Indexable curve corpus; __getitem__ -> [L, 6] float32.

    Mirrors reference dataset.py:65-139: list-file driven, per-curve xyz
    centering (translation invariance, Å scale kept), one-hot SS appended,
    non-finite values zeroed. Adds `max_seq_len` head-truncation and an
    in-memory cache (the corpus is small relative to host RAM and epochs
    re-read every file; the reference re-decodes from disk each epoch).
    """

    def __init__(
        self,
        npy_dir: str,
        list_path: Optional[str] = None,
        list_file: Optional[str] = None,  # reference-compat alias
        train: bool = True,
        max_seq_len: Optional[int] = None,
        cache: bool = True,
        verbose: bool = True,
    ):
        self.npy_dir = npy_dir
        self.train = train
        self.max_seq_len = max_seq_len
        list_txt = list_path or list_file
        if list_txt is None:
            raise ValueError(
                "CurveDataset requires a valid list_path or list_file.")
        with open(list_txt) as f:
            rels = [ln.strip() for ln in f if ln.strip()]
        self.file_paths: List[str] = [os.path.join(npy_dir, p) for p in rels]
        if not self.file_paths:
            raise FileNotFoundError(
                f"No files found using list file: {list_txt}")
        self._cache: Optional[List[Optional[np.ndarray]]] = (
            [None] * len(self.file_paths) if cache else None)
        if verbose:
            split = "Train" if train else "Val"
            print(f"[Dataset] {split} set: {len(self.file_paths)} curves "
                  f"from {npy_dir}")

    def __len__(self) -> int:
        return len(self.file_paths)

    def __getitem__(self, idx: int) -> np.ndarray:
        if self._cache is not None and self._cache[idx] is not None:
            return self._cache[idx]
        coords, ss = load_curve_npy(self.file_paths[idx])
        coords = coords - coords.mean(axis=0, keepdims=True)
        sample = np.concatenate([coords, ss], axis=-1).astype(np.float32)
        if self.max_seq_len is not None and sample.shape[0] > self.max_seq_len:
            sample = sample[: self.max_seq_len]
        if self._cache is not None:
            self._cache[idx] = sample
        return sample


def default_buckets(max_len: int, step: int = 32) -> Tuple[int, ...]:
    """Static padding ladder: multiples of `step`, capped at `max_len`.

    default_buckets(350, 32) -> (32, 64, ..., 320, 350): the final bucket
    is exactly max_len so the longest curves never over-pad.
    """
    buckets = [b for b in range(step, max_len + 1, step)]
    if not buckets or buckets[-1] != max_len:
        buckets.append(max_len)
    return tuple(buckets)


def bucket_for(length: int, buckets: Sequence[int]) -> int:
    """Smallest bucket >= length."""
    for b in buckets:
        if length <= b:
            return int(b)
    raise ValueError(f"length {length} exceeds largest bucket {buckets[-1]}")


def pad_batch(
    samples: Sequence[np.ndarray],
    buckets: Optional[Sequence[int]] = None,
    pad_to: Optional[int] = None,
) -> Tuple[np.ndarray, np.ndarray]:
    """Zero-pad [L_i, D] samples to one static length; True=valid mask.

    Reference pad_collate (dataset.py:30-49) pads to the batch max; a
    static target (`pad_to`, else the smallest covering bucket, else the
    batch max) keeps jit shapes from churning. Raises ValueError when a
    sample exceeds an explicit `pad_to`.
    """
    if len(samples) == 0:
        raise RuntimeError("Empty batch given to pad_batch.")
    max_len = max(int(s.shape[0]) for s in samples)
    if pad_to is not None:
        if max_len > pad_to:
            raise ValueError(
                f"sample length {max_len} exceeds pad_to={pad_to}")
        target = int(pad_to)
    elif buckets is not None:
        target = bucket_for(max_len, buckets)
    else:
        target = max_len
    D = int(samples[0].shape[1])
    x = np.zeros((len(samples), target, D), np.float32)
    mask = np.zeros((len(samples), target), bool)
    for i, s in enumerate(samples):
        L = int(s.shape[0])
        x[i, :L] = s
        mask[i, :L] = True
    return x, mask


def shard_by_process(
    indices: np.ndarray, process_index: int, process_count: int
) -> np.ndarray:
    """Equal-size disjoint per-host shard; remainder dropped.

    Replaces torch DistributedSampler: every host must deliver the same
    number of identically-shaped batches or collectives deadlock, so the
    tail `len % world` samples are dropped (same as drop_last across the
    world).
    """
    indices = np.asarray(indices)
    n = (len(indices) // process_count) * process_count
    return indices[:n][process_index::process_count]


class CurveLoader:
    """Deterministic epoch-shuffled batch iterator -> (x, mask) numpy pairs.

    Replaces the torch DataLoader+pad_collate stack (dataset.py:182-202):
    per-epoch shuffle keyed on (seed, epoch) so any epoch replays bit-
    identically (resume correctness), optional single prefetch thread
    overlapping host decode/pad with device compute, and explicit
    multi-host sharding.
    """

    def __init__(
        self,
        dataset: CurveDataset,
        batch_size: int,
        shuffle: bool = False,
        drop_last: bool = False,
        seed: int = 0,
        prefetch: int = 2,
        buckets: Optional[Sequence[int]] = None,
        pad_to: Optional[int] = None,
        process_index: int = 0,
        process_count: int = 1,
    ):
        self.dataset = dataset
        self.batch_size = int(batch_size)
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.seed = int(seed)
        self.prefetch = int(prefetch)
        self.buckets = tuple(buckets) if buckets is not None else None
        self.pad_to = pad_to
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
        nb = len(self)
        for b in range(nb):
            ids = idx[b * self.batch_size : (b + 1) * self.batch_size]
            samples = [self.dataset[int(i)] for i in ids]
            yield pad_batch(samples, buckets=self.buckets, pad_to=self.pad_to)

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
            except BaseException as e:  # surfaced on the consumer side
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
