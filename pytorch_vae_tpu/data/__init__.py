"""Data layer: curve datasets/loaders, synthetic corpora, image pipeline.

Rebuilds /root/reference/dataset.py (CurveDataset/CurveDataModule/pad_collate)
host-side in pure numpy: batches are padded to static bucket shapes so every
jitted step sees one of a small, fixed set of shapes (XLA compiles once per
bucket instead of once per batch max-length).
"""

from .curves import (  # noqa: F401
    CurveDataset,
    CurveLoader,
    bucket_for,
    default_buckets,
    load_curve_npy,
    pad_batch,
    shard_by_process,
)
from .images import ImageDataset, ImageLoader, SyntheticImages  # noqa: F401
from .synthetic import make_synthetic_curve_dir  # noqa: F401
