#!/usr/bin/env python
"""Curve format converters + shape checker.

Consolidates the playground utilities convert_curve_to_dataset_npy.py and
check_npy_shape.py: convert flat [L, 6] / [L, 4] / plain-xyz arrays (or a
PDB CA trace) into the dataset's dict-npy format, inferring SS from
geometry when absent, and report shapes/stats for any curve file.

Usage:
  python scripts/analysis/convert_curve_format.py --in x.npy --out d.npy
  python scripts/analysis/convert_curve_format.py --in trace.pdb --out d.npy
  python scripts/analysis/convert_curve_format.py --check some.npy
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))

from pytorch_vae_tpu.serving import pdb_utils  # noqa: E402


def to_dataset_dict(path: str) -> dict:
    if path.endswith(".pdb"):
        xyz = pdb_utils.parse_pdb_ca_trace(open(path).read())["xyz"]
        ss_idx = pdb_utils.assign_ss_from_xyz(xyz)
        onehot = np.eye(3, dtype=np.float32)[ss_idx]
        return {"curve_coords": xyz.astype(np.float32),
                "ss_one_hot": onehot}
    arr = np.load(path, allow_pickle=True)
    if getattr(arr, "dtype", None) == object:
        return arr.item()
    arr = np.asarray(arr, np.float32)
    xyz = arr[:, :3]
    if arr.shape[1] >= 6:
        onehot = arr[:, 3:6]
    elif arr.shape[1] == 4:
        onehot = np.eye(3, dtype=np.float32)[arr[:, 3].astype(int)]
    else:
        onehot = np.eye(3, dtype=np.float32)[
            pdb_utils.assign_ss_from_xyz(xyz)]
    return {"curve_coords": xyz, "ss_one_hot": onehot}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--in", dest="inp", type=str)
    ap.add_argument("--out", dest="out", type=str)
    ap.add_argument("--check", type=str)
    args = ap.parse_args()

    if args.check:
        d = to_dataset_dict(args.check)
        xyz = d["curve_coords"]
        bonds = np.linalg.norm(np.diff(xyz, axis=0), axis=1)
        ss = np.argmax(d["ss_one_hot"], axis=-1)
        frac = np.bincount(ss, minlength=3) / max(len(ss), 1)
        print(f"L={len(xyz)} bond mean={bonds.mean():.2f} "
              f"[{bonds.min():.2f}, {bonds.max():.2f}] "
              f"ss H/E/C={np.round(frac, 3)}")
        return
    if not (args.inp and args.out):
        ap.error("--in/--out required unless --check")
    d = to_dataset_dict(args.inp)
    np.save(args.out, d, allow_pickle=True)
    print(f"{args.inp} -> {args.out} "
          f"(L={len(d['curve_coords'])}, dict npy)")


if __name__ == "__main__":
    main()
