#!/usr/bin/env python
"""Render 3D SS-colored curve plots to PNG.

Parity target: scripts/visualize_inference_curves.py and
scripts/my_curve_visualization.py — supports dict npys, flat [L, 6], and
[L, 4] (xyz + ss index) formats (reference visualize_inference_curves.py:
4-12), coloring helix red / strand gold / coil gray.

Usage:
  python scripts/visualize_curves.py --in results/.../filtered_npy \
      --out results/plots [--limit 16]
"""

from __future__ import annotations

import argparse
import os
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SS_COLORS = {0: "#e5654f", 1: "#f2c14e", 2: "#8a97a8"}


def load_any_curve(path: str):
    """-> (xyz [L,3], ss_idx [L]) from dict / [L,6] / [L,4] / [L,3]."""
    arr = np.load(path, allow_pickle=True)
    if getattr(arr, "dtype", None) == object:
        d = arr.item()
        xyz = np.asarray(d["curve_coords"], np.float32)
        ss = np.argmax(np.asarray(d["ss_one_hot"]), axis=-1) \
            if "ss_one_hot" in d else np.full(len(xyz), 2)
        return xyz, ss
    arr = np.asarray(arr, np.float32)
    if arr.ndim != 2:
        raise ValueError(f"bad curve array shape {arr.shape}")
    if arr.shape[1] >= 6:
        return arr[:, :3], np.argmax(arr[:, 3:6], axis=-1)
    if arr.shape[1] == 4:
        return arr[:, :3], arr[:, 3].astype(int)
    return arr[:, :3], np.full(arr.shape[0], 2)


def render(xyz, ss, out_path: str, title: str = "") -> None:
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig = plt.figure(figsize=(6, 6))
    ax = fig.add_subplot(111, projection="3d")
    for i in range(1, len(xyz)):
        ax.plot(xyz[i - 1 : i + 1, 0], xyz[i - 1 : i + 1, 1],
                xyz[i - 1 : i + 1, 2],
                color=SS_COLORS.get(int(ss[i]), "#8a97a8"), linewidth=2)
    ax.set_title(title or Path(out_path).stem)
    ax.set_box_aspect((1, 1, 1))
    fig.tight_layout()
    fig.savefig(out_path, dpi=110)
    plt.close(fig)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--in", dest="inp", type=str, required=True)
    ap.add_argument("--out", dest="out", type=str, required=True)
    ap.add_argument("--limit", type=int, default=16)
    args = ap.parse_args()

    inp = Path(args.inp)
    out = Path(args.out)
    out.mkdir(parents=True, exist_ok=True)
    files = [inp] if inp.is_file() else sorted(inp.glob("*.npy"))
    for f in files[: args.limit]:
        xyz, ss = load_any_curve(str(f))
        dst = out / (f.stem + ".png")
        render(xyz, ss, str(dst))
        print(f"{f.name} -> {dst}")


if __name__ == "__main__":
    main()
