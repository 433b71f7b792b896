#!/usr/bin/env python
"""Quick inspection of a curve .npy file (parity: scripts/read_one_npy.py).

Usage: python scripts/read_one_npy.py path/to/curve.npy
"""

import sys

import numpy as np


def main() -> None:
    path = sys.argv[1]
    arr = np.load(path, allow_pickle=True)
    if getattr(arr, "dtype", None) == object:
        d = arr.item()
        print(f"dict npy with keys: {sorted(d)}")
        for k, v in d.items():
            v = np.asarray(v)
            print(f"  {k}: shape={v.shape} dtype={v.dtype} "
                  f"range=[{v.min():.3f}, {v.max():.3f}]")
    else:
        arr = np.asarray(arr)
        print(f"array: shape={arr.shape} dtype={arr.dtype}")
        if arr.ndim == 2 and arr.shape[1] >= 3:
            d = np.linalg.norm(np.diff(arr[:, :3], axis=0), axis=1)
            print(f"  bond lengths: min={d.min():.3f} mean={d.mean():.3f} "
                  f"max={d.max():.3f}")
            if arr.shape[1] >= 6:
                ss = np.argmax(arr[:, 3:6], axis=-1)
                frac = np.bincount(ss, minlength=3) / len(ss)
                print(f"  ss fractions (H/E/C): {np.round(frac, 3)}")


if __name__ == "__main__":
    main()
