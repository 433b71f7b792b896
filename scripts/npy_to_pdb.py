#!/usr/bin/env python
"""Convert curve .npy files to CA-only PDB traces.

Parity target: scripts/npy_to_pdb.py (Biopython CA-only GLY chain,
reference :8-21) — written directly (no Biopython in this image).

Usage: python scripts/npy_to_pdb.py --in curves_dir_or_file --out out_dir
"""

from __future__ import annotations

import argparse
import os
import sys
from pathlib import Path

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pytorch_vae_tpu.serving.pdb_utils import (  # noqa: E402
    load_curve6,
    write_pdb_ca_trace,
)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--in", dest="inp", type=str, required=True)
    ap.add_argument("--out", dest="out", type=str, required=True)
    args = ap.parse_args()

    inp = Path(args.inp)
    out = Path(args.out)
    out.mkdir(parents=True, exist_ok=True)
    files = [inp] if inp.is_file() else sorted(inp.glob("*.npy"))
    for f in files:
        curve = load_curve6(str(f))
        pdb = write_pdb_ca_trace(curve[:, :3])
        dst = out / (f.stem + ".pdb")
        dst.write_text(pdb)
        print(f"{f.name} -> {dst} ({curve.shape[0]} residues)")


if __name__ == "__main__":
    main()
