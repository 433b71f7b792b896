"""PDB trace parsing, writing, rule-based SS assignment, rigid alignment.

Dependency-free numpy equivalents of the reference's serving utilities
(api/server.py:47-63, 216-410 and scripts/npy_to_pdb.py — the latter used
Biopython, absent here; PDB CA-only records are written directly).

SS assignment follows the P-SEA-style geometric criteria the reference
encodes: per-residue window angles/dihedrals/CA-distance triples checked
against helix/strand constraint tables, requiring HELIX_SIZE / STRAND_SIZE
consecutive hits.
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import numpy as np

# P-SEA-style geometric constraint tables (api/server.py:47-63)
HELIX_CONSTRAINTS = {
    "a": (89.0, 12.0),
    "d": (50.0, 20.0),
    "d2": (5.5, 0.5),
    "d3": (5.3, 0.5),
    "d4": (6.4, 0.6),
}
STRAND_CONSTRAINTS = {
    "a": (124.0, 14.0),
    "d": (-170.0, 45.0),
    "d2": (6.7, 0.6),
    "d3": (9.9, 0.9),
    "d4": (12.4, 1.1),
}
HELIX_SIZE = 5
STRAND_SIZE = 4


def _angle_deg(x, y, z):
    v1, v2 = x - y, z - y
    denom = np.maximum(
        np.linalg.norm(v1, axis=-1) * np.linalg.norm(v2, axis=-1), 1e-8)
    cosv = np.clip(np.sum(v1 * v2, axis=-1) / denom, -1.0, 1.0)
    return np.degrees(np.arccos(cosv))


def _dihedral_deg(w, x, y, z):
    b0, b1, b2 = w - x, y - x, z - y
    b1 = b1 / np.maximum(np.linalg.norm(b1, axis=-1, keepdims=True), 1e-8)
    v = b0 - np.sum(b0 * b1, axis=-1, keepdims=True) * b1
    wv = b2 - np.sum(b2 * b1, axis=-1, keepdims=True) * b1
    x_ = np.sum(v * wv, axis=-1)
    y_ = np.sum(np.cross(b1, v) * wv, axis=-1)
    return np.degrees(np.arctan2(y_, x_))


def _runs_of(cond: np.ndarray, size: int) -> np.ndarray:
    """Mark positions covered by >= size consecutive True window hits."""
    n = cond.shape[0]
    if n < size:
        return np.zeros(n, bool)
    # sliding AND via cumulative sum of ints
    c = np.concatenate([[0], np.cumsum(cond.astype(np.int32))])
    window_ok = (c[size:] - c[:-size]) == size  # [n - size + 1]
    pred = np.zeros(n, bool)
    hits = np.flatnonzero(window_ok)
    for i in hits:
        pred[i : i + size] = True
    return pred


def assign_ss_from_xyz(xyz: np.ndarray) -> np.ndarray:
    """CA trace [N, 3] -> ss_idx [N] (0 helix, 1 strand, 2 coil).

    (reference: _assign_ss_idx_from_xyz, api/server.py:274-314)
    """
    n = int(xyz.shape[0])
    if n < 5:
        return np.full(n, 2, np.int32)
    x0, x1, x2, x3, x4 = xyz[:-4], xyz[1:-3], xyz[2:-2], xyz[3:-1], xyz[4:]
    values = {
        "a": _angle_deg(x0, x1, x2),
        "d": _dihedral_deg(x0, x1, x2, x3),
        "d2": np.linalg.norm(x2 - x0, axis=-1),
        "d3": np.linalg.norm(x3 - x0, axis=-1),
        "d4": np.linalg.norm(x4 - x0, axis=-1),
    }

    def in_range(table):
        return {k: (values[k] >= c - t) & (values[k] <= c + t)
                for k, (c, t) in table.items()}

    hc = in_range(HELIX_CONSTRAINTS)
    sc = in_range(STRAND_CONSTRAINTS)
    cond_helix = (hc["d3"] & hc["d4"]) | (hc["a"] & hc["d"])
    cond_strand = (sc["d2"] & sc["d3"] & sc["d4"]) | (sc["a"] & sc["d"])

    helix_core = _runs_of(cond_helix, HELIX_SIZE)
    strand_core = _runs_of(cond_strand, STRAND_SIZE)
    is_helix = np.pad(helix_core, (1, 3))[:n]
    is_strand = np.pad(strand_core, (1, 3))[:n] & ~is_helix

    ss = np.full(n, 2, np.int32)
    ss[is_strand] = 1
    ss[is_helix] = 0
    return ss


# ---------------------------------------------------------------------
# PDB IO (CA-only traces)
# ---------------------------------------------------------------------
def parse_pdb_ca_trace(text: str) -> Dict[str, np.ndarray]:
    """Extract the CA trace from PDB text -> {xyz [N,3], residue_ids [N]}.

    (reference: _load_pdb_trace, api/server.py:316-349)
    """
    xyz: List[List[float]] = []
    res_ids: List[int] = []
    for line in text.splitlines():
        if not line.startswith(("ATOM", "HETATM")):
            continue
        name = line[12:16].strip()
        if name != "CA":
            continue
        alt = line[16].strip()
        if alt not in ("", "A"):
            continue
        xyz.append([float(line[30:38]), float(line[38:46]),
                    float(line[46:54])])
        try:
            res_ids.append(int(line[22:26]))
        except ValueError:
            res_ids.append(len(res_ids) + 1)
    return {"xyz": np.asarray(xyz, np.float32),
            "residue_ids": np.asarray(res_ids, np.int64)}


def write_pdb_ca_trace(xyz: np.ndarray, res_name: str = "GLY",
                       chain: str = "A") -> str:
    """CA-only single-chain PDB text (scripts/npy_to_pdb.py behavior,
    without the Biopython dependency)."""
    lines = []
    for i, (x, y, z) in enumerate(np.asarray(xyz, float), start=1):
        lines.append(
            f"ATOM  {i:5d}  CA  {res_name:<3s} {chain}{i:4d}    "
            f"{x:8.3f}{y:8.3f}{z:8.3f}{1.0:6.2f}{0.0:6.2f}          "
            f" C  ")
    lines.append("TER")
    lines.append("END")
    return "\n".join(lines) + "\n"


def kabsch_align_np(mobile: np.ndarray, target: np.ndarray
                    ) -> Tuple[np.ndarray, np.ndarray, float]:
    """Numpy Kabsch: returns (R, t, rmsd) with mobile @ R + t ~ target.

    (reference: server-side alignment for PDB overlays,
    api/server.py:351-410)
    """
    mobile = np.asarray(mobile, np.float64)
    target = np.asarray(target, np.float64)
    n = min(len(mobile), len(target))
    a, b = mobile[:n], target[:n]
    a_mu, b_mu = a.mean(0), b.mean(0)
    H = (a - a_mu).T @ (b - b_mu)
    U, _S, Vt = np.linalg.svd(H)
    d = np.sign(np.linalg.det(U @ Vt))
    D = np.diag([1.0, 1.0, d])
    R = U @ D @ Vt
    t = b_mu - a_mu @ R
    rmsd = float(np.sqrt(np.mean(
        np.sum((a @ R + t - b) ** 2, axis=-1))))
    return R, t, rmsd


def transform_pdb_text(text: str, R: np.ndarray, t: np.ndarray) -> str:
    """Apply a rigid transform to every ATOM/HETATM record of a PDB."""
    out = []
    for line in text.splitlines():
        if line.startswith(("ATOM", "HETATM")) and len(line) >= 54:
            xyz = np.array([float(line[30:38]), float(line[38:46]),
                            float(line[46:54])])
            nx, ny, nz = xyz @ R + t
            line = (line[:30] + f"{nx:8.3f}{ny:8.3f}{nz:8.3f}"
                    + line[54:])
        out.append(line)
    return "\n".join(out) + "\n"


def load_curve6(path: str) -> np.ndarray:
    """Load a curve file: flat [L, >=3] array or dict npy."""
    arr = np.load(path, allow_pickle=True)
    if getattr(arr, "dtype", None) == object:
        d = arr.item()
        coords = np.asarray(d["curve_coords"], np.float32)
        ss = np.asarray(d.get("ss_one_hot",
                              np.zeros_like(coords)), np.float32)
        return np.concatenate([coords, ss], axis=-1)
    return np.asarray(arr, np.float32)
