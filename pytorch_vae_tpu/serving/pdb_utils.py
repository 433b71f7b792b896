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


def parse_pdb_atoms(text: str) -> Dict[str, np.ndarray]:
    """Full-atom PDB parse -> atom table + inferred covalent bonds.

    The reference web UI hands raw PDB text to 3Dmol.js, which does this
    parse client-side (api/web/index.html:861,1085 cartoon/stick styles).
    This zero-egress build parses server-side and ships a compact atom
    table the canvas renderer can draw as sticks.

    Returns dict of aligned arrays:
      xyz [N,3] f32, names [N] str, elements [N] str, res_idx [N] i64
      (0-based dense residue index), res_ids [N] i64 (PDB numbering),
      bfactor [N] f32 (pLDDT column in folded outputs),
      bonds [M,2] i64 (covalent pairs, distance-inferred).
    """
    xyz, names, elements, res_ids, bfac = [], [], [], [], []
    for line in text.splitlines():
        if not line.startswith(("ATOM", "HETATM")):
            continue
        alt = line[16].strip()
        if alt not in ("", "A"):
            continue
        name = line[12:16].strip()
        elem = line[76:78].strip() if len(line) >= 78 else ""
        if not elem:
            # derive from the atom name (first alpha char, H-prefixed
            # digits skipped) — older writers leave cols 77-78 blank
            stripped = name.lstrip("0123456789")
            elem = stripped[:1].upper() if stripped else "C"
        if elem == "H":
            continue  # heavy atoms only: keeps payloads small
        names.append(name)
        elements.append(elem)
        xyz.append([float(line[30:38]), float(line[38:46]),
                    float(line[46:54])])
        try:
            res_ids.append(int(line[22:26]))
        except ValueError:
            res_ids.append(res_ids[-1] + 1 if res_ids else 1)
        try:
            bfac.append(float(line[60:66]))
        except (ValueError, IndexError):
            bfac.append(0.0)
    xyz_a = np.asarray(xyz, np.float32).reshape(-1, 3)
    res_ids_a = np.asarray(res_ids, np.int64)
    # dense 0-based residue index (order of first appearance)
    res_idx = np.zeros(len(res_ids_a), np.int64)
    if len(res_ids_a):
        res_idx[1:] = np.cumsum(res_ids_a[1:] != res_ids_a[:-1])
    return {"xyz": xyz_a, "names": np.asarray(names),
            "elements": np.asarray(elements), "res_idx": res_idx,
            "res_ids": res_ids_a, "bfactor": np.asarray(bfac, np.float32),
            "bonds": infer_bonds(xyz_a, np.asarray(elements), res_idx)}


def infer_bonds(xyz: np.ndarray, elements: np.ndarray,
                res_idx: np.ndarray) -> np.ndarray:
    """Distance-based covalent bond inference -> [M,2] atom index pairs.

    Two heavy atoms bond if closer than the sum of covalent radii + 0.45 Å
    slack, and they sit in the same or adjacent residues (peptide C-N).
    Vectorized per residue-pair window — O(N·w), fine for serving-sized
    proteins.
    """
    n = len(xyz)
    if n < 2:
        return np.zeros((0, 2), np.int64)
    radii = {"C": 0.77, "N": 0.70, "O": 0.66, "S": 1.05, "P": 1.10,
             "SE": 1.20}
    r = np.asarray([radii.get(str(e).upper(), 0.77) for e in elements],
                   np.float32)
    pairs = []
    # candidate window: atoms of residue i vs residues i and i+1
    order = np.argsort(res_idx, kind="stable")
    xyz_s, r_s, res_s = xyz[order], r[order], res_idx[order]
    starts = np.flatnonzero(np.r_[True, res_s[1:] != res_s[:-1]])
    bounds = np.r_[starts, len(res_s)]
    for ri in range(len(starts)):
        a0, a1 = bounds[ri], bounds[ri + 1]
        b1 = bounds[ri + 2] if ri + 2 < len(bounds) else a1
        # only allow cross-residue bonds between ADJACENT residue indices
        if ri + 1 < len(starts) and res_s[a1] != res_s[a0] + 1:
            b1 = a1
        blk = xyz_s[a0:b1]
        d = np.linalg.norm(blk[None, :] - xyz_s[a0:a1, None], axis=-1)
        cut = (r_s[a0:a1, None] + r_s[None, a0:b1]) + 0.45
        ii, jj = np.nonzero((d < cut) & (d > 0.4))
        for i, j in zip(ii, jj):
            gi, gj = order[a0 + i], order[a0 + j]
            if gi < gj:
                pairs.append((gi, gj))
    if not pairs:
        return np.zeros((0, 2), np.int64)
    return np.unique(np.asarray(pairs, np.int64), axis=0)


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


def write_pdb_backbone(ca_xyz: np.ndarray, plddt=None,
                       res_name: str = "GLY", chain: str = "A") -> str:
    """Full-backbone (N, CA, C, O) PDB text from a CA trace.

    Idealized peptide-plane placement: per CA-CA segment a consistent
    (parallel-transported) in-plane perpendicular carries the N/C/O
    offsets, reproducing bonded distances closely enough that
    distance-based bond inference recovers exactly the backbone graph
    (N-CA, CA-C, C-O, C-N'). Folded-structure mocks use this so the
    full-atom serving path is exercised the way real OmegaFold outputs
    would (reference downstream writes real full-atom PDBs). `plddt`
    (scalar or per-residue) fills the b-factor column like AlphaFold /
    OmegaFold outputs do.
    """
    ca = np.asarray(ca_xyz, np.float64).reshape(-1, 3)
    n = len(ca)
    if n < 2:
        return write_pdb_ca_trace(ca, res_name, chain)
    seg = ca[1:] - ca[:-1]                              # [n-1, 3]
    u = seg / np.maximum(np.linalg.norm(seg, axis=-1,
                                        keepdims=True), 1e-8)
    # parallel-transported perpendicular per segment
    w = np.zeros_like(u)
    ref = np.array([1.0, 0.0, 0.0]) if abs(u[0][0]) < 0.9 \
        else np.array([0.0, 1.0, 0.0])
    prev = np.cross(u[0], ref)
    for i in range(n - 1):
        prev = prev - u[i] * (prev @ u[i])
        nrm = np.linalg.norm(prev)
        prev = (np.cross(u[i], ref) if nrm < 1e-6 else prev / nrm)
        w[i] = prev
    # per-residue atom positions (peptide plane of the incoming segment
    # places N, of the outgoing segment places C/O)
    u_in, w_in = u[np.maximum(np.arange(n) - 1, 0)], \
        w[np.maximum(np.arange(n) - 1, 0)]
    u_out, w_out = u[np.minimum(np.arange(n), n - 2)], \
        w[np.minimum(np.arange(n), n - 2)]
    # exact ideal trans-peptide in-plane offsets (computed from bond
    # lengths CA-C 1.52 / C-N 1.33 / N-CA 1.46 and angles CA-C-N 116.2 /
    # C-N-CA 121.7 / CA-C-O 121 deg, omega = 180):
    N = ca - 1.4101 * u_in - 0.3786 * w_in
    C = ca + 1.4235 * u_out + 0.5330 * w_out
    O = ca + 1.6470 * u_out + 1.7426 * w_out
    if plddt is None:
        b = np.zeros(n)
    else:
        b = np.broadcast_to(np.asarray(plddt, np.float64), (n,))
    lines, serial = [], 1
    for i in range(n):
        for aname, pos, elem in (("N", N[i], "N"), ("CA", ca[i], "C"),
                                 ("C", C[i], "C"), ("O", O[i], "O")):
            lines.append(
                f"ATOM  {serial:5d}  {aname:<3s} {res_name:<3s} "
                f"{chain}{i + 1:4d}    "
                f"{pos[0]:8.3f}{pos[1]:8.3f}{pos[2]:8.3f}"
                f"{1.0:6.2f}{b[i]:6.2f}           {elem:<2s}")
            serial += 1
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
