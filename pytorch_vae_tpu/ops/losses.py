"""The curve VQ-VAE composite loss family, as one jit-fused pure function.

Reproduces every term of the reference's `VQVAE.loss_function`
(models/vq_vae.py:1097-1388) with TPU-friendly structure:

  - all weights arrive as *dynamic* scalars (one compile covers the whole
    epoch schedule),
  - expensive optional terms (local PDM, window-Kabsch, Frenet, long-range
    PDM) are gated *statically* by whether their weight is ever nonzero in
    the run's schedule (`LossStatics`), mirroring the reference's
    `if weight > 0` guards without data-dependent control flow,
  - Python loops over window offsets become static unrolls / precomputed
    index gathers; XLA folds and fuses them,
  - Kabsch SVD is branchless (ops/kabsch.py) and gradient-stopped.

The label-smoothing cross-entropy uses the unified KL form
`sum_c td_c log td_c - sum_c td_c logp_c`, which reduces *exactly* to plain
CE when eps == 0, so one code path covers both reference branches
(models/vq_vae.py:920-931, 1185-1200).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from . import geometry
from .kabsch import apply_rt, kabsch_rt
from .masking import masked_mean, mse_per_sample, pair_mask, safe_norm, unit


@dataclasses.dataclass(frozen=True)
class LossStatics:
    """Compile-time structure of the loss (window sizes, enabled terms)."""

    use_vq: bool = True
    seq_len: int = 350  # static padded length of the batch
    # term enablement (True if the weight is ever nonzero during the run)
    ss_tv: bool = False
    usage_entropy: bool = False
    xyz_tv: bool = True
    pdm: bool = False
    win_kabsch: bool = False
    kappa: bool = False
    tau: bool = False
    lr_pdm: bool = False
    repulsion: bool = False
    # mixup-geometry aux loss (experiment._loss_and_aux): decode convex
    # combinations of batch latents — the region AE-OT generation
    # actually samples — and hinge their bonds/collisions. GT-free.
    mix_geom: bool = False
    # long-bond hinge margin of the mix_geom term only: interpolated
    # latents can decode to stretched curves, and the AE-OT filter hard
    # rejects bonds > 7.5 A (pipelines/filtering.py bond_max_allowed);
    # 7.0 leaves a trained safety margin below the threshold
    mix_bond_max_margin: float = 7.0
    # mix partner selection: False = random in-batch permutation (covers
    # the whole latent hull), True = nearest in-batch latent (matches
    # AE-OT generation, which convex-combines OT-NEIGHBOR cells only —
    # pipelines/aeot.py::sample_extended pairs the top-1 cell with
    # angularly-close runners-up)
    mix_nearest: bool = False
    # weight of the per-curve WORST bond violation inside the mix term:
    # the filter rejects a curve on its single worst bond (min/max over
    # the curve, pipelines/filtering.py:316-320), so a mean-only hinge
    # moves the tails slowly (measured: mix_decode_stats showed 99.7%
    # of mix bonds legal yet ~10% of curves rejected on outliers).
    # 0.0 = mean-only (the ft4 recipe).
    mix_max_weight: float = 0.0
    # weight of the sampled segment-segment clearance hinge inside the
    # mix term (segment_repulsion_loss; 0.0 = off). The point-repulsion
    # hinge cannot see segments crossing BETWEEN points — the dominant
    # residual rejector at full bank diversity (r3_ft6_bankx: 76 of 157
    # rejects are segment_collision). Margin/exclusion mirror the
    # filter's segment_clash_count (min_seg_dist 1.3, exclude 1) with a
    # trained safety margin above the threshold.
    mix_seg_weight: float = 0.0
    mix_seg_min_dist: float = 1.8
    mix_seg_exclude: int = 1
    mix_seg_samples: int = 3
    # per-curve WORST-pair weights inside the mix repulsion terms (the
    # mix_max_weight pattern applied to collisions): the filter rejects
    # on the single worst pair, and the mean over ~L^2/2 pairs dilutes
    # real clashes to ~1e-5 (measured, r3_ft7). 0.0 = mean-only.
    mix_rep_max_weight: float = 0.0
    mix_seg_max_weight: float = 0.0
    # margin (Angstrom) of the min-bond hinge (extension; see bond term)
    bond_hinge_margin: float = 2.5
    # per-curve WORST-bond band hinge on reconstructions (extension,
    # stage-2 sharpening): the stage-2 quality metric is the fraction of
    # quantized-decode bonds inside [2.2, 5.5] A (bond_band_stats.py),
    # and the round-4 calibration probe showed the residual error is
    # LOCAL corner-cutting — a tail of per-curve worst short bonds the
    # mean bond terms dilute (the same mean-dilution mechanism the ft8
    # worst-pair A/B fixed for stage-1 collisions: keep 90.9 -> 94.0%).
    # Hinges each bond's violation outside [bond_band_lo, bond_band_hi]
    # (trained safety margins inside the measured band), takes the MAX
    # over the curve, squares, and means over the batch. Enabled when
    # bond_band_max_weight is ever nonzero in the schedule.
    bond_band: bool = False
    bond_band_lo: float = 2.5
    bond_band_hi: float = 5.2
    # pairwise-repulsion hinge (extension; see pairwise_repulsion_loss):
    # defaults mirror the AE-OT filter's self-collision check
    repulsion_min_dist: float = 2.0
    repulsion_exclude: int = 2
    # static window geometry (experiment.py:317-318 rounds these to ints)
    pdm_window: int = 8
    win_kabsch_size: int = 16
    win_kabsch_stride: int = 8
    lr_min_sep: int = 24
    lr_stride: int = 8
    lr_max_offsets: int = 8


def smoothed_cross_entropy(
    logits: jnp.ndarray,
    labels: jnp.ndarray,
    mask: Optional[jnp.ndarray],
    eps: jnp.ndarray,
) -> jnp.ndarray:
    """Masked CE with label smoothing; exact CE at eps == 0.

    logits: [B, L, C]; labels: [B, L] int; mask: [B, L] bool; eps scalar.
    (reference: models/vq_vae.py:920-931 and the plain-CE branch :1188-1200)
    """
    C = logits.shape[-1]
    logp = jax.nn.log_softmax(logits, axis=-1)
    off = eps / (C - 1)
    on = 1.0 - eps
    onehot = jax.nn.one_hot(labels, C, dtype=logits.dtype)
    true_dist = onehot * on + (1.0 - onehot) * off
    # sum_c td log td (entropy term; 0 when eps == 0 via xlogy)
    self_term = jnp.sum(jax.scipy.special.xlogy(true_dist, true_dist), axis=-1)
    ce_term = -jnp.sum(true_dist * logp, axis=-1)
    kl = self_term + ce_term  # [B, L]
    return masked_mean(kl, mask)


def pairwise_pdm_loss(
    a_xyz: jnp.ndarray,
    b_xyz: jnp.ndarray,
    mask: Optional[jnp.ndarray],
    window: int,
) -> jnp.ndarray:
    """Local pairwise-distance-matrix loss over offsets 1..window-1.

    Per-offset masked mean, then mean over offsets — matches the reference's
    accumulation order (models/vq_vae.py:971-994).
    """
    L = a_xyz.shape[1]
    if L < 2 or window <= 1:
        return jnp.asarray(0.0, a_xyz.dtype)
    terms = []
    for d in range(1, window):
        da = safe_norm(a_xyz[:, :-d, :] - a_xyz[:, d:, :])
        db = safe_norm(b_xyz[:, :-d, :] - b_xyz[:, d:, :])
        m = (mask[:, :-d] & mask[:, d:]) if mask is not None else None
        terms.append(masked_mean((da - db) ** 2, m))
    return jnp.mean(jnp.stack(terms))


def window_kabsch_loss(
    a_xyz: jnp.ndarray,
    b_xyz: jnp.ndarray,
    mask: Optional[jnp.ndarray],
    win: int,
    stride: int,
) -> jnp.ndarray:
    """Mean over windows of the per-window aligned MSE (selected samples only).

    Windows are gathered with static slices into one [B*W, win, 3] batch so a
    single batched Kabsch covers all of them. Selection semantics follow the
    reference (models/vq_vae.py:996-1038): a sample contributes to a window
    if it has >= 3 valid points there and the SVD was finite; a window
    contributes if any sample does.
    """
    B, L, _ = a_xyz.shape
    if L < 3 or win < 3:
        return jnp.asarray(0.0, a_xyz.dtype)
    starts = list(range(0, L - win + 1, max(1, stride)))
    if not starts:
        return jnp.asarray(0.0, a_xyz.dtype)
    W = len(starts)

    def stack_windows(x):  # [B, L, 3] -> [B*W, win, 3]
        ws = [x[:, s : s + win, :] for s in starts]
        return jnp.concatenate(ws, axis=0)

    a_w = stack_windows(a_xyz)
    b_w = stack_windows(b_xyz)
    if mask is not None:
        m_w = jnp.concatenate([mask[:, s : s + win] for s in starts], axis=0)
        enough = jnp.sum(m_w, axis=1) >= 3
    else:
        m_w = None
        enough = jnp.ones((B * W,), dtype=bool)

    R, t, ok = kabsch_rt(a_w, b_w, m_w)
    a_aln = apply_rt(a_w, R, t)
    if m_w is None:
        mse = jnp.mean((a_aln - b_w) ** 2, axis=(1, 2))
    else:
        mm = m_w.astype(a_aln.dtype)[..., None]
        den = jnp.clip(jnp.sum(mm, axis=(1, 2)), 1.0, None)
        mse = jnp.sum((a_aln - b_w) ** 2 * mm, axis=(1, 2)) / den

    sel = (enough & ok).reshape(W, B)
    mse = mse.reshape(W, B)
    sel32 = sel.astype(mse.dtype)
    per_win = jnp.sum(mse * sel32, axis=1) / jnp.clip(
        jnp.sum(sel32, axis=1), 1.0, None
    )
    win_has = jnp.any(sel, axis=1).astype(mse.dtype)
    return jnp.sum(per_win * win_has) / jnp.clip(jnp.sum(win_has), 1.0, None)


def frenet_regularizers(
    a_xyz: jnp.ndarray, mask: Optional[jnp.ndarray]
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Curvature (second-difference energy) and torsion-variation regularizers.

    (reference: _frenet_regularizers, models/vq_vae.py:1040-1068)
    """
    L = a_xyz.shape[1]
    zero = jnp.asarray(0.0, a_xyz.dtype)
    kappa_reg = zero
    tau_reg = zero
    if L >= 3:
        kappa = geometry.second_difference_sq(a_xyz)
        kappa_reg = masked_mean(kappa, pair_mask(mask, 3))
    if L >= 5:
        dih = geometry.dihedral_cos_sin(a_xyz)  # [B, L-3, 2]
        tau_var = jnp.sum((dih[:, 1:, :] - dih[:, :-1, :]) ** 2, axis=-1)
        tau_reg = masked_mean(tau_var, pair_mask(mask, 5))
    return kappa_reg, tau_reg


def long_range_pdm_loss(
    a_xyz: jnp.ndarray,
    b_xyz: jnp.ndarray,
    mask: Optional[jnp.ndarray],
    min_sep: int,
    stride: int,
    max_offsets: int,
) -> jnp.ndarray:
    """Long-range pairwise distance consistency over a static (i, j) pair set.

    The reference's nested Python loops (models/vq_vae.py:1070-1095) become a
    precomputed index table and one gather; per-pair masked means are averaged
    to match its accumulation order exactly.
    """
    L = a_xyz.shape[1]
    if L < min_sep + 1:
        return jnp.asarray(0.0, a_xyz.dtype)
    ii, jj = [], []
    for off in range(max(1, max_offsets)):
        for i in range(0, L, max(1, stride)):
            j = i + min_sep + off
            if j >= L:
                break
            ii.append(i)
            jj.append(j)
    if not ii:
        return jnp.asarray(0.0, a_xyz.dtype)
    iidx = np.asarray(ii, dtype=np.int32)
    jidx = np.asarray(jj, dtype=np.int32)

    da = safe_norm(a_xyz[:, jidx, :] - a_xyz[:, iidx, :])
    db = safe_norm(b_xyz[:, jidx, :] - b_xyz[:, iidx, :])
    sq = (da - db) ** 2  # [B, P]
    if mask is not None:
        m = (mask[:, jidx] & mask[:, iidx]).astype(sq.dtype)
        per_pair = jnp.sum(m * sq, axis=0) / jnp.clip(jnp.sum(m, axis=0),
                                                      1.0, None)
    else:
        per_pair = jnp.mean(sq, axis=0)
    return jnp.mean(per_pair)


def pairwise_repulsion_loss(
    xyz: jnp.ndarray,
    mask: Optional[jnp.ndarray],
    min_dist: float,
    neighbor_exclude: int,
    worst_weight: float = 0.0,
) -> jnp.ndarray:
    """Squared hinge on all non-neighbor pairs closer than `min_dist`.

    Framework extension beyond the reference loss set (documented
    deviation, like the min-bond hinge): the AE-OT filter hard-rejects
    point self-collisions and segment clashes
    (pipelines/filtering.py, reference run_aeot_end2end.py:271-613),
    but no reference loss term penalizes them at training time — after
    the bond terms converge, collisions dominate the residual rejects
    (results/aeot_runs/r3_ft2: 61 of 137). This is the training-time
    counterpart of the filter's `min_pairwise_dist`/`neighbor_exclude`
    check: mean over valid pairs (|i-j| > exclude, both ends unmasked)
    of relu(min_dist - d_ij)^2.

    `worst_weight` adds that times the batch-mean of each curve's WORST
    pair violation. The filter rejects a curve on its single worst pair,
    which the mean over ~L^2/2 pairs dilutes to noise (measured on
    r3_ft7 training: Mix_Repulsion ~3e-5 while 1.5% of generated curves
    still rejected on collisions) — the same dilution mix_max_weight
    fixes for the bond hinge.

    Memory: materializes the [B, L, L, 3] difference tensor (~190 MB
    f32 transient at flagship B=128, L=350) — acceptable because the
    term is statically compiled out unless its weight is ever nonzero.
    """
    L = xyz.shape[1]
    diff = xyz[:, :, None, :] - xyz[:, None, :, :]
    d = safe_norm(diff)  # [B, L, L]; finite grad at coincident points
    hinge = jnp.maximum(jnp.asarray(min_dist, d.dtype) - d, 0.0) ** 2
    idx = jnp.arange(L)
    sep_ok = jnp.abs(idx[:, None] - idx[None, :]) > neighbor_exclude
    if mask is not None:
        valid = mask[:, :, None] & mask[:, None, :] & sep_ok[None]
    else:
        valid = jnp.broadcast_to(sep_ok[None], hinge.shape)
    out = masked_mean(hinge, valid)
    if worst_weight:
        hv = jnp.where(valid, hinge, 0.0)
        out = out + worst_weight * jnp.mean(jnp.max(hv, axis=(1, 2)))
    return out


def segment_repulsion_loss(
    xyz: jnp.ndarray,
    mask: Optional[jnp.ndarray],
    min_dist: float,
    exclude_segments: int,
    num_samples: int = 3,
    worst_weight: float = 0.0,
) -> jnp.ndarray:
    """Squared hinge on sampled segment-segment clearance.

    Framework extension (documented deviation, like the point-repulsion
    hinge): the training-time counterpart of the AE-OT filter's segment
    clash check (pipelines/filtering.py::segment_clash_count, reference
    run_aeot_end2end.py's clash rejection), which samples points along
    each bond segment and rejects a curve when any non-adjacent segment
    pair's sampled clouds come within `min_seg_dist`. The point-repulsion
    term alone cannot see two segments CROSSING between their endpoints
    — exactly the residual rejector once bonds converge
    (results/aeot_runs/r3_ft6_bankx: segment_collision 76 of 157).

    Samples `num_samples` points along every segment (endpoints
    inclusive), then mean over valid sample pairs — both parent segments
    fully unmasked, segment-index separation > `exclude_segments` — of
    relu(min_dist - d)^2. The filter fires on the MIN sample-pair
    distance; hinging every sample pair below the margin is a smooth
    superset that pushes the same geometry apart.

    `worst_weight` adds that times the batch-mean of each curve's WORST
    sample-pair violation — without it the mean over ~(P*S)^2/2 pairs
    dilutes the few real clashes to noise (measured on r3_ft7 training:
    Mix_SegRepulsion flat at ~4e-5 across 40 epochs while
    segment_collision stayed the top generation rejector).

    Memory: materializes [B, P*S, P*S, 3] (P = L-1 segments). At the
    quality-run scale (L=96, S=3) that is ~4 MB/sample; at flagship
    L=350 prefer S=2-3 or keep the term disabled (it is statically
    compiled out unless its weight is nonzero).
    """
    B, L, _ = xyz.shape
    P = L - 1
    t = jnp.linspace(0.0, 1.0, num_samples,
                     dtype=xyz.dtype)[None, None, :, None]  # [1,1,S,1]
    pts = xyz[:, :-1, None, :] + (
        xyz[:, 1:, None, :] - xyz[:, :-1, None, :]) * t     # [B,P,S,3]
    pts = pts.reshape(B, P * num_samples, 3)
    d = safe_norm(pts[:, :, None, :] - pts[:, None, :, :])  # [B,N,N]
    hinge = jnp.maximum(jnp.asarray(min_dist, d.dtype) - d, 0.0) ** 2
    seg = jnp.repeat(jnp.arange(P), num_samples)
    sep_ok = jnp.abs(seg[:, None] - seg[None, :]) > exclude_segments
    if mask is not None:
        seg_valid = mask[:, :-1] & mask[:, 1:]               # [B, P]
        sv = jnp.repeat(seg_valid, num_samples, axis=1)      # [B, N]
        valid = sv[:, :, None] & sv[:, None, :] & sep_ok[None]
    else:
        valid = jnp.broadcast_to(sep_ok[None], hinge.shape)
    out = masked_mean(hinge, valid)
    if worst_weight:
        hv = jnp.where(valid, hinge, 0.0)
        out = out + worst_weight * jnp.mean(jnp.max(hv, axis=(1, 2)))
    return out


def curve_loss(
    recons: jnp.ndarray,
    target: jnp.ndarray,
    vq_pack: Tuple,
    mask: Optional[jnp.ndarray],
    weights: Dict[str, jnp.ndarray],
    statics: LossStatics,
    embedding: Optional[jnp.ndarray] = None,
    data_mean: Optional[jnp.ndarray] = None,
    data_std: Optional[jnp.ndarray] = None,
) -> Dict[str, jnp.ndarray]:
    """Full composite loss + metrics dict (keys match the reference's).

    recons/target: [B, L, 6] (xyz + 3 SS logits / one-hot); mask: [B, L].
    vq_pack: (z_q_raw, z_e, indices, perplexity, dead_ratio).
    weights: dynamic scalars (see config.DEFAULT_WEIGHT_KEYS).
    embedding: quantizer codebook [K, D], needed only for the usage-entropy
    regularizer (models/vq_vae.py:1299-1309).
    """
    zq_raw, ze_raw, _indices, ppl, dead = vq_pack
    f32 = jnp.float32
    w = {k: jnp.asarray(v, f32) for k, v in weights.items()}

    re_xyz = recons[..., :3].astype(f32)
    re_ss_logits = recons[..., 3:].astype(f32)
    gt_xyz = target[..., :3].astype(f32)
    gt_ss_onehot = target[..., 3:].astype(f32)

    # ----- XYZ reconstruction with optimal-alignment blending -----
    raw_mse = mse_per_sample(re_xyz, gt_xyz, mask)  # [B]
    loss_xyz_raw = jnp.mean(raw_mse)

    R, t, ok = kabsch_rt(re_xyz, gt_xyz, mask)
    re_aln = apply_rt(re_xyz, R, t)
    aln_mse = mse_per_sample(re_aln, gt_xyz, mask)
    if mask is not None:
        valid_ok = jnp.sum(mask, axis=1) >= 3
    else:
        valid_ok = jnp.ones_like(ok)
    best_mse = jnp.where(valid_ok & ok, jnp.minimum(raw_mse, aln_mse), raw_mse)
    loss_xyz_aligned = jnp.mean(best_mse)

    alpha = w["xyz_align_alpha"]
    loss_xyz = alpha * loss_xyz_aligned + (1.0 - alpha) * loss_xyz_raw

    rmsd_raw = jnp.mean(jnp.sqrt(jnp.clip(raw_mse, 1e-12, None)))
    rmsd_aligned = jnp.mean(jnp.sqrt(jnp.clip(best_mse, 1e-12, None)))

    # ----- SS cross-entropy (+ optional label smoothing) -----
    gt_ss_labels = jnp.argmax(gt_ss_onehot, axis=-1)
    loss_ss = smoothed_cross_entropy(
        re_ss_logits, gt_ss_labels, mask, w["label_smoothing"]
    )

    # ----- SS total variation (models/vq_vae.py:1203-1215) -----
    zero = jnp.asarray(0.0, f32)
    ss_tv = zero
    if statics.ss_tv and re_ss_logits.shape[1] >= 2:
        p = jax.nn.softmax(re_ss_logits, axis=-1)
        tv = jnp.sum(jnp.abs(p[:, 1:, :] - p[:, :-1, :]), axis=-1)
        ss_tv = masked_mean(tv, pair_mask(mask, 2))

    # ----- de-normalized ("real") coordinates (models/vq_vae.py:1217-1227) --
    if data_std is not None:
        mean_term = data_mean if data_mean is not None else 0.0
        re_xyz_real = re_xyz * data_std + mean_term
        gt_xyz_real = gt_xyz * data_std + mean_term
    else:
        re_xyz_real, gt_xyz_real = re_xyz, gt_xyz

    # ----- bond length / angle / direction / dihedral -----
    L = re_xyz_real.shape[1]
    bl = ba = dir_loss = dih = bond_hinge = bond_band_max = zero
    if L >= 2:
        re_len = geometry.bond_lengths(re_xyz_real)
        gt_len = geometry.bond_lengths(gt_xyz_real)
        bl = masked_mean((re_len - gt_len) ** 2, pair_mask(mask, 2))
        # min-bond hinge: squared penalty on any reconstructed bond below
        # the margin. Intentional extension beyond the reference loss set
        # (documented deviation): the GT-matching bond MSE leaves a tail
        # of collapsed bonds that the AE-OT filter hard-rejects
        # (run_aeot_end2end BOND_MIN_ALLOWED=1.4); this term attacks that
        # failure mode directly.
        hinge = jnp.maximum(statics.bond_hinge_margin - re_len, 0.0)
        bond_hinge = masked_mean(hinge**2, pair_mask(mask, 2))
        if statics.bond_band:
            # two-sided band violation per bond, per-curve WORST (see
            # LossStatics.bond_band). Padded pairs are zeroed before the
            # max so they can never be the argmax.
            viol = jnp.maximum(statics.bond_band_lo - re_len, 0.0) \
                + jnp.maximum(re_len - statics.bond_band_hi, 0.0)
            pm = pair_mask(mask, 2)
            if pm is not None:
                viol = viol * pm.astype(viol.dtype)
            bond_band_max = jnp.mean(jnp.max(viol, axis=1) ** 2)
        u_rec = unit(re_xyz_real[:, 1:, :] - re_xyz_real[:, :-1, :])
        u_gt = unit(gt_xyz_real[:, 1:, :] - gt_xyz_real[:, :-1, :])
        dir_err = 1.0 - jnp.sum(u_rec * u_gt, axis=-1)
        dir_loss = masked_mean(dir_err, pair_mask(mask, 2))
    if L >= 3:
        cos_rec = geometry.bond_angle_cos(re_xyz_real)
        cos_gt = geometry.bond_angle_cos(gt_xyz_real)
        ba = masked_mean((cos_rec - cos_gt) ** 2, pair_mask(mask, 3))
    if L >= 4:
        dih_rec = geometry.dihedral_cos_sin(re_xyz_real)
        dih_gt = geometry.dihedral_cos_sin(gt_xyz_real)
        dih_sq = jnp.sum((dih_rec - dih_gt) ** 2, axis=-1)
        dih = masked_mean(dih_sq, pair_mask(mask, 4))

    geom_loss = (
        w["bond_length_weight"] * bl
        + w["bond_angle_weight"] * ba
        + w["dir_weight"] * dir_loss
        + w["dih_weight"] * dih
        + w["bond_min_hinge_weight"] * bond_hinge
    )
    if statics.bond_band:
        geom_loss = geom_loss + w["bond_band_max_weight"] * bond_band_max

    # ----- VQ commitment (codebook side is EMA-only; vq_vae.py:1292-1296) ---
    if statics.use_vq:
        commit = jnp.mean(
            (jax.lax.stop_gradient(zq_raw.astype(f32)) - ze_raw.astype(f32))
            ** 2
        )
        vq_loss = w["beta"] * commit
    else:
        vq_loss = zero

    # ----- usage-entropy regularizer (vq_vae.py:1299-1309) -----
    usage_reg = zero
    if statics.usage_entropy and statics.use_vq and embedding is not None:
        flat_ze = ze_raw.reshape(-1, ze_raw.shape[-1]).astype(f32)
        logits = flat_ze @ jax.lax.stop_gradient(embedding.astype(f32)).T
        probs = jax.nn.softmax(logits, axis=-1)
        p_code = jnp.mean(probs, axis=0)
        entropy = -jnp.sum(p_code * jnp.log(jnp.clip(p_code, 1e-12, None)))
        usage_reg = -w["usage_entropy_lambda"] * entropy

    # ----- xyz second-difference TV (vq_vae.py:1312-1322) -----
    xyz_tv = zero
    if statics.xyz_tv and L >= 3:
        tv2 = geometry.second_difference_sq(re_xyz)
        xyz_tv = masked_mean(tv2, pair_mask(mask, 3))

    # ----- heavy optional geometry (statically gated) -----
    geom_local_pdm = (
        pairwise_pdm_loss(re_xyz_real, gt_xyz_real, mask, statics.pdm_window)
        if statics.pdm
        else zero
    )
    geom_winkabsch = (
        window_kabsch_loss(
            re_xyz_real, gt_xyz_real, mask,
            statics.win_kabsch_size, statics.win_kabsch_stride,
        )
        if statics.win_kabsch
        else zero
    )
    if statics.kappa or statics.tau:
        fr_kappa, fr_tau = frenet_regularizers(re_xyz_real, mask)
        fr_kappa = fr_kappa if statics.kappa else zero
        fr_tau = fr_tau if statics.tau else zero
    else:
        fr_kappa, fr_tau = zero, zero
    geom_lr_pdm = (
        long_range_pdm_loss(
            re_xyz_real, gt_xyz_real, mask,
            statics.lr_min_sep, statics.lr_stride, statics.lr_max_offsets,
        )
        if statics.lr_pdm
        else zero
    )
    geom_repulsion = (
        pairwise_repulsion_loss(
            re_xyz_real, mask,
            statics.repulsion_min_dist, statics.repulsion_exclude,
        )
        if statics.repulsion
        else zero
    )

    total = (
        w["rmsd_weight"] * loss_xyz
        + w["ss_weight"] * loss_ss
        + vq_loss
        + geom_loss
        + w["ss_tv_lambda"] * ss_tv
        + usage_reg
        + w["xyz_tv_lambda"] * xyz_tv
        + w["pdm_weight"] * geom_local_pdm
        + w["win_kabsch_weight"] * geom_winkabsch
        + w["kappa_weight"] * fr_kappa
        + w["tau_weight"] * fr_tau
        + w["lr_pdm_weight"] * geom_lr_pdm
        + w["repulsion_weight"] * geom_repulsion
    )

    # ----- metrics -----
    pred_labels = jnp.argmax(re_ss_logits, axis=-1)
    correct = (pred_labels == gt_ss_labels)
    if mask is not None:
        correct = correct & mask
        ss_acc = jnp.sum(correct.astype(f32)) / jnp.clip(
            jnp.sum(mask.astype(f32)), 1.0, None
        )
    else:
        ss_acc = jnp.mean(correct.astype(f32))

    out = {
        "loss": total,
        "Reconstruction_Loss_XYZ": jax.lax.stop_gradient(loss_xyz),
        "XYZ_MSE_Raw": jax.lax.stop_gradient(loss_xyz_raw),
        "XYZ_MSE_Aligned": jax.lax.stop_gradient(jnp.mean(aln_mse)),
        "Reconstruction_Loss_SS": jax.lax.stop_gradient(loss_ss),
        "SS_Accuracy": ss_acc,
        "VQ_Loss": jax.lax.stop_gradient(vq_loss),
        "Geom_BondLength_Loss": jax.lax.stop_gradient(bl),
        "Geom_BondMinHinge": jax.lax.stop_gradient(bond_hinge),
        "Geom_BondBandMax": jax.lax.stop_gradient(bond_band_max),
        "Geom_BondAngle_Loss": jax.lax.stop_gradient(ba),
        "Geom_Direction_Loss": jax.lax.stop_gradient(dir_loss),
        "Geom_Dihedral_Loss": jax.lax.stop_gradient(dih),
        "Geom_Loss": jax.lax.stop_gradient(geom_loss),
        "SS_TV": jax.lax.stop_gradient(ss_tv),
        "Usage_Reg": jax.lax.stop_gradient(usage_reg),
        "XYZ_TV2": jax.lax.stop_gradient(xyz_tv),
        "VQ_Perplexity": ppl,
        "VQ_DeadRatio": dead,
        "RMSD_Raw": rmsd_raw,
        "RMSD_Aligned": rmsd_aligned,
    }
    if statics.pdm:
        out["Geom_LocalPDM"] = jax.lax.stop_gradient(geom_local_pdm)
    if statics.win_kabsch:
        out["Geom_WinKabsch"] = jax.lax.stop_gradient(geom_winkabsch)
    if statics.kappa:
        out["Frenet_Kappa"] = jax.lax.stop_gradient(fr_kappa)
    if statics.tau:
        out["Frenet_Tau"] = jax.lax.stop_gradient(fr_tau)
    if statics.lr_pdm:
        out["Geom_LongRangePDM"] = jax.lax.stop_gradient(geom_lr_pdm)
    if statics.repulsion:
        out["Geom_Repulsion"] = jax.lax.stop_gradient(geom_repulsion)
    return out
