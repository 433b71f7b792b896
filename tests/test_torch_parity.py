"""Numerical parity of the curve loss family against an independent
PyTorch oracle.

The oracle re-implements the reference's loss semantics in torch from the
documented math (masked means, Kabsch min(raw, aligned) blending, masked
CE with label smoothing, geometry terms) and must agree with the jitted
jnp implementation to ~1e-3 relative on random data. This is the
"recon loss within 1% of the PyTorch reference" check of BASELINE.md run
at the unit level (the reference's private data/checkpoints are not
mounted, SURVEY.md §7.3 hard part 5).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from pytorch_vae_tpu.config import DEFAULT_WEIGHT_KEYS  # noqa: E402
from pytorch_vae_tpu.ops.losses import LossStatics, curve_loss  # noqa: E402

B, L = 4, 40
WEIGHTS = dict(
    DEFAULT_WEIGHT_KEYS,
    ss_weight=0.8, rmsd_weight=1.8, bond_length_weight=0.01,
    bond_min_hinge_weight=0.02, bond_band_max_weight=0.015,
    bond_angle_weight=0.004, dir_weight=0.002, dih_weight=0.003,
    xyz_tv_lambda=0.001, ss_tv_lambda=0.002, label_smoothing=0.02,
    beta=0.005, xyz_align_alpha=0.95, pdm_weight=0.001,
    lr_pdm_weight=0.002, kappa_weight=0.0005, tau_weight=0.0005,
    pdm_window=5, lr_min_sep=10, lr_stride=4, lr_max_offsets=3,
)
STATICS = LossStatics(
    use_vq=True, seq_len=L, ss_tv=True, xyz_tv=True, pdm=True, kappa=True,
    tau=True, lr_pdm=True, bond_band=True, pdm_window=5, lr_min_sep=10,
    lr_stride=4, lr_max_offsets=3,
)


def _masked_mean_t(x, m):
    m = m.float()
    return (x * m).sum() / m.sum().clamp_min(1.0)


def _unit_t(v, eps=1e-8):
    return v / (v.norm(dim=-1, keepdim=True) + eps)


def _dihedral_t(x):
    v1 = x[:, 1:-2] - x[:, :-3]
    v2 = x[:, 2:-1] - x[:, 1:-2]
    v3 = x[:, 3:] - x[:, 2:-1]
    b1, b2, b3 = _unit_t(v1), _unit_t(v2), _unit_t(v3)
    n1 = _unit_t(torch.cross(b1, b2, dim=-1))
    n2 = _unit_t(torch.cross(b2, b3, dim=-1))
    m1 = torch.cross(n1, _unit_t(b2), dim=-1)
    cos = (n1 * n2).sum(-1, keepdim=True).clamp(-1, 1)
    sin = (m1 * n2).sum(-1, keepdim=True).clamp(-1, 1)
    return torch.cat([cos, sin], -1)


def _kabsch_t(a, b, m):
    mf = m.float().unsqueeze(-1)
    den = mf.sum(1, keepdim=True).clamp_min(1.0)
    a_mu = (a * mf).sum(1, keepdim=True) / den
    b_mu = (b * mf).sum(1, keepdim=True) / den
    a_c, b_c = a - a_mu, b - b_mu
    H = torch.einsum("bli,blj->bij", a_c * mf, b_c)
    U, S, Vh = torch.linalg.svd(H)
    det = torch.det(U @ Vh)
    D = torch.eye(3).unsqueeze(0).repeat(a.shape[0], 1, 1)
    D[:, 2, 2] = torch.where(det >= 0, 1.0, -1.0)
    R = U @ D @ Vh
    t = b_mu - torch.einsum("bli,bij->blj", a_mu, R)
    return R, t


def torch_oracle(recons, target, zq, ze, mask, w):
    """Independent torch re-implementation of the composite loss."""
    re_xyz, re_ss = recons[..., :3], recons[..., 3:]
    gt_xyz, gt_ss = target[..., :3], target[..., 3:]
    m = mask.float()
    mden = m.sum(1).clamp_min(1.0)

    def mse_per_sample(a, b):
        d2 = ((a - b) ** 2).sum(-1)
        return (d2 * m).sum(1) / mden

    raw = mse_per_sample(re_xyz, gt_xyz)
    R, t = _kabsch_t(re_xyz, gt_xyz, mask)
    aln_xyz = torch.einsum("bli,bij->blj", re_xyz, R) + t
    aln = mse_per_sample(aln_xyz, gt_xyz)
    best = torch.minimum(raw, aln)
    alpha = w["xyz_align_alpha"]
    loss_xyz = alpha * best.mean() + (1 - alpha) * raw.mean()

    # smoothed CE (KL form)
    labels = gt_ss.argmax(-1)
    eps = w["label_smoothing"]
    logp = torch.log_softmax(re_ss, -1)
    td = torch.full_like(re_ss, eps / 2)
    td.scatter_(-1, labels.unsqueeze(-1), 1 - eps)
    kl = torch.nn.functional.kl_div(logp, td, reduction="none").sum(-1)
    loss_ss = _masked_mean_t(kl, m)

    # ss TV
    p = torch.softmax(re_ss, -1)
    tv = (p[:, 1:] - p[:, :-1]).abs().sum(-1)
    ss_tv = _masked_mean_t(tv, (mask[:, 1:] & mask[:, :-1]))

    # bond length / angle / direction / dihedral
    def pm(k):
        out = mask[:, : L - k + 1]
        for d in range(1, k):
            out = out & mask[:, d : L - k + 1 + d]
        return out

    re_len = (re_xyz[:, 1:] - re_xyz[:, :-1]).norm(dim=-1)
    gt_len = (gt_xyz[:, 1:] - gt_xyz[:, :-1]).norm(dim=-1)
    bl = _masked_mean_t((re_len - gt_len) ** 2, pm(2))
    bond_hinge = _masked_mean_t(
        torch.clamp(2.5 - re_len, min=0.0) ** 2, pm(2))
    # per-curve worst-bond band hinge (LossStatics.bond_band, lo/hi
    # defaults 2.5/5.2): padded pairs zeroed before the per-curve max
    band_viol = (torch.clamp(2.5 - re_len, min=0.0)
                 + torch.clamp(re_len - 5.2, min=0.0)) * pm(2).float()
    bond_band_max = (band_viol.max(dim=1).values ** 2).mean()

    def cosang(x):
        v1 = x[:, 1:-1] - x[:, :-2]
        v2 = x[:, 2:] - x[:, 1:-1]
        return (_unit_t(v1) * _unit_t(v2)).sum(-1)

    ba = _masked_mean_t((cosang(re_xyz) - cosang(gt_xyz)) ** 2, pm(3))
    u_r = _unit_t(re_xyz[:, 1:] - re_xyz[:, :-1])
    u_g = _unit_t(gt_xyz[:, 1:] - gt_xyz[:, :-1])
    dir_loss = _masked_mean_t(1 - (u_r * u_g).sum(-1), pm(2))
    dih = _masked_mean_t(
        ((_dihedral_t(re_xyz) - _dihedral_t(gt_xyz)) ** 2).sum(-1), pm(4))

    # xyz second-difference TV + Frenet kappa/tau
    d1 = re_xyz[:, 1:] - re_xyz[:, :-1]
    d2_ = d1[:, 1:] - d1[:, :-1]
    tv2 = (d2_ ** 2).sum(-1)
    xyz_tv = _masked_mean_t(tv2, pm(3))
    kappa = xyz_tv  # same quantity (second-difference energy)
    dih_r = _dihedral_t(re_xyz)
    tau_var = ((dih_r[:, 1:] - dih_r[:, :-1]) ** 2).sum(-1)
    tau = _masked_mean_t(tau_var, pm(5))

    # local PDM (per-offset masked means)
    terms = []
    for d in range(1, 5):
        da = (re_xyz[:, :-d] - re_xyz[:, d:]).norm(dim=-1)
        db = (gt_xyz[:, :-d] - gt_xyz[:, d:]).norm(dim=-1)
        mm = (mask[:, :-d] & mask[:, d:]).float()
        terms.append(((da - db) ** 2 * mm).sum() / mm.sum().clamp_min(1.0))
    pdm = torch.stack(terms).mean()

    # long-range PDM
    vals = []
    for off in range(3):
        for i in range(0, L, 4):
            j = i + 10 + off
            if j >= L:
                break
            da = (re_xyz[:, j] - re_xyz[:, i]).norm(dim=-1)
            db = (gt_xyz[:, j] - gt_xyz[:, i]).norm(dim=-1)
            mm = (mask[:, j] & mask[:, i]).float()
            vals.append((mm * (da - db) ** 2).sum()
                        / mm.sum().clamp_min(1.0))
    lr_pdm = torch.stack(vals).mean()

    commit = ((zq.detach() - ze) ** 2).mean()

    total = (
        w["rmsd_weight"] * loss_xyz + w["ss_weight"] * loss_ss
        + w["beta"] * commit
        + w["bond_length_weight"] * bl + w["bond_angle_weight"] * ba
        + w["bond_min_hinge_weight"] * bond_hinge
        + w["bond_band_max_weight"] * bond_band_max
        + w["dir_weight"] * dir_loss + w["dih_weight"] * dih
        + w["ss_tv_lambda"] * ss_tv + w["xyz_tv_lambda"] * xyz_tv
        + w["pdm_weight"] * pdm + w["kappa_weight"] * kappa
        + w["tau_weight"] * tau + w["lr_pdm_weight"] * lr_pdm
    )
    return {
        "loss": total, "Reconstruction_Loss_XYZ": loss_xyz,
        "XYZ_MSE_Raw": raw.mean(), "Reconstruction_Loss_SS": loss_ss,
        "SS_TV": ss_tv, "Geom_BondLength_Loss": bl,
        "Geom_BondMinHinge": bond_hinge,
        "Geom_BondBandMax": bond_band_max,
        "Geom_BondAngle_Loss": ba, "Geom_Direction_Loss": dir_loss,
        "Geom_Dihedral_Loss": dih, "XYZ_TV2": xyz_tv,
        "Geom_LocalPDM": pdm, "Geom_LongRangePDM": lr_pdm,
        "Frenet_Kappa": kappa, "Frenet_Tau": tau,
        "VQ_Loss": w["beta"] * commit,
    }


def test_curve_loss_matches_torch_oracle():
    rng = np.random.default_rng(0)
    gt_xyz = np.cumsum(rng.normal(size=(B, L, 3)), 1).astype(np.float32)
    re_xyz = (gt_xyz + rng.normal(scale=0.4,
                                  size=(B, L, 3))).astype(np.float32)
    re_ss = rng.normal(size=(B, L, 3)).astype(np.float32)
    gt_lab = rng.integers(0, 3, (B, L))
    gt_ss = np.eye(3, dtype=np.float32)[gt_lab]
    mask = (np.arange(L)[None] < np.asarray([L, L - 5, 30, 25])[:, None])
    zq = rng.normal(size=(B, 8, 16)).astype(np.float32)
    ze = (zq + rng.normal(scale=0.1, size=(B, 8, 16))).astype(np.float32)

    recons = np.concatenate([re_xyz, re_ss], -1)
    target = np.concatenate([gt_xyz, gt_ss], -1)
    pack = (jnp.asarray(zq), jnp.asarray(ze),
            jnp.zeros((B, 8), jnp.int32), jnp.asarray(0.0), jnp.asarray(0.0))
    got = curve_loss(jnp.asarray(recons), jnp.asarray(target), pack,
                     jnp.asarray(mask), WEIGHTS, STATICS)

    want = torch_oracle(
        torch.tensor(recons), torch.tensor(target), torch.tensor(zq),
        torch.tensor(ze), torch.tensor(mask), WEIGHTS)

    for k, tv in want.items():
        gv = float(got[k])
        tvf = float(tv)
        assert abs(gv - tvf) <= 1e-3 * max(abs(tvf), 1e-2), (
            f"{k}: jax {gv} vs torch {tvf}")
    # the headline parity bound: total loss within 0.1%
    assert abs(float(got["loss"]) - float(want["loss"])) \
        <= 1e-3 * abs(float(want["loss"]))


def test_quantizer_commit_grad_matches_torch():
    """d(commit)/d(z_e) must equal torch's: 2(z_e - z_q)/numel."""
    rng = np.random.default_rng(1)
    zq = rng.normal(size=(2, 4, 8)).astype(np.float32)
    ze = rng.normal(size=(2, 4, 8)).astype(np.float32)

    def commit_jax(ze_):
        return jnp.mean((jax.lax.stop_gradient(jnp.asarray(zq)) - ze_) ** 2)

    g_jax = np.asarray(jax.grad(commit_jax)(jnp.asarray(ze)))
    ze_t = torch.tensor(ze, requires_grad=True)
    loss_t = ((torch.tensor(zq).detach() - ze_t) ** 2).mean()
    loss_t.backward()
    np.testing.assert_allclose(g_jax, ze_t.grad.numpy(), atol=1e-6)


def _encoder_block_params_to_torch(params, layer, E, H):
    """Copy flax EncoderBlock params into a torch TransformerEncoderLayer.

    flax DenseGeneral computes y = x @ W (+b) with W [in, ...out];
    torch nn.Linear computes y = x @ W^T (+b) — every kernel transposes.
    """
    from flax.core import meta as fmeta

    p = fmeta.unbox(params)
    sd = layer.state_dict()

    def t(a):
        return torch.tensor(np.asarray(a, np.float32))

    wq = t(p["attn"]["q_proj"]["kernel"]).reshape(E, E)
    wk = t(p["attn"]["k_proj"]["kernel"]).reshape(E, E)
    wv = t(p["attn"]["v_proj"]["kernel"]).reshape(E, E)
    sd["self_attn.in_proj_weight"] = torch.cat(
        [wq.T, wk.T, wv.T], dim=0)
    sd["self_attn.in_proj_bias"] = torch.cat(
        [t(p["attn"][n]["bias"]).reshape(E) for n in
         ("q_proj", "k_proj", "v_proj")])
    sd["self_attn.out_proj.weight"] = \
        t(p["attn"]["out_proj"]["kernel"]).reshape(E, E).T
    sd["self_attn.out_proj.bias"] = t(p["attn"]["out_proj"]["bias"])
    sd["linear1.weight"] = t(p["ffn"]["fc1"]["kernel"]).T
    sd["linear1.bias"] = t(p["ffn"]["fc1"]["bias"])
    sd["linear2.weight"] = t(p["ffn"]["fc2"]["kernel"]).T
    sd["linear2.bias"] = t(p["ffn"]["fc2"]["bias"])
    sd["norm1.weight"] = t(p["ln1"]["scale"])
    sd["norm1.bias"] = t(p["ln1"]["bias"])
    sd["norm2.weight"] = t(p["ln2"]["scale"])
    sd["norm2.bias"] = t(p["ln2"]["bias"])
    layer.load_state_dict(sd)


def test_encoder_block_matches_torch_transformer_layer():
    """flax EncoderBlock == torch nn.TransformerEncoderLayer(norm_first)
    on identical weights — validates attention math, pre-LN placement,
    ReLU FFN wiring, residuals, and key-padding-mask semantics against
    the exact torch module the reference stacks
    (/root/reference/models/vq_vae.py:455-463)."""
    from pytorch_vae_tpu.models.layers import EncoderBlock

    E, H, FF, B, L = 32, 4, 64, 3, 20
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (B, L, E), jnp.float32)
    # True = valid (ours); torch key_padding_mask wants True = pad
    valid = np.ones((B, L), bool)
    valid[1, 14:] = False
    valid[2, 7:] = False

    block = EncoderBlock(E, H, ffn_dim=FF, dropout=0.0)
    params = block.init(key, x, jnp.asarray(valid), True)["params"]
    out_jax = np.asarray(block.apply(
        {"params": params}, x, jnp.asarray(valid), True))

    layer = torch.nn.TransformerEncoderLayer(
        d_model=E, nhead=H, dim_feedforward=FF, dropout=0.0,
        activation="relu", batch_first=True, norm_first=True)
    layer.eval()
    _encoder_block_params_to_torch(params, layer, E, H)
    with torch.no_grad():
        out_t = layer(
            torch.tensor(np.asarray(x)),
            src_key_padding_mask=torch.tensor(~valid)).numpy()

    # padded query rows may differ (torch propagates masked-query NaN
    # defenses differently); the reference itself only consumes valid rows
    np.testing.assert_allclose(
        out_jax[valid], out_t[valid], rtol=2e-4, atol=2e-4)


def test_decoder_block_matches_torch_transformer_layer():
    """flax DecoderBlock == torch nn.TransformerDecoderLayer(norm_first)
    on identical weights — validates self-attn + cross-attn + FFN wiring
    and memory-mask semantics against the torch module the reference's
    decoder stacks (/root/reference/models/vq_vae.py:504-528)."""
    from flax.core import meta as fmeta

    from pytorch_vae_tpu.models.layers import DecoderBlock

    E, H, FF, B, L, M = 32, 4, 64, 2, 15, 6
    key = jax.random.PRNGKey(1)
    x = jax.random.normal(key, (B, L, E), jnp.float32)
    mem = jax.random.normal(jax.random.PRNGKey(2), (B, M, E), jnp.float32)
    valid = np.ones((B, L), bool)
    valid[1, 11:] = False

    block = DecoderBlock(E, H, ffn_dim=FF, dropout=0.0)
    params = block.init(key, x, mem, jnp.asarray(valid), None, True)[
        "params"]
    out_jax = np.asarray(block.apply(
        {"params": params}, x, mem, jnp.asarray(valid), None, True))

    layer = torch.nn.TransformerDecoderLayer(
        d_model=E, nhead=H, dim_feedforward=FF, dropout=0.0,
        activation="relu", batch_first=True, norm_first=True)
    layer.eval()
    p = fmeta.unbox(params)
    sd = layer.state_dict()

    def t(a):
        return torch.tensor(np.asarray(a, np.float32))

    def load_attn(prefix, ap):
        wq = t(ap["q_proj"]["kernel"]).reshape(E, E)
        wk = t(ap["k_proj"]["kernel"]).reshape(E, E)
        wv = t(ap["v_proj"]["kernel"]).reshape(E, E)
        sd[f"{prefix}.in_proj_weight"] = torch.cat([wq.T, wk.T, wv.T], 0)
        sd[f"{prefix}.in_proj_bias"] = torch.cat(
            [t(ap[n]["bias"]).reshape(E) for n in
             ("q_proj", "k_proj", "v_proj")])
        sd[f"{prefix}.out_proj.weight"] = \
            t(ap["out_proj"]["kernel"]).reshape(E, E).T
        sd[f"{prefix}.out_proj.bias"] = t(ap["out_proj"]["bias"])

    load_attn("self_attn", p["self_attn"])
    load_attn("multihead_attn", p["cross_attn"])
    sd["linear1.weight"] = t(p["ffn"]["fc1"]["kernel"]).T
    sd["linear1.bias"] = t(p["ffn"]["fc1"]["bias"])
    sd["linear2.weight"] = t(p["ffn"]["fc2"]["kernel"]).T
    sd["linear2.bias"] = t(p["ffn"]["fc2"]["bias"])
    for ours, theirs in (("ln1", "norm1"), ("ln2", "norm2"),
                         ("ln3", "norm3")):
        sd[f"{theirs}.weight"] = t(p[ours]["scale"])
        sd[f"{theirs}.bias"] = t(p[ours]["bias"])
    layer.load_state_dict(sd)
    with torch.no_grad():
        out_t = layer(
            torch.tensor(np.asarray(x)), torch.tensor(np.asarray(mem)),
            tgt_key_padding_mask=torch.tensor(~valid)).numpy()
    np.testing.assert_allclose(
        out_jax[valid], out_t[valid], rtol=2e-4, atol=2e-4)
