"""Torch/Lightning checkpoint interop (training/torch_interop.py).

Covers the VERDICT-r2 gap: the reference's foreign-checkpoint warm-start
(experiment.py:202-233,277-304) must work for *torch* state_dicts, not
just this framework's own orbax trees. Three layers of evidence:

  1. exact round-trip: flax params -> reference-named torch state_dict ->
     flax, bit-identical, with zero unmapped parameters;
  2. forward parity: a real torch nn.TransformerEncoder with random
     weights, exported under the reference's key names, loaded through
     the mapper, reproduces the flax EncoderStack forward;
  3. warm-start semantics: `model.` prefix strip + `quantizer.*` drop +
     shape filter keep fresh init for skipped keys.
"""

import jax
import jax.numpy as jnp
import numpy as np
import torch

from pytorch_vae_tpu.models.quantizer import init_epoch_stats, init_vq_state
from pytorch_vae_tpu.models.vq_vae import VQVAE
from pytorch_vae_tpu.training import torch_interop as ti

_TINY = dict(hidden_dim=32, num_layers=2, num_heads=4, ffn_dim=48,
             max_seq_len=16, codebook_size=12, code_dim=8,
             latent_tokens=4, num_quantizers=1, tokenizer_layers=2,
             dropout=0.0, tokenizer_dropout=0.0)


def _tiny_model_params(seed=0):
    m = VQVAE(**_TINY)
    k = jax.random.PRNGKey(seed)
    x = jax.random.normal(k, (2, 16, 6), jnp.float32)
    mask = jnp.ones((2, 16), bool)
    vqs = init_vq_state(jax.random.PRNGKey(1), m.vq_config)
    eps = init_epoch_stats(m.vq_config)
    variables = m.init({"params": k, "dropout": k, "aug": k, "reinit": k},
                       x, mask, vqs, eps, step=0, train=False)
    return m, variables["params"], (x, mask, vqs, eps)


def test_flax_torch_roundtrip_exact_and_complete():
    _, params, _ = _tiny_model_params()
    sd = ti.flax_params_to_torch_state_dict(params)
    merged, kept, skipped = ti.torch_state_dict_to_flax(
        sd, params, verbose=False)
    assert not skipped, f"unmapped params: {skipped[:10]}"
    from flax.core import meta as fmeta

    for (pa, a), (pb, b) in zip(
            jax.tree_util.tree_flatten_with_path(fmeta.unbox(params))[0],
            jax.tree_util.tree_flatten_with_path(merged)[0]):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                      err_msg=str(pa))


def test_torch_encoder_forward_parity_through_mapper():
    """Random torch TransformerEncoder -> reference-named sd -> mapper ->
    flax EncoderStack produces the same output (valid rows)."""
    from pytorch_vae_tpu.models.layers import EncoderStack

    E, H, FF, N, B, L = 32, 4, 48, 2, 3, 12
    torch.manual_seed(0)
    layer = torch.nn.TransformerEncoderLayer(
        E, H, dim_feedforward=FF, dropout=0.0, activation="relu",
        batch_first=True, norm_first=True)
    enc_t = torch.nn.TransformerEncoder(layer, N)
    enc_t.eval()
    # reference naming: VQVAE registers this stack as `encoder.`
    sd = {f"model.encoder.{k}": v for k, v in enc_t.state_dict().items()}

    stack = EncoderStack(E, H, N, FF, dropout=0.0)
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (B, L, E), jnp.float32)
    valid = np.ones((B, L), bool)
    valid[1, 8:] = False
    params = stack.init(key, x, jnp.asarray(valid), True)["params"]

    merged, kept, skipped = ti.torch_state_dict_to_flax(
        sd, {"encoder": params}, verbose=False)
    assert kept and not skipped
    out_jax = np.asarray(stack.apply({"params": merged["encoder"]}, x,
                                     jnp.asarray(valid), True))
    with torch.no_grad():
        out_t = enc_t(torch.tensor(np.asarray(x)),
                      src_key_padding_mask=torch.tensor(~valid)).numpy()
    np.testing.assert_allclose(out_jax[valid], out_t[valid],
                               rtol=2e-4, atol=2e-4)


def test_warmstart_semantics_prefix_drop_and_shape_filter():
    _, params, _ = _tiny_model_params()
    sd = ti.flax_params_to_torch_state_dict(params, prefix="model.")
    # quantizer entries must be ignored (codebook protection,
    # experiment.py:216) and shape mismatches must keep fresh init
    sd["model.quantizer.embedding"] = np.zeros((12, 8), np.float32)
    sd["model.head_xyz.weight"] = np.zeros((7, 32), np.float32)  # bad shape
    sd["model.head_xyz.bias"] = np.full((3,), 9.0, np.float32)

    from flax.core import meta as fmeta

    fresh = fmeta.unbox(params)
    merged, kept, skipped = ti.torch_state_dict_to_flax(
        sd, params, verbose=False)
    assert "head_xyz/kernel" in skipped  # shape-filtered
    np.testing.assert_array_equal(
        np.asarray(merged["head_xyz"]["kernel"]),
        np.asarray(fresh["head_xyz"]["kernel"]))
    np.testing.assert_allclose(np.asarray(merged["head_xyz"]["bias"]), 9.0)
    assert not any(k.startswith("quantizer") for k in kept)


def test_full_model_forward_after_torch_warmstart():
    """End-to-end: params A exported to a Lightning-style .ckpt file,
    warm-started into fresh params B -> identical full-model forward."""
    m, params_a, (x, mask, vqs, eps) = _tiny_model_params(seed=0)
    _, params_b, _ = _tiny_model_params(seed=5)

    sd = ti.flax_params_to_torch_state_dict(params_a, prefix="model.")
    import tempfile, os

    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "ref.ckpt")
        torch.save({"state_dict": {k: torch.tensor(v)
                                   for k, v in sd.items()},
                    "epoch": 3}, path)
        merged, kept, skipped = ti.warm_start_from_torch(
            path, params_b, verbose=False)
    assert not skipped

    def fwd(p):
        (rec, tgt, pack, msk), _, _, _ = m.apply(
            {"params": p}, x, mask, vqs, eps, step=0, train=False)
        return np.asarray(rec)

    np.testing.assert_allclose(fwd(merged), fwd(params_a),
                               rtol=1e-5, atol=1e-5)


def test_experiment_warm_start_routes_torch_files(tmp_path):
    """VQVAEExperiment.apply_restore_modes: a warm-start FILE (vs orbax
    dir) routes through the torch state_dict mapper."""
    from pytorch_vae_tpu.data.synthetic import make_synthetic_curve_dir
    from pytorch_vae_tpu.training.experiment import VQVAEExperiment

    from pytorch_vae_tpu.parallel.mesh import make_mesh

    data_dir = str(tmp_path / "curves")
    make_synthetic_curve_dir(data_dir, n_train=4, n_val=2, seed=0,
                             min_len=12, max_len=16)
    model = dict(_TINY, name="VQVAE-ti")
    exp = VQVAEExperiment(
        model,
        {"LR": 1e-3, "manual_seed": 0, "lr_scheduler": "none"},
        {"npy_dir": data_dir, "train_list": "train_list.txt",
         "val_list": "val_list.txt", "train_batch_size": 2,
         "val_batch_size": 2, "pad_to_max": True},
        {"max_epochs": 1}, verbose=False,
        mesh=make_mesh(data=1, model=1, devices=jax.devices()[:1]))
    exp.setup()
    exp.init_state(steps_per_epoch=1, max_epochs=1)

    src = ti.flax_params_to_torch_state_dict(exp.state.params,
                                             prefix="model.")
    # perturb one exported weight so the load is observable
    src["model.head_xyz.bias"] = np.full((3,), 4.5, np.float32)
    path = str(tmp_path / "foreign.ckpt")
    torch.save({"state_dict": {k: torch.tensor(v) for k, v in src.items()}},
               path)
    exp.apply_restore_modes(warm_start_ckpt=path)
    np.testing.assert_allclose(
        np.asarray(exp.state.params["head_xyz"]["bias"]), 4.5)
