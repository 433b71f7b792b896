"""Golden-value regression test: a frozen tiny model + input must keep
producing the same forward outputs and loss values (CPU, float32).

The golden file is regenerated intentionally with:
    python tests/test_golden.py regenerate
Any unintended numeric drift in the encoder/tokenizer/quantizer/decoder or
the loss family fails this test.
"""

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

GOLDEN = os.path.join(os.path.dirname(__file__), "golden_tiny_vqvae.npz")

_KW = dict(hidden_dim=32, num_layers=2, num_heads=4, max_seq_len=24,
           ffn_dim=64, use_vq=True, num_quantizers=2, codebook_size=8,
           code_dim=8, latent_tokens=4, tokenizer_layers=1)


def _compute():
    # fixed PRNG impl so golden values are stable regardless of config
    from pytorch_vae_tpu.config import DEFAULT_WEIGHT_KEYS
    from pytorch_vae_tpu.models import VQVAE, init_epoch_stats, init_vq_state
    from pytorch_vae_tpu.ops.losses import LossStatics, curve_loss

    model = VQVAE(**_KW)
    key = jax.random.key(0, impl="threefry2x32")
    rng = np.random.default_rng(42)
    x = jnp.asarray(
        np.cumsum(rng.normal(size=(2, 24, 6)), axis=1).astype(np.float32))
    mask = jnp.asarray(np.arange(24)[None] < np.asarray([[24], [15]]))
    vqs = init_vq_state(jax.random.key(1, impl="threefry2x32"),
                        model.vq_config)
    eps = init_epoch_stats(model.vq_config)
    variables = model.init(
        {"params": key, "dropout": key, "aug": key, "reinit": key},
        x, mask, vqs, eps, step=0, train=False)
    out, _, _, _ = model.apply(variables, x, mask, vqs, eps, step=0,
                               train=False)
    recons, target, vq_pack, m = out
    w = dict(DEFAULT_WEIGHT_KEYS, ss_weight=0.8, rmsd_weight=1.8,
             beta=0.01, label_smoothing=0.01, ss_tv_lambda=0.002,
             xyz_tv_lambda=0.001)
    st = LossStatics(use_vq=True, seq_len=24, ss_tv=True, xyz_tv=True)
    ld = curve_loss(recons, target, vq_pack, m, w, st,
                    embedding=vqs.embedding)
    return {
        "recons": np.asarray(recons),
        "z_e": np.asarray(vq_pack[1]),
        "indices": np.asarray(vq_pack[2]),
        "loss": np.asarray(ld["loss"]),
        "loss_xyz": np.asarray(ld["Reconstruction_Loss_XYZ"]),
        "loss_ss": np.asarray(ld["Reconstruction_Loss_SS"]),
        "vq_loss": np.asarray(ld["VQ_Loss"]),
    }


def test_golden_forward_and_loss():
    got = _compute()
    if not os.path.exists(GOLDEN):
        np.savez(GOLDEN, **got)
        raise AssertionError(
            f"golden file was missing; wrote {GOLDEN} — rerun the test")
    want = np.load(GOLDEN)
    np.testing.assert_array_equal(got["indices"], want["indices"])
    for k in ("recons", "z_e", "loss", "loss_xyz", "loss_ss", "vq_loss"):
        np.testing.assert_allclose(
            got[k], want[k], rtol=2e-4, atol=2e-5,
            err_msg=f"golden drift in {k}")


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "regenerate":
        os.environ.setdefault("JAX_PLATFORMS", "cpu")
        np.savez(GOLDEN, **_compute())
        print(f"regenerated {GOLDEN}")
