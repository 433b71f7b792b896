"""Test configuration: force CPU with 8 virtual devices.

This is the TPU-native answer to testing multi-chip code without a pod
(SURVEY.md §4): an 8-device host-platform mesh exercises the same GSPMD
partitioning and collective paths that run over ICI on real hardware.

The driver environment pins JAX_PLATFORMS=axon (a real-TPU tunnel) and a
sitecustomize hook initializes the PJRT plugin at interpreter startup, so
env mutation alone is not enough: we both override the platform env var AND
set jax_num_cpu_devices through the config API (which takes effect any time
before the CPU backend is first used).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
try:
    jax.config.update("jax_num_cpu_devices", 8)
except Exception:  # pragma: no cover - older jax without the option
    pass

import pytest  # noqa: E402


@pytest.fixture(autouse=True)
def _restore_default_prng_impl():
    """VQVAEExperiment switches jax_default_prng_impl to 'rbg' process-wide
    (experiment.py) and jax has no scoped API for it, so any test that
    constructs an experiment would silently change PRNGKey semantics for
    every later test (caught as an order-dependent sampling-test failure).
    Snapshot and restore around each test."""
    before = jax.config.jax_default_prng_impl
    yield
    if jax.config.jax_default_prng_impl != before:
        jax.config.update("jax_default_prng_impl", before)


TINY_MODEL = {
    "name": "VQVAE-tiny", "input_dim": 6, "hidden_dim": 32,
    "num_layers": 1, "num_heads": 4, "ffn_dim": 64, "max_seq_len": 48,
    "use_vq": True, "num_quantizers": 2, "codebook_size": 16,
    "code_dim": 16, "latent_tokens": 4, "tokenizer_layers": 1,
}


@pytest.fixture(scope="session")
def tiny_ckpt(tmp_path_factory):
    """One trained step -> orbax checkpoint + matching YAML config.

    Shared by the CLI-script and serving full-flow tests."""
    import yaml

    from pytorch_vae_tpu.data.synthetic import make_synthetic_curve_dir
    from pytorch_vae_tpu.parallel.mesh import make_mesh
    from pytorch_vae_tpu.training.checkpoints import save_checkpoint
    from pytorch_vae_tpu.training.experiment import VQVAEExperiment

    root = tmp_path_factory.mktemp("tiny_ckpt")
    data_dir = str(root / "curves")
    make_synthetic_curve_dir(data_dir, n_train=8, n_val=4, seed=0,
                             min_len=16, max_len=48)
    exp = VQVAEExperiment(
        TINY_MODEL,
        {"LR": 1e-3, "weight_decay": 0.01, "manual_seed": 0,
         "lr_scheduler": "none", "save_every_epochs": 1},
        {"npy_dir": data_dir, "train_list": "train_list.txt",
         "val_list": "val_list.txt", "train_batch_size": 4,
         "val_batch_size": 4, "pad_to_max": True},
        {"max_epochs": 1}, verbose=False,
        mesh=make_mesh(data=1, model=1, devices=jax.devices()[:1]))
    exp.setup()
    exp.init_state(steps_per_epoch=2, max_epochs=1)
    step = exp.make_train_step()
    w = exp._dynamic_weights(0)
    x, mask = next(iter(exp.train_loader))
    xb, mb = exp._put(x, mask)
    exp.state, _ = step(exp.state, xb, mb, w, exp._base_rng)
    ckpt_path = save_checkpoint(str(root / "ckpts"), "tiny", exp.state)

    config_path = str(root / "tiny.yaml")
    with open(config_path, "w") as f:
        yaml.safe_dump({
            "model_params": TINY_MODEL,
            "data_params": {"npy_dir": data_dir,
                            "train_list": "train_list.txt",
                            "val_list": "val_list.txt"},
        }, f)
    return config_path, ckpt_path
