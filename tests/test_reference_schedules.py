"""Schedule parity against the exact shipped stage-2 config values.

Evaluates configs/stage2_vq.yaml's epoch schedules (byte-identical knots to
the reference configs/stage2_vq.yaml:108-207) at hand-computed epochs.
"""

import os

from pytorch_vae_tpu.config import (
    initial_weights,
    load_yaml,
    weights_for_epoch,
)

CFG = os.path.join(os.path.dirname(__file__), "..", "configs",
                   "stage2_vq.yaml")


def _weights_at(epoch):
    cfg = load_yaml(CFG)
    base = initial_weights(cfg["model_params"], cfg["exp_params"])
    return weights_for_epoch(base, cfg["exp_params"]["schedules"], epoch)


def test_stage2_epoch0():
    w = _weights_at(0)
    assert abs(w["beta"] - 0.0005) < 1e-12
    assert abs(w["rmsd_weight"] - 1.80) < 1e-12
    assert abs(w["ss_weight"] - 0.80) < 1e-12
    assert w["bond_length_weight"] == 0.0
    assert w["pdm_weight"] == 0.0


def test_stage2_epoch50_interpolation():
    w = _weights_at(50)
    # beta: knots (20, 0.003) -> (80, 0.005): epoch 50 is halfway
    assert abs(w["beta"] - 0.004) < 1e-9
    # rmsd: (30, 1.8) -> (80, 1.2): 40% through
    assert abs(w["rmsd_weight"] - (1.8 + 0.4 * (1.2 - 1.8))) < 1e-9
    # bond length: (30, 0.005) -> (100, 0.015)
    expect_bl = 0.005 + (50 - 30) / 70 * 0.010
    assert abs(w["bond_length_weight"] - expect_bl) < 1e-9


def test_stage2_epoch140_peaks():
    w = _weights_at(140)
    assert abs(w["ss_weight"] - 10.0) < 1e-9
    assert abs(w["beta"] - 0.006) < 1e-9


def test_stage2_past_last_knot():
    w = _weights_at(250)
    assert abs(w["beta"] - 0.003) < 1e-12
    assert abs(w["ss_weight"] - 1.20) < 1e-12
    assert abs(w["bond_length_weight"] - 0.04) < 1e-12


def test_stage2_static_windows_are_ints():
    w = _weights_at(33)
    for k in ("pdm_window", "win_kabsch_size", "win_kabsch_stride",
              "lr_min_sep", "lr_stride", "lr_max_offsets"):
        assert isinstance(w[k], int)
    assert w["pdm_window"] == 8
    assert w["win_kabsch_size"] == 16


def test_stage2_statics_enable_expected_terms():
    from pytorch_vae_tpu.training.experiment import VQVAEExperiment

    cfg = load_yaml(CFG)
    cfg["data_params"]["npy_dir"] = "/nonexistent"  # setup not called
    exp = VQVAEExperiment(cfg["model_params"], cfg["exp_params"],
                          cfg["data_params"], cfg["trainer_params"],
                          verbose=False)
    st = exp.statics
    # weights scheduled to nonzero values -> statically enabled
    assert st.pdm and st.win_kabsch and st.lr_pdm and st.xyz_tv and st.ss_tv
    # never-nonzero terms compiled out
    assert not st.kappa and not st.tau and not st.usage_entropy
