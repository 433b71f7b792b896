"""Config system tests: schedule interpolation + env expansion semantics."""

import os

from pytorch_vae_tpu.config import (
    DEFAULT_WEIGHT_KEYS,
    expand_env,
    initial_weights,
    interpolate_schedule,
    term_ever_active,
    weights_for_epoch,
)


def test_schedule_before_first_knot():
    s = {"w": [[5, 1.0], [10, 2.0]]}
    assert interpolate_schedule(s, 0)["w"] == 1.0
    assert interpolate_schedule(s, 5)["w"] == 1.0


def test_schedule_linear_between_knots():
    s = {"w": [[0, 0.0], [10, 1.0]]}
    assert abs(interpolate_schedule(s, 5)["w"] - 0.5) < 1e-9
    assert abs(interpolate_schedule(s, 9)["w"] - 0.9) < 1e-9


def test_schedule_after_last_knot_holds_last_value():
    s = {"w": [[0, 0.0], [10, 1.0], [20, 0.5]]}
    assert interpolate_schedule(s, 25)["w"] == 0.5
    assert interpolate_schedule(s, 20)["w"] == 0.5


def test_schedule_multi_segment():
    # mirrors the stage2 beta schedule shape (configs/stage2_vq.yaml:118-123)
    s = {"beta": [[0, 0.0005], [5, 0.0015], [20, 0.0030]]}
    v = interpolate_schedule(s, 10)["beta"]
    expected = 0.0015 + (10 - 5) / (20 - 5) * (0.0030 - 0.0015)
    assert abs(v - expected) < 1e-12


def test_env_expansion():
    os.environ["PVT_TEST_DIR"] = "/tmp/pvt"
    cfg = expand_env({"a": "$PVT_TEST_DIR/data", "b": [{"c": "${PVT_TEST_DIR}"}]})
    assert cfg["a"] == "/tmp/pvt/data"
    assert cfg["b"][0]["c"] == "/tmp/pvt"


def test_weights_for_epoch_rounds_static_keys():
    base = dict(DEFAULT_WEIGHT_KEYS)
    w = weights_for_epoch(base, {"pdm_window": [[0, 7.6]]}, 0)
    assert w["pdm_window"] == 8
    assert isinstance(w["pdm_window"], int)


def test_initial_weights_sources():
    w = initial_weights(
        {"label_smoothing": 0.01, "beta": 0.5, "ss_tv_lambda": 0.002},
        {"ss_weight": 0.8, "rmsd_weight": 1.8},
    )
    assert w["label_smoothing"] == 0.01
    assert w["beta"] == 0.5
    assert w["ss_weight"] == 0.8
    assert w["ss_tv_lambda"] == 0.002


def test_term_ever_active():
    base = {"pdm_weight": 0.0}
    assert not term_ever_active(base, {}, "pdm_weight")
    assert term_ever_active(base, {"pdm_weight": [[0, 0.0], [10, 0.1]]},
                            "pdm_weight")
    assert term_ever_active({"pdm_weight": 0.2}, {}, "pdm_weight")


def test_every_shipped_config_parses_and_schedules_evaluate():
    """Every configs/*.yaml loads through the real loader with the four
    reference sections present, and any epoch schedules interpolate to
    finite floats across their whole range (guards new configs like the
    round-3 fine-tune continuations)."""
    import glob
    import math
    import os

    from pytorch_vae_tpu import config as cfglib

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    paths = sorted(glob.glob(os.path.join(repo, "configs", "*.yaml")))
    assert len(paths) >= 25
    for p in paths:
        cfg = cfglib.load_yaml(p)
        for section in ("model_params", "data_params", "exp_params",
                        "trainer_params"):
            assert section in cfg, f"{p}: missing {section}"
        schedules = cfg["exp_params"].get("schedules", {}) or {}
        max_ep = int(cfg["trainer_params"].get("max_epochs", 1))
        for key, knots in schedules.items():
            for ep in (0, max_ep // 2, max_ep, max_ep + 10):
                v = cfglib.interpolate_schedule({key: knots}, ep)[key]
                assert math.isfinite(float(v)), f"{p}: {key} at {ep}"
