"""LR schedule tests: onecycle shape, epoch-knot semantics, cosine."""

import numpy as np

from pytorch_vae_tpu.training.optim import (
    build_lr_schedule,
    epoch_knot_schedule,
    onecycle_cos_schedule,
)


def test_onecycle_shape_and_endpoints():
    s = onecycle_cos_schedule(1000, max_lr=0.004, pct_start=0.12,
                              div_factor=20.0, final_div_factor=5000.0)
    assert abs(float(s(0)) - 0.004 / 20) < 1e-9
    peak_step = int(0.12 * 1000)
    assert abs(float(s(peak_step)) - 0.004) < 1e-5
    assert float(s(1000)) < 1e-6  # ~ init/5000
    # monotone up then down
    ramp = [float(s(i)) for i in range(0, peak_step, 10)]
    assert all(b >= a - 1e-9 for a, b in zip(ramp, ramp[1:]))
    fall = [float(s(i)) for i in range(peak_step, 1001, 25)]
    assert all(b <= a + 1e-9 for a, b in zip(fall, fall[1:]))


def test_onecycle_finite_at_tiny_steps():
    # optax.cosine_onecycle_schedule NaNs here; ours must not
    for T in (1, 2, 3, 6):
        s = onecycle_cos_schedule(T, 1e-3)
        vals = [float(s(i)) for i in range(T + 2)]
        assert all(np.isfinite(v) for v in vals), (T, vals)


def test_epoch_knot_schedule_constant_within_epoch():
    # reference sets LR once per epoch from the knots (experiment.py:339-343)
    pairs = [[0, 2e-4], [30, 2e-4], [180, 1e-4], [200, 2e-5]]
    fn = epoch_knot_schedule(pairs, steps_per_epoch=10)
    assert abs(float(fn(0)) - 2e-4) < 1e-9
    assert float(fn(5)) == float(fn(0))  # same epoch -> same LR
    # epoch 105 is halfway between knots 30 and 180
    v = float(fn(105 * 10))
    expected = 2e-4 + (105 - 30) / (180 - 30) * (1e-4 - 2e-4)
    assert abs(v - expected) < 1e-8
    assert abs(float(fn(250 * 10)) - 2e-5) < 1e-9  # past last knot


def test_build_lr_schedule_modes():
    none_fn = build_lr_schedule({"LR": 0.01, "lr_scheduler": "none"}, 10, 5)
    assert abs(float(none_fn(0)) - 0.01) < 1e-8 and float(none_fn(0)) == float(none_fn(49))
    cos_fn = build_lr_schedule({"LR": 0.01, "lr_scheduler": "cosine"},
                               10, 5)
    assert abs(float(cos_fn(0)) - 0.01) < 1e-8
    assert float(cos_fn(50)) < 1e-6
    manual = build_lr_schedule(
        {"LR": 0.01, "schedules": {"LR": [[0, 0.5], [10, 0.1]]}}, 4, 20)
    assert abs(float(manual(0)) - 0.5) < 1e-7
    assert abs(float(manual(4 * 20)) - 0.1) < 1e-7
