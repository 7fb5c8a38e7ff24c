"""Dataset diagnostics + the EMA input-vs-output smoothing study.

The EMA test reproduces reference:test_ema_optimization.py's claim: for
the nonlinear control law pwm = base/(1+c·|e|), smoothing the *input*
error (what the kuruma controller does) tracks the noiseless control
signal better than smoothing the *output* PWM."""

import numpy as np
import pytest
from PIL import Image

from fastscnn_tpu.tools.dataset_check import check_masks, make_overlay_grid


@pytest.fixture
def pairs(tmp_path):
    (tmp_path / "images").mkdir()
    (tmp_path / "masks").mkdir()
    rng = np.random.default_rng(0)
    for i in range(4):
        Image.fromarray(rng.integers(0, 255, (32, 40, 3), dtype=np.uint8)).save(
            tmp_path / "images" / f"p{i}.jpg"
        )
        mask = np.zeros((32, 40), np.uint8)
        if i != 2:  # p2 stays empty on purpose
            mask[16:, :] = 255
        Image.fromarray(mask).save(tmp_path / "masks" / f"p{i}.png")
    # size-mismatched pair
    Image.fromarray(np.zeros((10, 10, 3), np.uint8)).save(tmp_path / "images" / "bad.jpg")
    Image.fromarray(np.zeros((32, 40), np.uint8)).save(tmp_path / "masks" / "bad.png")
    return tmp_path


def test_check_masks(pairs):
    reports = {r["name"]: r for r in check_masks(str(pairs / "images"), str(pairs / "masks"))}
    assert reports["p0.png"]["issues"] == []
    assert "empty mask" in reports["p2.png"]["issues"]
    assert any("size mismatch" in i for i in reports["bad.png"]["issues"])
    assert any("empty" in i for i in reports["bad.png"]["issues"])


def test_overlay_grid(tmp_path):
    (tmp_path / "gi").mkdir()
    (tmp_path / "gm").mkdir()
    rng = np.random.default_rng(1)
    for i in range(4):
        Image.fromarray(rng.integers(0, 255, (32, 40, 3), dtype=np.uint8)).save(
            tmp_path / "gi" / f"p{i}.jpg"
        )
        mask = np.zeros((32, 40), np.uint8)
        mask[16:, :] = 255
        Image.fromarray(mask).save(tmp_path / "gm" / f"p{i}.png")
    out = make_overlay_grid(
        str(tmp_path / "gi"), str(tmp_path / "gm"), str(tmp_path / "grid.jpg"), max_samples=4
    )
    grid = np.asarray(Image.open(out))
    assert grid.shape == (2 * 32, 3 * 40, 3)


def test_ema_input_smoothing_beats_output_smoothing():
    """reference:test_ema_optimization.py's comparison, as an assertion."""
    rng = np.random.default_rng(0)
    steps = 400
    t = np.arange(steps)
    true_error = 8.0 * np.sin(t / 40.0)
    noisy_error = true_error + rng.normal(0, 2.0, steps)
    alpha = 0.3
    base_pwm, damping, gain = 500.0, 0.1, 10.0

    def pwm_pair(e):
        dyn = base_pwm / (1 + damping * abs(e))
        steer = gain * e
        return dyn + steer, dyn - steer

    # strategy A (kuruma/ours): smooth the input error, then compute PWM
    ema = None
    a_left = []
    for e in noisy_error:
        ema = e if ema is None else alpha * e + (1 - alpha) * ema
        a_left.append(pwm_pair(ema)[0])
    # strategy B: compute PWM from raw error, then smooth the output
    ema_l = None
    b_left = []
    for e in noisy_error:
        l, _ = pwm_pair(e)
        ema_l = l if ema_l is None else alpha * l + (1 - alpha) * ema_l
        b_left.append(ema_l)
    ideal_left = np.asarray([pwm_pair(e)[0] for e in true_error])

    err_a = np.sqrt(np.mean((np.asarray(a_left) - ideal_left) ** 2))
    err_b = np.sqrt(np.mean((np.asarray(b_left) - ideal_left) ** 2))
    # input smoothing commutes with the nonlinearity better
    assert err_a < err_b
