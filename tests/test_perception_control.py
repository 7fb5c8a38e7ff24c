"""Perception / planning / control parity vs the reference kuruma modules."""

import importlib.util
import os
import sys

import numpy as np
import pytest

from fastscnn_tpu.control import VisualLateralErrorController
from fastscnn_tpu.perception import (
    PathPlanner,
    PerspectiveTransformer,
    create_control_map,
    get_builtin_calibration,
    get_corrected_calibration,
    perspective_transform_matrix,
    postprocess_matched_resolution,
    preprocess_matched_resolution,
)
from tests.conftest import REFERENCE_ROOT, requires_reference

KURUMA = os.path.join(REFERENCE_ROOT, "kuruma")


def _load_ref(modname, relpath):
    path = os.path.join(KURUMA, relpath)
    sys.path.insert(0, KURUMA)
    try:
        spec = importlib.util.spec_from_file_location(modname, path)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        return mod
    finally:
        sys.path.remove(KURUMA)


def _synthetic_bev_mask(width=220, height=180, seed=0):
    """Curvy road: drivable band sweeping across the image."""
    rng = np.random.default_rng(seed)
    mask = np.zeros((height, width), np.uint8)
    for y in range(height):
        cx = int(width / 2 + 30 * np.sin(y / 40.0) + rng.integers(-2, 3))
        half = 25 + int(5 * np.cos(y / 25.0))
        mask[y, max(0, cx - half) : min(width, cx + half)] = 255
    return mask


def test_homography_matches_cv2():
    import cv2

    src = [(260, 87), (378, 87), (410, 217), (231, 221)]
    dst = [(0, 0), (21, 0), (21, 29.7), (0, 29.7)]
    ours = perspective_transform_matrix(src, dst)
    theirs = cv2.getPerspectiveTransform(np.float32(src), np.float32(dst))
    np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-5)


@requires_reference
def test_calibration_parity():
    ref_cal = _load_ref("ref_calibration", "core/calibration.py")
    for ours, theirs in (
        (get_builtin_calibration(), ref_cal.get_builtin_calibration()),
        (get_corrected_calibration(), ref_cal.get_corrected_calibration()),
    ):
        np.testing.assert_allclose(
            np.asarray(ours["transform_matrix"]),
            np.asarray(theirs["transform_matrix"]),
            rtol=1e-3, atol=1e-4,
        )
        assert ours["image_points"] == [tuple(p) for p in theirs["image_points"]]


@requires_reference
def test_perspective_transform_parity():
    ref_tf = _load_ref("ref_transform", "vision/transform.py")
    rng = np.random.default_rng(0)
    image = rng.integers(0, 255, (360, 640, 3), dtype=np.uint8)
    mask = _synthetic_bev_mask(640, 360)

    ours_t = PerspectiveTransformer()
    ref_t = ref_tf.PerspectiveTransformer()
    img_o, mask_o, vp_o = ours_t.transform_image_and_mask(image, mask)
    img_r, mask_r, vp_r = ref_t.transform_image_and_mask(image, mask)

    assert vp_o["output_size"] == vp_r["output_size"]
    np.testing.assert_allclose(vp_o["view_bounds"], vp_r["view_bounds"], rtol=1e-4)
    # warps agree except for sub-pixel boundary jitter from f32-vs-f64 matrices
    assert (mask_o == mask_r).mean() > 0.995
    assert np.mean(np.abs(img_o.astype(int) - img_r.astype(int))) < 2.0


@requires_reference
@pytest.mark.parametrize("fast_mode", [False, True])
def test_path_planner_parity(fast_mode):
    ref_tf = _load_ref("ref_transform", "vision/transform.py")
    ref_pp = _load_ref("ref_path_planning", "vision/path_planning.py")
    mask = _synthetic_bev_mask(640, 360)
    image = np.dstack([mask] * 3)

    _, bev_mask, vp = PerspectiveTransformer().transform_image_and_mask(image, mask)
    planner_o = PathPlanner(vp)
    planner_r = ref_pp.PathPlanner(vp)

    data_o = planner_o.plan_complete_path(bev_mask, fast_mode=fast_mode)
    data_r = planner_r.plan_complete_path(bev_mask, fast_mode=fast_mode)

    assert data_o["num_centerline_points"] == data_r["num_centerline_points"]
    assert data_o["centerline_pixels"] == [tuple(p) for p in data_r["centerline_pixels"]]
    np.testing.assert_allclose(data_o["fit_params"], data_r["fit_params"], rtol=1e-4, atol=1e-8)
    np.testing.assert_allclose(
        np.asarray(data_o["waypoints"]), np.asarray(data_r["waypoints"]), rtol=1e-4, atol=1e-6
    )
    assert abs(data_o["path_length"] - data_r["path_length"]) < 1e-6


@requires_reference
def test_controller_parity_with_ema_sequence():
    ref_vc = _load_ref("ref_visual_controller", "control/visual_controller.py")
    ref_tf = _load_ref("ref_transform", "vision/transform.py")
    mask = _synthetic_bev_mask(640, 360)
    image = np.dstack([mask] * 3)
    _, bev_mask, vp = PerspectiveTransformer().transform_image_and_mask(image, mask)
    path_data = PathPlanner(vp).plan_complete_path(bev_mask, fast_mode=True)

    ours = VisualLateralErrorController(ema_alpha=0.4)
    theirs = ref_vc.VisualLateralErrorController(ema_alpha=0.4)
    # several steps so the EMA recursion is exercised
    for _ in range(4):
        r_o = ours.compute_wheel_pwm(path_data, vp)
        r_r = theirs.compute_wheel_pwm(path_data, vp)
        for key in ("lateral_error", "steering_adjustment", "dynamic_pwm", "pwm_left", "pwm_right"):
            a, b = float(r_o[key]), float(r_r[key])
            # f32 (reference homography) vs f64 (ours) propagates ~1e-4 PWM
            # noise through the steering subtraction; PWM is integer-grained.
            assert abs(a - b) <= 1e-3 + 1e-5 * abs(b), key
        assert r_o["turn_direction"] == r_r["turn_direction"]


@requires_reference
def test_preprocessing_parity():
    ref_pre = _load_ref("ref_preprocessing", "core/preprocessing.py")
    rng = np.random.default_rng(1)
    img = rng.integers(0, 255, (480, 800, 3), dtype=np.uint8)
    ours = preprocess_matched_resolution(img, dtype=np.float16)
    theirs = ref_pre.preprocess_matched_resolution(img, dtype=np.float16)
    np.testing.assert_array_equal(ours, theirs)

    logits = rng.standard_normal((1, 2, 360, 640)).astype(np.float32)
    m_o = postprocess_matched_resolution(logits, 800, 480)
    m_r = ref_pre.postprocess_matched_resolution(logits, 800, 480)
    np.testing.assert_array_equal(m_o, m_r)


def test_numpy_warp_fallback_matches_cv2(monkeypatch):
    """The cv2-free inverse-mapping warp must agree with cv2.warpPerspective
    (bilinear within rounding; nearest within boundary jitter)."""
    import fastscnn_tpu.perception.transform as tf_mod

    rng = np.random.default_rng(0)
    image = rng.integers(0, 255, (90, 160, 3), dtype=np.uint8)
    mask = (rng.random((90, 160)) < 0.5).astype(np.uint8) * 255
    matrix = np.asarray(
        [[0.8, 0.1, 5.0], [-0.05, 0.9, 3.0], [0.0002, 0.0001, 1.0]], np.float64
    )
    out_size = (140, 100)

    cv2_img = tf_mod.warp_perspective(image, matrix, out_size)
    cv2_mask = tf_mod.warp_perspective(mask, matrix, out_size, nearest=True)
    monkeypatch.setattr(tf_mod, "_HAS_CV2", False)
    np_img = tf_mod.warp_perspective(image, matrix, out_size)
    np_mask = tf_mod.warp_perspective(mask, matrix, out_size, nearest=True)

    assert np.mean(np.abs(np_img.astype(int) - cv2_img.astype(int))) < 2.0
    assert (np_mask == cv2_mask).mean() > 0.98


def test_control_map_and_json(tmp_path):
    from fastscnn_tpu.perception import save_path_data_json

    mask = _synthetic_bev_mask(640, 360)
    image = np.dstack([mask] * 3)
    _, bev_mask, vp = PerspectiveTransformer().transform_image_and_mask(image, mask)
    cmap, path_data = create_control_map(bev_mask, vp)
    assert cmap.shape == (*bev_mask.shape, 3)
    assert path_data["num_waypoints"] == 20
    out = tmp_path / "path.json"
    save_path_data_json(path_data, str(out))
    import json

    loaded = json.loads(out.read_text())
    assert loaded["num_waypoints"] == 20


def test_controller_ema_hot_update():
    ctrl = VisualLateralErrorController(enable_smoothing=True, ema_alpha=0.5)
    vp = {"view_bounds": (-50, -100, 50, 40), "pixels_per_unit": 20,
          "image_to_world_matrix": get_corrected_calibration()["transform_matrix"]}
    path = {"waypoints": [(5.0, -20.0), (6.0, -40.0)]}
    r1 = ctrl.compute_wheel_pwm(path, vp)
    assert r1["smoothed_lateral_error"] == r1["raw_lateral_error"]  # first call
    ctrl.update_smoothing_params(ema_alpha=0.05)
    assert ctrl.ema_alpha == 0.1  # clamped to [0.1, 1.0]
    ctrl.update_smoothing_params(enable_smoothing=False)
    assert ctrl.ema_lateral_error is None


def test_postprocess_multiclass_does_not_wrap():
    """C>2 argmax must map any non-background class to 255, not wrap in
    uint8 (class 2 -> 254 etc.)."""
    from fastscnn_tpu.perception.preprocessing import postprocess_matched_resolution

    logits = np.zeros((1, 19, 4, 4), np.float32)
    logits[0, 2] = 5.0  # class 2 wins everywhere
    mask = postprocess_matched_resolution(logits, 4, 4)
    assert set(np.unique(mask)) == {255}
    logits[0, 2] = 0.0
    logits[0, 0] = 5.0  # background wins
    mask = postprocess_matched_resolution(logits, 4, 4)
    assert set(np.unique(mask)) == {0}


def test_control_map_grid_actually_draws():
    """Grid lines must land on multiples of 10 inside fractional view
    bounds (the old modulo test never matched)."""
    cv2 = pytest.importorskip("cv2")
    from fastscnn_tpu.perception.path_planning import add_grid_to_control_map

    view_params = {
        "view_bounds": (-86.32, -54.44, 122.35, 54.00),
        "pixels_per_unit": 2,
        "output_size": (418, 217),
    }
    base = np.zeros((217, 418, 3), np.uint8)
    out = add_grid_to_control_map(base.copy(), view_params)
    assert (out != base).any(), "no grid drawn"


def test_pipeline_stops_when_no_centerline():
    """A frame with no drivable area must produce a STOP command (pwm 0),
    not full-base-PWM straight (lateral error defaulting to 0)."""
    from fastscnn_tpu.pipeline import inference_single_image

    class NoRoadSession:
        def infer(self, feeds):
            _, _, h, w = feeds[0].shape
            logits = np.zeros((1, 2, h, w), np.float32)
            logits[0, 0] = 5.0  # background wins everywhere
            return [logits]

    frame = np.random.default_rng(0).integers(0, 255, (360, 640, 3), dtype=np.uint8)
    result = inference_single_image(frame, NoRoadSession(), enable_control=True)
    cr = result["control_result"]
    assert cr["pwm_left"] == 0 and cr["pwm_right"] == 0
    assert cr.get("status") == "no_path_stop"
