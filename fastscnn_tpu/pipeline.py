"""Single-image perception → planning → control pipeline.

Port of the reference monolith's flow
(reference:onnx_single_image_inference.py:346-600, Atlas variant
reference:kuruma/core/inference.py:97-393):

  read image → preprocess → infer (any ``.infer()`` duck-typed session:
  the TPU engine, a StableHLO artifact, or a fake for tests) →
  postprocess to a 0/255 mask → bird's-eye view → control map + path
  planning → wheel-PWM control → save artifacts → per-stage perf report.

Usage::

    python -m fastscnn_tpu.pipeline --input image.jpg \
        --weights weights/fast_scnn_custom.pth --bird-eye \
        --save-control-map --enable-control --output-dir output/
"""

from __future__ import annotations

import argparse
import os

import numpy as np

from fastscnn_tpu.perception import (
    PerspectiveTransformer,
    create_control_map,
    create_visualization,
    postprocess_matched_resolution,
    preprocess_matched_resolution,
    save_path_data_json,
)
from fastscnn_tpu.control import VisualLateralErrorController
from fastscnn_tpu.utils.profiling import PerfTimer

__all__ = ["inference_single_image", "build_session", "parse_args", "main"]


def build_session(args):
    """Create an ``.infer()`` session from CLI args (engine or artifact)."""
    if getattr(args, "export_path", None):
        from fastscnn_tpu.engine.export import load_exported

        return load_exported(args.export_path)
    import jax

    from fastscnn_tpu.engine import E2EConfig, InferenceEngine
    from fastscnn_tpu.models import DATASET_NUM_CLASSES, FastSCNN, init_fast_scnn
    from fastscnn_tpu.utils.checkpoint import load_pth_checkpoint

    num_classes = DATASET_NUM_CLASSES[args.dataset]
    model = FastSCNN(num_classes=num_classes, aux=args.aux)
    if args.weights and os.path.exists(args.weights):
        params, state = load_pth_checkpoint(args.weights, num_classes, aux=args.aux or None)
    else:
        print("warning: random init weights")
        params, state = init_fast_scnn(jax.random.PRNGKey(0), num_classes, args.aux)
    internal = (args.internal_size, args.internal_size) if args.internal_size else None
    # uint8 masks: lossless for every supported dataset (≤255 classes)
    # and quarters the device→host mask transfer — on the realtime
    # loop's per-frame dispatch that is 921→230 KB at 640×360 (the same
    # wire lever as serving's octet-stream masks and eval's pred_dtype)
    return InferenceEngine(
        model, params, state,
        config=E2EConfig(
            internal_size=internal, compute_dtype=args.dtype,
            mask_dtype="uint8" if num_classes <= 255 else "int32",
        ),
    )


def inference_single_image(
    img_bgr: np.ndarray,
    session,
    bird_eye: bool = True,
    save_control_map: bool = True,
    enable_control: bool = True,
    controller: VisualLateralErrorController | None = None,
    transformer: PerspectiveTransformer | None = None,
    pixels_per_unit: int = 20,
    margin_ratio: float = 0.1,
    path_smooth_method: str = "polynomial",
    path_degree: int = 3,
    num_waypoints: int = 20,
    min_road_width: int = 10,
    edge_computing: bool = False,
    output_dir: str | None = None,
    basename: str = "result",
    dtype=np.float32,
    device_mask: bool = True,
):
    """Run the full pipeline on one BGR image; returns a result dict."""
    timer = PerfTimer()
    result: dict = {"perf": timer}

    h, w = img_bgr.shape[:2]
    if device_mask and hasattr(session, "predict"):
        # Engine fast path: argmax runs ON DEVICE inside the jitted E2E
        # graph (the same logits the `.infer()` seam would return — the
        # engine normalizes uint8 input identically), so the host
        # receives a small class mask instead of full-resolution float
        # logits and skips the numpy argmax. Same output as the seam
        # path by construction (gated in tests/test_pipeline_interfaces
        # ::test_device_mask_path_matches_infer_seam); the reference's
        # Atlas loop cannot do this — its NPU graph ends at logits
        # (reference:kuruma/core/inference.py:28-65).
        with timer.stage("preprocess"):
            frame = img_bgr
            if (w, h) != (640, 360):
                from fastscnn_tpu.perception.preprocessing import _resize

                frame = _resize(img_bgr, 640, 360)
            rgb = np.ascontiguousarray(frame[:, :, ::-1])
        with timer.stage("inference"):
            cls_mask = np.asarray(session.predict(rgb))
        with timer.stage("postprocess"):
            mask = np.where(cls_mask > 0, 255, 0).astype(np.uint8)
            if (w, h) != (640, 360):
                from fastscnn_tpu.perception.preprocessing import _resize

                mask = _resize(mask, w, h, nearest=True)
    else:
        with timer.stage("preprocess"):
            tensor = preprocess_matched_resolution(img_bgr, dtype=dtype)
        with timer.stage("inference"):
            logits = session.infer([tensor])[0]
        with timer.stage("postprocess"):
            mask = postprocess_matched_resolution(np.asarray(logits, np.float32), w, h)
    result["mask"] = mask
    result["visualization"] = create_visualization(img_bgr, mask)

    if bird_eye:
        with timer.stage("bird_eye_transform"):
            transformer = transformer or PerspectiveTransformer()
            bev_img, bev_mask, view_params = transformer.transform_image_and_mask(
                img_bgr, mask, pixels_per_unit=pixels_per_unit, margin_ratio=margin_ratio
            )
        result.update(bird_eye_image=bev_img, bird_eye_mask=bev_mask, view_params=view_params)

        if save_control_map or enable_control:
            with timer.stage("path_planning"):
                control_map, path_data = create_control_map(
                    bev_mask,
                    view_params,
                    path_smooth_method=path_smooth_method,
                    path_degree=path_degree,
                    num_waypoints=num_waypoints,
                    min_road_width=min_road_width,
                    edge_computing=edge_computing,
                )
            result.update(control_map=control_map, path_data=path_data)

        if enable_control and result.get("path_data"):
            with timer.stage("control"):
                controller = controller or VisualLateralErrorController()
                if result["path_data"].get("waypoints"):
                    control_result = controller.compute_wheel_pwm(
                        result["path_data"], view_params
                    )
                else:
                    # No centerline found (occluded camera, off-road):
                    # commanding the controller would default lateral
                    # error to 0 and drive STRAIGHT AT FULL BASE PWM with
                    # no road in sight. Command a stop instead.
                    control_result = {
                        "pwm_left": 0,
                        "pwm_right": 0,
                        "lateral_error": None,
                        "steering": 0.0,
                        "turn_direction": "straight",
                        "status": "no_path_stop",
                    }
                result["control_result"] = control_result
                result["control_map"] = controller.generate_control_visualization(
                    result["control_map"], control_result, view_params
                )

    if output_dir:
        with timer.stage("save_artifacts"):
            os.makedirs(output_dir, exist_ok=True)
            _imwrite(os.path.join(output_dir, f"{basename}_mask.png"), mask)
            _imwrite(os.path.join(output_dir, f"{basename}_vis.jpg"), result["visualization"])
            if "control_map" in result:
                _imwrite(os.path.join(output_dir, f"{basename}_control_map.jpg"), result["control_map"])
            if result.get("path_data"):
                save_path_data_json(
                    result["path_data"], os.path.join(output_dir, f"{basename}_path_data.json")
                )
            if result.get("control_result") and controller is not None:
                controller.save_control_data(
                    result["control_result"],
                    os.path.join(output_dir, f"{basename}_control_data.json"),
                )
    return result


def _imwrite(path, img):
    try:
        import cv2

        cv2.imwrite(path, img)
    except Exception:
        from PIL import Image

        arr = img[..., ::-1] if img.ndim == 3 else img
        Image.fromarray(arr).save(path)


def parse_args(argv=None):
    parser = argparse.ArgumentParser(description="Fast-SCNN TPU perception pipeline")
    parser.add_argument("--input", type=str, required=True)
    parser.add_argument("--dataset", type=str, default="custom")
    parser.add_argument("--weights", type=str, default=None)
    parser.add_argument("--export-path", type=str, default=None,
                        help="run a StableHLO artifact instead of the live engine")
    parser.add_argument("--aux", action="store_true", default=False)
    parser.add_argument("--internal-size", type=int, default=0)
    parser.add_argument("--dtype", type=str, default="bfloat16")
    parser.add_argument("--bird-eye", action="store_true", default=True)
    parser.add_argument("--no-bird-eye", dest="bird_eye", action="store_false")
    parser.add_argument("--save-control-map", action="store_true", default=True)
    parser.add_argument("--no-save-control-map", dest="save_control_map",
                        action="store_false")
    parser.add_argument("--enable-control", action="store_true", default=True)
    parser.add_argument("--no-enable-control", dest="enable_control",
                        action="store_false")
    parser.add_argument("--edge-computing", action="store_true", default=False)
    parser.add_argument("--pixels-per-unit", type=int, default=20)
    parser.add_argument("--margin-ratio", type=float, default=0.1)
    parser.add_argument("--path-smooth-method", default="polynomial",
                        choices=["polynomial", "spline"])
    parser.add_argument("--path-degree", type=int, default=3)
    parser.add_argument("--num-waypoints", type=int, default=20)
    parser.add_argument("--min-road-width", type=int, default=10)
    parser.add_argument("--calibration", type=str, default=None,
                        help="external calibration JSON (reference:onnx_bird_eye_inference.py "
                             "pattern); default: built-in corrected A4 calibration")
    parser.add_argument("--output-dir", type=str, default="./output")
    # controller gains (reference:kuruma/kuruma_control_dashboard.py flags)
    parser.add_argument("--steering-gain", type=float, default=50.0)
    parser.add_argument("--base-pwm", type=float, default=300)
    parser.add_argument("--curvature-damping", type=float, default=0.1)
    parser.add_argument("--preview-distance", type=float, default=30.0)
    parser.add_argument("--ema-alpha", type=float, default=0.5)
    parser.add_argument("--disable-smoothing", action="store_true", default=False)
    return parser.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)
    try:
        import cv2

        img = cv2.imread(args.input)
    except Exception:
        from PIL import Image

        img = np.asarray(Image.open(args.input).convert("RGB"))[:, :, ::-1].copy()
    if img is None:
        raise SystemExit(f"cannot read {args.input}")

    session = build_session(args)
    transformer = None
    if args.calibration:
        import json as _json

        with open(args.calibration) as f:
            transformer = PerspectiveTransformer(_json.load(f))
    controller = VisualLateralErrorController(
        steering_gain=args.steering_gain,
        base_pwm=args.base_pwm,
        curvature_damping=args.curvature_damping,
        preview_distance=args.preview_distance,
        ema_alpha=args.ema_alpha,
        enable_smoothing=not args.disable_smoothing,
    )
    basename = os.path.splitext(os.path.basename(args.input))[0]
    result = inference_single_image(
        img,
        session,
        bird_eye=args.bird_eye,
        save_control_map=args.save_control_map,
        enable_control=args.enable_control,
        controller=controller,
        transformer=transformer,
        pixels_per_unit=args.pixels_per_unit,
        margin_ratio=args.margin_ratio,
        path_smooth_method=args.path_smooth_method,
        path_degree=args.path_degree,
        num_waypoints=args.num_waypoints,
        min_road_width=args.min_road_width,
        edge_computing=args.edge_computing,
        output_dir=args.output_dir,
        basename=basename,
    )
    result["perf"].print_performance_analysis("single-image pipeline")
    if result.get("control_result"):
        cr = result["control_result"]
        if cr.get("lateral_error") is None:  # no-path safety stop
            print("control: no centerline found -> STOP (pwm 0/0)")
        else:
            print(
                f"control: error {cr['lateral_error']:+.1f} cm -> "
                f"L {cr['pwm_left']:+.0f} R {cr['pwm_right']:+.0f} PWM "
                f"({cr['turn_direction']})"
            )
    return result


if __name__ == "__main__":
    main()
