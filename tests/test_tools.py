"""Dataset tools, mask editor core, calibration tools, analyzers, annotation."""

import json
import os

import numpy as np
import pytest
from PIL import Image

from fastscnn_tpu.tools.analyzers import ControlLatencyAnalyzer, analyze_training_log
from fastscnn_tpu.tools.annotation_server import AnnotationServer, save_mask_from_base64
from fastscnn_tpu.tools.calibration_tools import batch_bev, calibrate_from_points
from fastscnn_tpu.tools.dataset_tools import (
    augment_dataset,
    convert_lane_to_drivable_mask,
    dedupe_images,
)
from fastscnn_tpu.tools.mask_editor import MaskCanvas


def test_augment_dataset(tmp_path):
    (tmp_path / "images").mkdir()
    (tmp_path / "masks").mkdir()
    img = np.zeros((10, 20, 3), np.uint8)
    img[:, :10] = 255
    mask = np.zeros((10, 20), np.uint8)
    mask[:, :10] = 255
    Image.fromarray(img).save(tmp_path / "images" / "a.jpg")
    Image.fromarray(mask).save(tmp_path / "masks" / "a.png")
    n = augment_dataset(str(tmp_path / "images"), str(tmp_path / "masks"))
    assert n == 1
    flipped = np.asarray(Image.open(tmp_path / "masks" / "a_flipped.png"))
    assert flipped[:, :10].sum() == 0 and (flipped[:, 10:] == 255).all()
    # idempotent
    assert augment_dataset(str(tmp_path / "images"), str(tmp_path / "masks")) == 0


def test_convert_lane_to_drivable():
    mask = np.zeros((20, 40), np.uint8)
    mask[:, 5] = 255  # left lane line
    mask[:, 30] = 255  # right lane line
    out = convert_lane_to_drivable_mask(mask, dilate_iterations=1)
    # filled between the lines
    assert (out[10, 8:28] == 255).all()
    assert out[10, 0] == 0 and out[10, 39] == 0


def test_dedupe_images(tmp_path):
    a = tmp_path / "a.jpg"
    b = tmp_path / "b.jpg"
    c = tmp_path / "c.jpg"
    a.write_bytes(b"samecontent")
    b.write_bytes(b"samecontent")
    c.write_bytes(b"different")
    dups = dedupe_images(str(tmp_path), delete=True)
    assert dups == {str(a): [str(b)]}
    assert not b.exists() and a.exists() and c.exists()


def test_mask_canvas_ops():
    c = MaskCanvas(40, 60)
    c.brush(10, 10, 5)
    assert c.mask[10, 10] == 255 and c.mask[10, 16] == 0
    c.rectangle(20, 20, 30, 30)
    assert c.mask[25, 25] == 255
    c.polygon([(40, 5), (55, 5), (55, 15), (40, 15)])
    assert c.mask[10, 50] == 255
    # undo unwinds in order
    assert c.undo()
    assert c.mask[10, 50] == 0 and c.mask[25, 25] == 255
    assert c.redo()
    assert c.mask[10, 50] == 255
    c.clear()
    assert c.mask.sum() == 0
    c.undo()
    assert c.mask[10, 10] == 255


def test_mask_canvas_flood_fill():
    c = MaskCanvas(20, 20)
    # draw a closed box border
    c.mask[5, 5:15] = 255
    c.mask[14, 5:15] = 255
    c.mask[5:15, 5] = 255
    c.mask[5:15, 14] = 255
    c.flood_fill(10, 10, 255)
    assert c.mask[10, 10] == 255
    assert c.mask[2, 2] == 0  # outside untouched


def test_calibrate_from_points_and_batch_bev(tmp_path):
    cal = calibrate_from_points([(260, 87), (378, 87), (410, 217), (231, 221)])
    m = np.asarray(cal["transform_matrix"])
    # marker corners project to the marker rectangle
    for (ix, iy), (wx, wy) in zip(cal["image_points"], cal["world_points"]):
        p = m @ [ix, iy, 1]
        assert abs(p[0] / p[2] - wx) < 1e-6
        assert abs(p[1] / p[2] - wy) < 1e-6

    (tmp_path / "in").mkdir()
    img = np.zeros((360, 640, 3), np.uint8)
    img[200:300, 200:400] = 200
    Image.fromarray(img).save(tmp_path / "in" / "x.jpg")
    n = batch_bev(str(tmp_path / "in"), str(tmp_path / "out"))
    assert n == 1
    assert (tmp_path / "out" / "x_bev.png").exists()


def test_analyze_training_log(tmp_path):
    records = [
        {"epoch": 0, "train_loss": 1.0, "lr": 0.01, "pix_acc": 0.8, "miou": 0.4,
         "combined_metric": 0.6, "samples_per_sec": 100},
        {"epoch": 1, "train_loss": 0.5, "lr": 0.005, "pix_acc": 0.9, "miou": 0.6,
         "combined_metric": 0.75, "samples_per_sec": 110},
    ]
    path = tmp_path / "log.json"
    path.write_text(json.dumps(records))
    s = analyze_training_log(str(path))
    assert s["epochs"] == 2
    assert s["best_epoch"] == 1
    assert s["mean_samples_per_sec"] == 105


def test_control_latency_analyzer():
    a = ControlLatencyAnalyzer()
    t = 100.0
    for i in range(10):
        a.record_send(0.002, now=t)
        t += 0.1
    s = a.stats()
    assert s["sends"] == 10
    assert abs(s["interval_mean_ms"] - 100) < 1e-6
    assert abs(s["effective_hz"] - 10) < 1e-6
    assert "latency_p95_ms" in s
    assert "WARNING" not in a.report()


def test_save_mask_from_base64(tmp_path):
    import base64
    import io

    # a 4x4 canvas with 2 painted pixels (alpha > 0)
    rgba = np.zeros((4, 4, 4), np.uint8)
    rgba[1, 1] = [255, 0, 0, 200]
    rgba[2, 2] = [255, 0, 0, 10]
    bio = io.BytesIO()
    Image.fromarray(rgba).save(bio, "PNG")
    b64 = base64.b64encode(bio.getvalue()).decode()
    out = tmp_path / "m.png"
    n = save_mask_from_base64(b64, str(out))
    assert n == 2
    mask = np.asarray(Image.open(out))
    assert mask[1, 1] == 255 and mask[0, 0] == 0


def test_annotation_server_roundtrip(tmp_path):
    import base64
    import io
    import urllib.request

    images = tmp_path / "images"
    masks = tmp_path / "masks"
    images.mkdir()
    Image.fromarray(np.zeros((8, 8, 3), np.uint8)).save(images / "x.jpg")
    server = AnnotationServer(str(images), str(masks), host="127.0.0.1", port=0)
    port = server.start()
    try:
        base = f"http://127.0.0.1:{port}"
        listing = json.loads(urllib.request.urlopen(f"{base}/api/images", timeout=5).read())
        assert listing == [{"name": "x.jpg", "has_mask": False}]
        raw = urllib.request.urlopen(f"{base}/image/x.jpg", timeout=5).read()
        assert Image.open(io.BytesIO(raw)).size == (8, 8)
        # save a painted mask
        rgba = np.zeros((8, 8, 4), np.uint8)
        rgba[:4, :, 3] = 255
        bio = io.BytesIO()
        Image.fromarray(rgba).save(bio, "PNG")
        req = urllib.request.Request(
            f"{base}/api/save_mask",
            data=json.dumps(
                {"name": "x.jpg", "mask_png_base64": base64.b64encode(bio.getvalue()).decode()}
            ).encode(),
            method="POST",
        )
        resp = json.loads(urllib.request.urlopen(req, timeout=5).read())
        assert "saved" in resp["status"]
        saved = np.asarray(Image.open(masks / "x.png"))
        assert (saved[:4] == 255).all() and (saved[4:] == 0).all()
        listing = json.loads(urllib.request.urlopen(f"{base}/api/images", timeout=5).read())
        assert listing[0]["has_mask"] is True
    finally:
        server.stop()


def test_annotation_server_improved_features(tmp_path):
    """Mask editing + auto-fill + batch ops — the improved_web_annotation
    feature set (reference:improved_web_annotation.py:1-12)."""
    import base64
    import io
    import urllib.error
    import urllib.request

    images = tmp_path / "images"
    masks = tmp_path / "masks"
    images.mkdir()
    masks.mkdir()
    Image.fromarray(np.zeros((8, 8, 3), np.uint8)).save(images / "a.jpg")
    # an exact duplicate image for the dedupe batch op
    Image.fromarray(np.zeros((8, 8, 3), np.uint8)).save(images / "b.jpg")
    # an existing mask to load back for editing
    m = np.zeros((8, 8), np.uint8)
    m[2:4] = 255
    Image.fromarray(m).save(masks / "a.png")

    server = AnnotationServer(str(images), str(masks), host="127.0.0.1", port=0)
    port = server.start()

    def post(path, payload):
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}{path}",
            data=json.dumps(payload).encode(),
            method="POST",
        )
        return json.loads(urllib.request.urlopen(req, timeout=5).read())

    try:
        base = f"http://127.0.0.1:{port}"
        # existing mask loads as a red RGBA overlay
        raw = urllib.request.urlopen(f"{base}/mask/a.jpg", timeout=5).read()
        overlay = np.asarray(Image.open(io.BytesIO(raw)).convert("RGBA"))
        assert (overlay[2:4, :, 3] == 255).all() and (overlay[2:4, :, 0] == 255).all()
        assert (overlay[0, :, 3] == 0).all()
        with pytest.raises(urllib.error.HTTPError):
            urllib.request.urlopen(f"{base}/mask/nope.jpg", timeout=5)

        # auto-fill: two vertical lane lines -> filled region between them
        rgba = np.zeros((8, 8, 4), np.uint8)
        rgba[:, 1, 3] = 255
        rgba[:, 6, 3] = 255
        bio = io.BytesIO()
        Image.fromarray(rgba).save(bio, "PNG")
        resp = post(
            "/api/auto_fill",
            {"mask_png_base64": base64.b64encode(bio.getvalue()).decode(), "dilate": 0},
        )
        filled = np.asarray(
            Image.open(io.BytesIO(base64.b64decode(resp["overlay_png_base64"])))
        )
        assert (filled[:, 1:7, 3] == 255).all()  # between-lines region filled
        assert (filled[:, 0, 3] == 0).all()

        # batch: delete mask
        resp = post("/api/batch", {"op": "delete_mask", "name": "a.jpg"})
        assert "deleted" in resp["status"]
        assert not (masks / "a.png").exists()

        # batch: dedupe removes the duplicate image
        resp = post("/api/batch", {"op": "dedupe"})
        assert "1 duplicate" in resp["status"]
        assert (images / "a.jpg").exists() and not (images / "b.jpg").exists()

        # batch: lane2drivable over all saved masks
        lane = np.zeros((8, 8), np.uint8)
        lane[:, 2] = 255
        lane[:, 5] = 255
        Image.fromarray(lane).save(masks / "c.png")
        resp = post("/api/batch", {"op": "lane2drivable_all"})
        assert "converted 1" in resp["status"]
        conv = np.asarray(Image.open(masks / "c.png"))
        assert (conv[:, 2:6] == 255).all()
    finally:
        server.stop()


def test_dedupe_batch_op_remaps_orphan_masks(tmp_path):
    """Deleting a duplicate image must not orphan its annotation: the mask
    moves to the kept image (or is dropped if the kept one has a mask)."""
    import urllib.request

    images = tmp_path / "images"
    masks = tmp_path / "masks"
    images.mkdir()
    masks.mkdir()
    Image.fromarray(np.zeros((8, 8, 3), np.uint8)).save(images / "a.jpg")
    import shutil

    shutil.copy(images / "a.jpg", images / "b.jpg")  # byte-identical dup
    m = np.zeros((8, 8), np.uint8)
    m[1:3] = 255
    Image.fromarray(m).save(masks / "b.png")  # only the DUP was annotated

    server = AnnotationServer(str(images), str(masks), host="127.0.0.1", port=0)
    port = server.start()
    try:
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/api/batch",
            data=json.dumps({"op": "dedupe"}).encode(),
            method="POST",
        )
        resp = json.loads(urllib.request.urlopen(req, timeout=5).read())
        assert "remapped 1 masks" in resp["status"]
        assert not (images / "b.jpg").exists()
        assert not (masks / "b.png").exists()
        remapped = np.asarray(Image.open(masks / "a.png"))
        assert (remapped[1:3] == 255).all()
    finally:
        server.stop()


def test_editor_session_navigation_and_save(tmp_path):
    """EditorSession: image discovery, mask auto-load, prev/next bounds,
    save convention <masks>/<stem>.png — the headless half of the
    reference's interactive editor (reference:interactive_mask_editor.py:43-95,353-367)."""
    from PIL import Image

    from fastscnn_tpu.tools.mask_editor import EditorSession

    imgs = tmp_path / "images"
    masks = tmp_path / "masks"
    imgs.mkdir()
    masks.mkdir()
    rng = np.random.default_rng(0)
    for name in ("b.jpg", "a.png", "c.jpeg", "skip.txt"):
        if name.endswith(".txt"):
            (imgs / name).write_text("not an image")
        else:
            Image.fromarray(rng.integers(0, 255, (12, 16, 3), dtype=np.uint8)).save(imgs / name)
    # pre-existing mask for 'a' (different size: must be nearest-resized)
    Image.fromarray(np.full((6, 8), 255, np.uint8)).save(masks / "a.png")

    sess = EditorSession(str(imgs), str(masks))
    assert [os.path.basename(p) for p in sess.image_files] == ["a.png", "b.jpg", "c.jpeg"]
    # existing mask loaded and resized to the image's shape
    assert sess.canvas.mask.shape == (12, 16)
    assert sess.canvas.mask.max() == 255
    assert not sess.prev()  # at first image
    assert sess.next()
    assert os.path.basename(sess.current_image_path) == "b.jpg"
    assert sess.canvas.mask.max() == 0  # no mask for b yet
    # paint + save follows the <stem>.png convention
    sess.canvas.rectangle(2, 3, 10, 9)
    saved = sess.save()
    assert saved == str(masks / "b.png")
    reloaded = np.array(Image.open(saved))
    assert reloaded[5, 5] == 255 and reloaded[0, 0] == 0
    assert sess.next() and not sess.next()  # c is last
    # overlay blends painted pixels only
    sess.canvas.brush(4, 4, 2)
    ov = sess.overlay()
    assert ov.shape == (12, 16, 3)
    assert not np.array_equal(ov[4, 4], sess.image[4, 4])
    assert np.array_equal(ov[11, 15], sess.image[11, 15])


def test_ab_report_parses_and_summarizes(tmp_path, capsys):
    """ab_report: per-impl medians + interleaved per-rep deltas from a
    synthetic ab_stem log."""
    from tools.ab_report import main as ab_main

    log = tmp_path / "ab.log"
    log.write_text(
        "\n".join(
            [
                "--- rep 1 dw_impl=conv",
                '{"metric": "x", "value": 1570.0, "unit": "fps/chip"}',
                "--- rep 1 dw_impl=taps",
                '{"metric": "x", "value": 1650.0, "unit": "fps/chip"}',
                "--- rep 2 dw_impl=conv",
                '{"metric": "x", "value": 1560.0, "unit": "fps/chip"}',
                "--- rep 2 dw_impl=taps",
                '{"metric": "x", "value": 1640.0, "unit": "fps/chip"}',
                "--- rep 1 stem_impl=xla",
                '{"metric": "t", "value": 400.0, "unit": "samples/sec/chip"}',
                "--- rep 1 stem_impl=taps",
                '{"metric": "t", "value": 520.0, "unit": "samples/sec/chip"}',
                "not json",
            ]
        )
    )
    import sys

    argv = sys.argv
    sys.argv = ["ab_report.py", str(log)]
    try:
        ab_main()
    finally:
        sys.argv = argv
    out = capsys.readouterr().out
    assert "fps/chip" in out and "samples/sec/chip" in out
    assert "+5.1% vs conv" in out
    assert "rep 1 vs conv: taps +5.1%" in out
    assert "+30.0% vs xla" in out
