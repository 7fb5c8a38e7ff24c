"""Batching inference server: micro-batching behavior + HTTP surface."""

import io
import json
import threading
import time
import urllib.request

import numpy as np
import pytest
from PIL import Image

from fastscnn_tpu.serving import BatchingPredictor, ServingServer


def _slow_predictor(calls):
    """Fake batch predictor: mask = mean-intensity threshold; records batches."""

    def predict(batch):
        calls.append(batch.shape[0])
        time.sleep(0.03)  # make batching worthwhile
        return (batch.mean(axis=-1) > 127).astype(np.int32)

    return predict


def test_batching_groups_concurrent_requests():
    calls = []
    predictor = BatchingPredictor(
        _slow_predictor(calls), input_size=(16, 16), max_batch=4, max_delay_ms=30
    )
    try:
        images = [np.full((16, 16, 3), v, np.uint8) for v in (0, 255, 0, 255, 255, 0)]
        results = [None] * len(images)

        def call(i):
            results[i] = predictor.predict(images[i])

        threads = [threading.Thread(target=call, args=(i,)) for i in range(len(images))]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        for i, img in enumerate(images):
            expected = 1 if img[0, 0, 0] > 127 else 0
            assert (results[i] == expected).all()
        stats = predictor.get_stats()
        assert stats["requests"] == 6
        # concurrency produced at least one multi-request batch
        assert stats["batches"] < 6
        assert stats["mean_batch_size"] > 1
        assert "latency_ms_p50" in stats
    finally:
        predictor.stop()


def test_predict_resizes_input():
    predictor = BatchingPredictor(
        lambda b: (b.mean(-1) > 127).astype(np.int32), input_size=(16, 16), max_batch=2,
        max_delay_ms=1,
    )
    try:
        big = np.full((64, 48, 3), 255, np.uint8)
        mask = predictor.predict(big)
        assert mask.shape == (16, 16)
        assert (mask == 1).all()
    finally:
        predictor.stop()


def test_http_server_roundtrip():
    calls = []
    predictor = BatchingPredictor(
        _slow_predictor(calls), input_size=(16, 16), max_batch=4, max_delay_ms=10
    )
    server = ServingServer(predictor, palette_dataset="citys", host="127.0.0.1", port=0)
    port = server.start()
    try:
        base = f"http://127.0.0.1:{port}"
        health = json.loads(urllib.request.urlopen(f"{base}/healthz", timeout=5).read())
        assert health == {"status": "ok"}

        img = Image.fromarray(np.full((16, 16, 3), 255, np.uint8))
        bio = io.BytesIO()
        img.save(bio, "PNG")

        # PNG mask response
        req = urllib.request.Request(f"{base}/predict", data=bio.getvalue(), method="POST")
        resp = urllib.request.urlopen(req, timeout=10)
        assert resp.headers["Content-Type"] == "image/png"
        mask_img = Image.open(io.BytesIO(resp.read()))
        assert mask_img.size == (16, 16)

        # JSON mask response
        req = urllib.request.Request(
            f"{base}/predict",
            data=bio.getvalue(),
            method="POST",
            headers={"Accept": "application/json"},
        )
        payload = json.loads(urllib.request.urlopen(req, timeout=10).read())
        assert np.asarray(payload["mask"]).shape == (16, 16)

        stats = json.loads(urllib.request.urlopen(f"{base}/stats", timeout=5).read())
        assert stats["requests"] >= 2
        # system-monitor payload mirrors the dashboard's /api/stats
        assert "cpu_percent" in stats["system"]
        assert stats["device"].get("platform") == "cpu"

        # malformed body → 400
        req = urllib.request.Request(f"{base}/predict", data=b"not an image", method="POST")
        with pytest.raises(urllib.error.HTTPError) as exc:
            urllib.request.urlopen(req, timeout=5)
        assert exc.value.code == 400
    finally:
        server.stop()


def test_serving_with_real_engine():
    """Full stack: BatchingPredictor over a real (random-weight) engine."""
    import jax

    from fastscnn_tpu.engine import E2EConfig, InferenceEngine
    from fastscnn_tpu.models import FastSCNN, init_fast_scnn

    model = FastSCNN(num_classes=2)
    params, state = init_fast_scnn(jax.random.PRNGKey(0), 2)
    engine = InferenceEngine(model, params, state, config=E2EConfig(compute_dtype="float32"))
    fn = engine.predict_fn((2, 32, 48, 3))
    predictor = BatchingPredictor(lambda b: fn(b), input_size=(32, 48), max_batch=2,
                                  max_delay_ms=5)
    try:
        rng = np.random.default_rng(0)
        mask = predictor.predict(rng.integers(0, 255, (32, 48, 3)).astype(np.uint8))
        assert mask.shape == (32, 48)
        assert set(np.unique(mask)).issubset({0, 1})
    finally:
        predictor.stop()


def test_pipeline_overlaps_dispatch_and_gather():
    """Batch i+1 must dispatch while batch i's (slow) device->host gather is
    still in progress — the two-thread pipeline, not a serial worker."""
    dispatch_times = []

    class LazyResult:
        """Mimics a JAX device array: creation is instant (async dispatch),
        the value becomes available 0.2 s after dispatch, and np.asarray
        blocks until then (device->host materialization)."""

        def __init__(self):
            self.ready_at = time.perf_counter() + 0.2

        def __array__(self, dtype=None, copy=None):
            delay = self.ready_at - time.perf_counter()
            if delay > 0:
                time.sleep(delay)
            return np.zeros((1, 4, 4), np.int32)

    def predict(batch):
        dispatch_times.append(time.perf_counter())
        return LazyResult()

    predictor = BatchingPredictor(
        predict, input_size=(4, 4), max_batch=1, max_delay_ms=1, pipeline_depth=2
    )
    try:
        img = np.zeros((4, 4, 3), np.uint8)
        results = [None, None]

        def call(i):
            results[i] = predictor.predict(img, timeout=10)

        threads = [threading.Thread(target=call, args=(i,)) for i in range(2)]
        t0 = time.perf_counter()
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        elapsed = time.perf_counter() - t0
        assert all(r is not None and r.shape == (4, 4) for r in results)
        assert len(dispatch_times) == 2
        # second dispatch happened while the first gather (0.2 s) was blocking
        assert dispatch_times[1] - dispatch_times[0] < 0.15, dispatch_times
        # and the total is ~one gather + epsilon, not two serial gathers
        assert elapsed < 0.38, elapsed
    finally:
        predictor.stop()


def test_serving_main_data_parallel_smoke(tmp_path):
    """`--data-parallel 4` on the virtual CPU mesh: main() builds a 'data'
    mesh, the batching predictor serves a sharded engine end-to-end."""
    import urllib.request

    # main()'s CLI path joins forever, so assemble the same objects main()
    # builds in its --data-parallel branch and drive the HTTP surface
    import jax
    from jax.sharding import Mesh

    from fastscnn_tpu.engine import E2EConfig, InferenceEngine
    from fastscnn_tpu.models import FastSCNN, init_fast_scnn

    devices = jax.devices()[:4]
    mesh = Mesh(np.array(devices), ("data",))
    model = FastSCNN(num_classes=2)
    params, state = init_fast_scnn(jax.random.PRNGKey(0), 2, False)
    engine = InferenceEngine(
        model, params, state, config=E2EConfig(compute_dtype="float32"), mesh=mesh
    )
    fn = engine.predict_fn((4, 32, 32, 3))
    predictor = BatchingPredictor(lambda b: fn(b), (32, 32), max_batch=4, max_delay_ms=5)
    server = ServingServer(predictor, "custom", host="127.0.0.1", port=0)
    port = server.start()
    try:
        img = np.random.randint(0, 255, (32, 32, 3), np.uint8)
        bio = io.BytesIO()
        Image.fromarray(img).save(bio, "PNG")
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/predict",
            data=bio.getvalue(),
            headers={"Accept": "application/json"},
            method="POST",
        )
        resp = json.loads(urllib.request.urlopen(req, timeout=60).read())
        assert np.asarray(resp["mask"]).shape == (32, 32)
    finally:
        server.stop()


def test_stop_with_full_pipeline_fails_fast_and_joins():
    """stop() while the completer is wedged must not hang the dispatcher
    or leave queued clients waiting out their full timeout."""

    class NeverReady:
        def __array__(self, dtype=None, copy=None):
            time.sleep(5.0)  # wedged device->host gather
            return np.zeros((1, 4, 4), np.int32)

    predictor = BatchingPredictor(
        lambda b: NeverReady(), input_size=(4, 4), max_batch=1, max_delay_ms=1,
        pipeline_depth=1,
    )
    img = np.zeros((4, 4, 3), np.uint8)
    errors = []

    def call():
        try:
            predictor.predict(img, timeout=8.0)
        except Exception as e:
            errors.append(e)

    # enough requests to fill: 1 gathering + 1 inflight + 1 blocking put + queued
    threads = [threading.Thread(target=call) for _ in range(4)]
    for t in threads:
        t.start()
    time.sleep(0.5)  # let the pipeline wedge
    t0 = time.perf_counter()
    predictor.stop()
    stop_took = time.perf_counter() - t0
    for t in threads:
        t.join(timeout=10)
    assert not any(t.is_alive() for t in threads)
    # stop() returns promptly (bounded by the join timeouts, not the 5 s gather)
    assert stop_took < 5.0, stop_took
    # nobody waited out the 8 s client timeout: the batch mid-gather may
    # still complete with a result; everyone else fails fast
    assert not any(isinstance(e, TimeoutError) for e in errors), errors
    assert len(errors) >= 3
    assert all(isinstance(e, RuntimeError) for e in errors), errors


def test_bucketed_padding_picks_smallest_bucket():
    """bucket_sizes: a lone request pads to bucket 1, a 3-request burst to
    bucket 4 — never to max_batch."""
    shapes = []

    def predict(batch):
        shapes.append(batch.shape[0])
        time.sleep(0.03)
        return (batch.mean(-1) > 127).astype(np.int32)

    predictor = BatchingPredictor(
        predict, input_size=(8, 8), max_batch=8, max_delay_ms=30,
        bucket_sizes=(1, 2, 4, 8),
    )
    try:
        one = predictor.predict(np.full((8, 8, 3), 255, np.uint8))
        assert (one == 1).all()
        assert shapes == [1]

        results = [None] * 3

        def call(i):
            results[i] = predictor.predict(np.full((8, 8, 3), 255, np.uint8))

        threads = [threading.Thread(target=call, args=(i,)) for i in range(3)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        assert all((r == 1).all() for r in results)
        # every padded shape is a declared bucket, none is max_batch=8
        assert all(s in (1, 2, 4) for s in shapes[1:]), shapes
    finally:
        predictor.stop()


def test_bucket_sizes_validated():
    with pytest.raises(ValueError):
        BatchingPredictor(lambda b: b, (4, 4), max_batch=8, bucket_sizes=(1, 2))


def test_octet_stream_response():
    """Accept: application/octet-stream returns raw mask bytes with shape
    and dtype headers — the cheap machine-to-machine path."""
    predictor = BatchingPredictor(
        lambda b: (b.mean(-1) > 127).astype(np.uint8), input_size=(16, 16),
        max_batch=2, max_delay_ms=1,
    )
    server = ServingServer(predictor, palette_dataset="citys", host="127.0.0.1", port=0)
    port = server.start()
    try:
        bio = io.BytesIO()
        Image.fromarray(np.full((16, 16, 3), 255, np.uint8)).save(bio, "PNG")
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/predict", data=bio.getvalue(),
            headers={"Accept": "application/octet-stream"}, method="POST",
        )
        resp = urllib.request.urlopen(req, timeout=10)
        assert resp.headers["Content-Type"] == "application/octet-stream"
        shape = tuple(int(v) for v in resp.headers["X-Mask-Shape"].split("x"))
        dtype = np.dtype(resp.headers["X-Mask-Dtype"])
        mask = np.frombuffer(resp.read(), dtype).reshape(shape)
        assert mask.shape == (16, 16)
        assert (mask == 1).all()
    finally:
        server.stop()


def test_engine_mask_dtype_uint8():
    """E2EConfig(mask_dtype='uint8') returns identical masks 4x smaller."""
    import jax

    from fastscnn_tpu.engine import E2EConfig, InferenceEngine
    from fastscnn_tpu.models import FastSCNN, init_fast_scnn

    model = FastSCNN(num_classes=19)
    params, state = init_fast_scnn(jax.random.PRNGKey(0), 19)
    img = np.random.default_rng(1).integers(0, 255, (1, 32, 64, 3)).astype(np.uint8)
    m32 = InferenceEngine(
        model, params, state, config=E2EConfig(compute_dtype="float32")
    ).predict(img)
    m8 = InferenceEngine(
        model, params, state,
        config=E2EConfig(compute_dtype="float32", mask_dtype="uint8"),
    ).predict(img)
    assert m32.dtype == np.int32 and m8.dtype == np.uint8
    np.testing.assert_array_equal(m32, m8.astype(np.int32))
