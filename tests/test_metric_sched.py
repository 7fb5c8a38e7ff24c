"""Metric and LR-schedule parity vs the reference numpy implementations."""

import sys

import numpy as np
import pytest

from fastscnn_tpu.utils import LRScheduler, SegmentationMetric, lr_schedule
from tests.conftest import REFERENCE_ROOT, requires_reference


def _ref_module(name):
    sys.path.insert(0, REFERENCE_ROOT)
    try:
        import importlib

        return importlib.import_module(name)
    finally:
        sys.path.remove(REFERENCE_ROOT)


@requires_reference
def test_metric_parity(rng):
    ref_metric = _ref_module("utils.metric")
    nclass = 19
    ours = SegmentationMetric(nclass)
    theirs = ref_metric.SegmentationMetric(nclass)
    for _ in range(4):
        pred = rng.integers(0, nclass, size=(2, 33, 47))
        target = rng.integers(-1, nclass, size=(2, 33, 47))
        ours.update(pred, target)
        theirs.update(pred.astype(np.int64), target.astype(np.int64))
    pa_o, miou_o = ours.get()
    pa_t, miou_t = theirs.get()
    assert abs(pa_o - pa_t) < 1e-9
    assert abs(miou_o - miou_t) < 1e-9


@requires_reference
@pytest.mark.parametrize(
    "mode,kwargs",
    [
        ("poly", dict(power=0.9)),
        ("cosine", {}),
        ("linear", {}),
        ("constant", {}),
        ("step", dict(step_epoch=[20, 40], step_factor=0.5)),
    ],
)
def test_lr_schedule_parity(mode, kwargs):
    ref_sched = _ref_module("utils.lr_scheduler")
    nepochs, ipe = 6, 37
    theirs = ref_sched.LRScheduler(mode=mode, base_lr=0.01, nepochs=nepochs, iters_per_epoch=ipe, **kwargs)
    sched = lr_schedule(mode, base_lr=0.01, nepochs=nepochs, iters_per_epoch=ipe, **kwargs)
    stateful = LRScheduler(mode, base_lr=0.01, nepochs=nepochs, iters_per_epoch=ipe, **kwargs)
    for it in range(0, nepochs * ipe, 13):
        assert abs(float(sched(it)) - theirs(it)) < 1e-7
        assert abs(stateful(it) - theirs(it)) < 1e-7


def test_metric_streaming_equals_oneshot(rng):
    nclass = 5
    pred = rng.integers(0, nclass, size=(8, 16, 16))
    target = rng.integers(-1, nclass, size=(8, 16, 16))
    m1 = SegmentationMetric(nclass)
    m1.update(pred, target)
    m2 = SegmentationMetric(nclass)
    for i in range(8):
        m2.update(pred[i], target[i])
    assert m1.get() == m2.get()


def test_numpy_fast_path_equals_device_path(rng):
    """SegmentationMetric.update's host-numpy fast path must produce
    bit-identical accumulators to the jnp device path — including ignore
    labels, out-of-range predicted ids (dropped by one_hot on device),
    and multi-dim inputs."""
    import jax.numpy as jnp

    nclass = 5
    # some ids >= nclass AND negative ids (a -1 ignore-fill in a
    # prediction mask must not crash the bincount path)
    pred = rng.integers(-1, nclass + 2, size=(4, 9, 13))
    target = rng.integers(-2, nclass, size=(4, 9, 13))
    m_np = SegmentationMetric(nclass)
    m_np.update(pred, target)  # numpy inputs → host path
    m_dev = SegmentationMetric(nclass)
    m_dev.update(jnp.asarray(pred), jnp.asarray(target))  # device path
    assert m_np.total_correct == m_dev.total_correct
    assert m_np.total_label == m_dev.total_label
    np.testing.assert_array_equal(m_np.total_inter, m_dev.total_inter)
    np.testing.assert_array_equal(m_np.total_union, m_dev.total_union)


def test_per_sample_stats_equal_batch_and_host(rng):
    """seg_hist_update(per_sample=True) must (1) sum to the whole-batch
    statistics and (2) per row, exactly equal the host metric path it
    replaces in the eval protocol (update_stats vs update) — including
    ignore labels and rows that are ALL ignore (the evaluator's pad
    rows)."""
    import jax.numpy as jnp

    from fastscnn_tpu.utils.metric import seg_hist_update

    nclass = 5
    pred = rng.integers(0, nclass, size=(6, 16, 16))
    target = rng.integers(-1, nclass, size=(6, 16, 16))
    target[5] = -1  # an all-ignore pad row
    ps = seg_hist_update(jnp.asarray(pred), jnp.asarray(target), nclass, per_sample=True)
    whole = seg_hist_update(jnp.asarray(pred), jnp.asarray(target), nclass)
    for p, w in zip(ps, whole):
        np.testing.assert_array_equal(np.asarray(p).sum(axis=0), np.asarray(w))
    correct, labeled, inter, union = (np.asarray(s) for s in ps)
    m_host = SegmentationMetric(nclass)
    m_dev = SegmentationMetric(nclass)
    for i in range(6):
        m_host.update(pred[i], target[i])
        m_dev.update_stats(correct[i], labeled[i], inter[i], union[i])
    assert m_host.get() == m_dev.get()
    np.testing.assert_array_equal(m_host.total_inter, m_dev.total_inter)
    np.testing.assert_array_equal(m_host.total_union, m_dev.total_union)
    assert correct[5] == 0 and labeled[5] == 0  # pad row contributes nothing


def test_training_monitor_fresh_vs_resume(tmp_path):
    """A fresh run ignores an existing log; resume=True continues it
    (reference starts a fresh timestamped log per run)."""
    from fastscnn_tpu.utils.monitor import TrainingMonitor

    log = str(tmp_path / "log.json")
    m1 = TrainingMonitor(log, resume=False)
    m1.log_epoch(0, train_loss=1.0, lr=0.01, pix_acc=0.9, miou=0.5)
    m2 = TrainingMonitor(log, resume=False)
    assert m2.records == [] and m2.best["epoch"] == -1
    m3 = TrainingMonitor(log, resume=True)
    assert len(m3.records) == 1


def test_step_schedule_fires_without_niters():
    """step mode with thresholds but no niters must still decay (the
    iteration clip used to freeze the counter at 1)."""
    sched = lr_schedule("step", base_lr=0.1, step_iter=[1000, 2000])
    assert abs(float(sched(0)) - 0.1) < 1e-7
    assert abs(float(sched(1500)) - 0.01) < 1e-7
    assert abs(float(sched(2500)) - 0.001) < 1e-7


def test_poly_schedule_endpoint_is_zero_under_jit():
    """Regression: `(1-t/n)**0.9` with a traced f32 base lowers to
    exp(p·log(0)) = NaN at the endpoint under jit (eager numpy gives 0),
    which 0·NaN-corrupted the FINAL optimizer step of every full poly
    training run. Caught by the trainer-driven parity harness
    (tests/test_training_parity.py)."""
    import jax
    import jax.numpy as jnp

    from fastscnn_tpu.utils.lr_scheduler import lr_schedule

    for mode in ("poly", "linear", "cosine"):
        s = lr_schedule(mode, base_lr=0.01, nepochs=3, iters_per_epoch=6, power=0.9)
        last = float(jax.jit(s)(jnp.int32(17)))
        beyond = float(jax.jit(s)(jnp.int32(99)))
        # poly's endpoint guard returns exactly 0; linear/cosine may carry
        # ~1e-11 of f32 reciprocal rounding — finite and negligible is the
        # contract (NaN is the regression).
        assert np.isfinite(last) and abs(last) < 1e-9, (mode, last)
        assert np.isfinite(beyond) and abs(beyond) < 1e-9, (mode, beyond)
        if mode == "poly":
            assert last == 0.0 and beyond == 0.0
        # and the step before the endpoint is still positive and finite
        prev = float(jax.jit(s)(jnp.int32(16)))
        assert np.isfinite(prev) and prev > 0.0


def test_training_monitor_tensorboard_mirror(tmp_path):
    """tensorboard_dir mirrors epoch records as tf.summary scalars
    (events file appears, scalars readable); the JSON log is unaffected.
    Beyond-reference feature: reference README.md:62 leaves TensorBoard
    as an unchecked TODO."""
    tf = pytest.importorskip("tensorflow")
    from fastscnn_tpu.utils.monitor import TrainingMonitor

    tb = tmp_path / "tb"
    mon = TrainingMonitor(
        str(tmp_path / "log.json"), experiment_name="exp",
        tensorboard_dir=str(tb),
    )
    mon.log_epoch(0, train_loss=1.5, lr=0.01, pix_acc=0.8, miou=0.5)
    mon.log_epoch(1, train_loss=1.2, lr=0.009, samples_per_sec=100.0)
    mon.close()

    files = list(tb.glob("events.out.tfevents.*"))
    assert files, "no TB events file written"
    seen = {}
    for ev in tf.compat.v1.train.summary_iterator(str(files[0])):
        for v in ev.summary.value:
            seen.setdefault(v.tag, []).append(
                (ev.step, float(tf.make_ndarray(v.tensor)))
            )
    assert seen["exp/train_loss"] == [(0, 1.5), (1, pytest.approx(1.2))]
    assert seen["exp/miou"] == [(0, 0.5)]
    # JSON log is still the source of truth
    import json

    records = json.loads((tmp_path / "log.json").read_text())
    assert len(records) == 2 and records[1]["samples_per_sec"] == 100.0


def test_training_monitor_no_tensorboard_dir_writes_no_events(tmp_path):
    from fastscnn_tpu.utils.monitor import TrainingMonitor

    mon = TrainingMonitor(str(tmp_path / "log.json"))
    mon.log_epoch(0, train_loss=1.0, lr=0.1)
    mon.close()
    assert not list(tmp_path.rglob("events.out.tfevents.*"))
