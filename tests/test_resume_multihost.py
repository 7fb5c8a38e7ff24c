"""Auto-resume (preemption recovery) and multi-host helpers."""

import json
import os

import numpy as np
import pytest
from PIL import Image

from fastscnn_tpu.parallel.multihost import host_shard, initialize_multihost, is_primary_host


@pytest.fixture
def tiny_ds(tmp_path):
    root = tmp_path / "ds"
    (root / "images").mkdir(parents=True)
    (root / "masks").mkdir()
    rng = np.random.default_rng(0)
    for i in range(4):
        img = rng.integers(0, 255, (48, 48, 3), dtype=np.uint8)
        mask = np.zeros((48, 48), np.uint8)
        mask[24:] = 255
        Image.fromarray(img).save(root / "images" / f"s{i}.jpg")
        Image.fromarray(mask).save(root / "masks" / f"s{i}.png")
    return str(root)


def test_auto_resume_continues_from_step(tiny_ds, tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    from fastscnn_tpu.train import Trainer, parse_args

    flags = [
        "--dataset", "custom",
        "--data-root", tiny_ds,
        "--base-size", "48",
        "--crop-size", "32",
        "--epochs", "2",
        "--batch-size", "2",
        "--loss-type", "dice",
        "--no-val",
        "--save-epoch", "1",
        "--print-interval", "100",
    ]
    t1 = Trainer(parse_args(flags))
    t1.train()
    step_after = int(t1.state.step)
    assert step_after == 2 * t1.iters_per_epoch

    # simulate a preempted restart asking for more epochs
    args2 = parse_args(flags + ["--auto-resume", "--epochs", "3"])
    t2 = Trainer(args2)
    assert int(t2.state.step) == step_after
    assert args2.start_epoch == 2  # continues at epoch 2, not 0
    t2.train()
    assert int(t2.state.step) == 3 * t2.iters_per_epoch


def test_multihost_noop_single_process():
    assert initialize_multihost() is False  # no env vars → single host no-op
    assert is_primary_host()
    a = np.arange(8)
    b = np.arange(16).reshape(8, 2)
    ra = host_shard(a)
    np.testing.assert_array_equal(ra, a)
    ra, rb = host_shard(a, b)
    np.testing.assert_array_equal(rb, b)


class _InitRecorder:
    """Stands in for jax.distributed.initialize: records the call instead
    of opening a coordinator socket (no pod in the sandbox)."""

    def __init__(self):
        self.calls = []

    def __call__(self, *args, **kwargs):
        self.calls.append((args, kwargs))


def test_multihost_env_var_plumbing(monkeypatch):
    """The COORDINATOR_ADDRESS / NUM_PROCESSES / PROCESS_ID env branch must
    parse and forward exactly (first execution of this branch should not be
    a real pod run — VERDICT r1 item 8)."""
    import jax

    rec = _InitRecorder()
    monkeypatch.setattr(jax.distributed, "initialize", rec)
    monkeypatch.setenv("COORDINATOR_ADDRESS", "10.0.0.1:8476")
    monkeypatch.setenv("NUM_PROCESSES", "4")
    monkeypatch.setenv("PROCESS_ID", "2")
    assert initialize_multihost() is True
    assert rec.calls == [
        ((), {"coordinator_address": "10.0.0.1:8476", "num_processes": 4, "process_id": 2}),
    ]


def test_multihost_explicit_args_override_env(monkeypatch):
    import jax

    rec = _InitRecorder()
    monkeypatch.setattr(jax.distributed, "initialize", rec)
    monkeypatch.setenv("COORDINATOR_ADDRESS", "10.0.0.1:8476")
    monkeypatch.setenv("NUM_PROCESSES", "4")
    monkeypatch.setenv("PROCESS_ID", "2")
    assert initialize_multihost("10.9.9.9:1234", num_processes=8, process_id=0) is True
    ((_, kwargs),) = rec.calls
    assert kwargs == {
        "coordinator_address": "10.9.9.9:1234", "num_processes": 8, "process_id": 0,
    }


def test_multihost_process_id_zero_not_dropped(monkeypatch):
    """process_id=0 is falsy; the arg plumbing must not fall through to the
    env var (the primary host would silently take another host's rank)."""
    import jax

    rec = _InitRecorder()
    monkeypatch.setattr(jax.distributed, "initialize", rec)
    monkeypatch.setenv("PROCESS_ID", "3")
    assert initialize_multihost("c:1", num_processes=2, process_id=0) is True
    ((_, kwargs),) = rec.calls
    assert kwargs["process_id"] == 0


def test_multihost_pod_autodetect(monkeypatch):
    """Multi-worker TPU pod env (TPU_WORKER_HOSTNAMES with >1 host) →
    argument-less initialize(); single-worker value stays a no-op."""
    import jax

    rec = _InitRecorder()
    monkeypatch.setattr(jax.distributed, "initialize", rec)
    monkeypatch.delenv("COORDINATOR_ADDRESS", raising=False)
    monkeypatch.delenv("NUM_PROCESSES", raising=False)
    monkeypatch.delenv("PROCESS_ID", raising=False)
    monkeypatch.setenv("TPU_WORKER_HOSTNAMES", "host-0")
    assert initialize_multihost() is False
    assert rec.calls == []
    monkeypatch.setenv("TPU_WORKER_HOSTNAMES", "host-0,host-1")
    assert initialize_multihost() is True
    assert rec.calls == [((), {})]


def test_host_shard_slices_by_process(monkeypatch):
    """host_shard under a faked 4-process world: each host keeps exactly
    its contiguous batch slice."""
    import jax

    monkeypatch.setattr(jax, "process_count", lambda: 4)
    monkeypatch.setattr(jax, "process_index", lambda: 2)
    a = np.arange(8)
    b = np.arange(16).reshape(8, 2)
    ra, rb = host_shard(a, b)
    np.testing.assert_array_equal(ra, [4, 5])
    np.testing.assert_array_equal(rb, [[8, 9], [10, 11]])
