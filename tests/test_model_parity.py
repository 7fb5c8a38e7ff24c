"""Golden parity: our JAX Fast-SCNN vs the reference PyTorch model.

The reference repo ships no trained checkpoints, so the golden fixture is
the reference model itself: we instantiate it (torch CPU), snapshot its
randomly initialized ``state_dict``, import it with our converter, and
require logits to agree elementwise. This exercises every conv/BN/pool/
resize path with non-trivial weights and validates the checkpoint
importer end to end.
"""

import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fastscnn_tpu.models import FastSCNN, import_torch_state_dict, export_torch_state_dict
from tests.conftest import REFERENCE_ROOT, requires_reference, requires_torch


def _load_reference_model(num_classes, aux):
    sys.path.insert(0, REFERENCE_ROOT)
    try:
        from models.fast_scnn import FastSCNN as TorchFastSCNN
    finally:
        sys.path.remove(REFERENCE_ROOT)
    import torch

    torch.manual_seed(0)
    model = TorchFastSCNN(num_classes, aux=aux)
    model.eval()
    # Randomize BN running stats so folding/eval-mode BN is actually tested.
    with torch.no_grad():
        for m in model.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.uniform_(-0.5, 0.5)
                m.running_var.uniform_(0.5, 2.0)
    return model


@requires_reference
@requires_torch
@pytest.mark.parametrize("num_classes,aux", [(19, False), (2, True)])
def test_forward_parity_against_reference(num_classes, aux):
    import torch

    tmodel = _load_reference_model(num_classes, aux)
    params, state = import_torch_state_dict(tmodel.state_dict(), num_classes, aux=aux)

    rng = np.random.default_rng(1)
    x = rng.standard_normal((2, 3, 64, 128), dtype=np.float32)  # NCHW for torch

    with torch.no_grad():
        t_out = tmodel(torch.from_numpy(x))

    model = FastSCNN(num_classes=num_classes, aux=aux)
    x_nhwc = jnp.asarray(np.transpose(x, (0, 2, 3, 1)))
    outs, _ = model.apply(params, state, x_nhwc, training=False)

    assert len(outs) == len(t_out)
    for ours, theirs in zip(outs, t_out):
        np.testing.assert_allclose(
            np.transpose(np.asarray(ours), (0, 3, 1, 2)),
            theirs.numpy(),
            rtol=1e-3,
            atol=2e-4,
        )


@requires_reference
@requires_torch
def test_folded_inference_parity(num_classes=19):
    """BN-folded serving path must match the reference eval-mode forward."""
    import torch

    from fastscnn_tpu.models import fold_inference_params

    tmodel = _load_reference_model(num_classes, aux=False)
    params, state = import_torch_state_dict(tmodel.state_dict(), num_classes, aux=False)
    folded = fold_inference_params(params, state, dtype=jnp.float32)

    rng = np.random.default_rng(2)
    x = rng.standard_normal((1, 3, 64, 128), dtype=np.float32)
    with torch.no_grad():
        t_logits = tmodel(torch.from_numpy(x))[0].numpy()

    model = FastSCNN(num_classes=num_classes, aux=False)
    logits = model.apply_folded(folded, jnp.asarray(np.transpose(x, (0, 2, 3, 1))))[0]
    np.testing.assert_allclose(
        np.transpose(np.asarray(logits), (0, 3, 1, 2)), t_logits, rtol=1e-3, atol=5e-4
    )
    # argmax masks must agree everywhere (the metric that actually matters)
    ours_mask = np.asarray(jnp.argmax(logits, -1))[0]
    theirs_mask = t_logits.argmax(1)[0]
    assert (ours_mask == theirs_mask).mean() > 0.999


@requires_reference
@requires_torch
def test_dataparallel_prefix_and_dict_checkpoint_dialects():
    tmodel = _load_reference_model(2, aux=True)
    sd = tmodel.state_dict()
    wrapped = {f"module.{k}": v for k, v in sd.items()}
    p1, s1 = import_torch_state_dict(sd, 2, aux=True)
    p2, s2 = import_torch_state_dict(wrapped, 2, aux=True)
    for a, b in zip(jax.tree_util.tree_leaves(p1), jax.tree_util.tree_leaves(p2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    dict_ckpt = {"model": sd, "epoch": 3, "args": None}
    p3, _ = import_torch_state_dict(dict_ckpt, 2, aux=True)
    for a, b in zip(jax.tree_util.tree_leaves(p1), jax.tree_util.tree_leaves(p3)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@requires_reference
@requires_torch
def test_shape_filtered_partial_load():
    """Transfer-learning load: 2-class checkpoint into a 3-class model skips
    only the classifier head (reference:train_custom_finetune.py:81-96)."""
    tmodel = _load_reference_model(2, aux=False)
    params, _ = import_torch_state_dict(
        tmodel.state_dict(), num_classes=3, aux=False, allow_shape_mismatch=True
    )
    # Backbone weights must be loaded...
    w = np.asarray(params["learning_to_downsample"]["conv"]["w"])
    tw = tmodel.state_dict()["learning_to_downsample.conv.conv.0.weight"].numpy()
    np.testing.assert_allclose(w, np.transpose(tw, (2, 3, 1, 0)))
    # ...and the classifier head keeps its fresh 3-class shape.
    assert params["classifier"]["conv"]["w"].shape[-1] == 3


@requires_reference
@requires_torch
def test_export_roundtrip():
    """params → torch state_dict → params is lossless."""
    tmodel = _load_reference_model(19, aux=True)
    params, state = import_torch_state_dict(tmodel.state_dict(), 19, aux=True)
    sd = export_torch_state_dict(params, state)
    p2, s2 = import_torch_state_dict(sd, 19, aux=True)
    for a, b in zip(jax.tree_util.tree_leaves(params), jax.tree_util.tree_leaves(p2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree_util.tree_leaves(state), jax.tree_util.tree_leaves(s2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_init_and_forward_shapes():
    model = FastSCNN(num_classes=19, aux=True)
    params, state = model.init(jax.random.PRNGKey(0))
    x = jnp.zeros((1, 64, 128, 3), jnp.float32)
    outs, new_state = model.apply(params, state, x, training=False)
    assert outs[0].shape == (1, 64, 128, 19)
    assert outs[1].shape == (1, 64, 128, 19)
    # Training mode updates BN state
    outs_t, st = model.apply(params, state, jnp.ones_like(x), training=True, rng=jax.random.PRNGKey(1))
    changed = np.asarray(st["learning_to_downsample"]["conv"]["bn"]["mean"])
    orig = np.asarray(state["learning_to_downsample"]["conv"]["bn"]["mean"])
    assert not np.allclose(changed, orig)
