"""Structural gate on the emitted E2E ONNX deploy graph (round-3
verdict item 7).

test_onnx_native.py gates the artifact *numerically* (numpy evaluator,
byte-level protobuf cross-checks vs torch.onnx.export).  This file gates
the *deploy topology* at the reference's exact ATC shape configuration —
640×360 external I/O, 1024×1024 internal processing, softmax output
(reference:export_onnx_fixed.py:232-239) — so a reader can verify the
graph we'd hand to `atc --framework=5` has the expected structure:

1. parser-based structure checks that run TODAY (no onnx package):
   static shapes end-to-end, topological validity, and an op histogram
   derived from the reference architecture constants
   (reference:models/fast_scnn.py:20-23 channel plan);
2. an auto-activating gate that runs `onnx.checker` + shape inference
   the day the `onnx` package appears (skips visibly until then, like
   tests/test_tflite_export.py's ONNX gate).
"""

from __future__ import annotations

import importlib.util
from collections import Counter

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from fastscnn_tpu.engine.onnx_native import emit_fastscnn_onnx, parse_onnx  # noqa: E402
from fastscnn_tpu.models.fast_scnn import (  # noqa: E402
    FastSCNN,
    fold_inference_params,
    init_fast_scnn,
)

# The reference's deployed configuration (export_onnx_fixed.py:232-239):
# external 640×360, internal base 1024, 2 classes (TuSimple/custom lane
# deploy), softmax on-graph, no ImageNet normalize (mean/std=None), and
# the ATC-compatible pyramid grids 1/2/4/8 with align_corners=False
# (replace_pyramid_pooling, export_onnx_fixed.py:100-163).
IN_H, IN_W = 360, 640
INTERNAL = (1024, 1024)
NUM_CLASSES = 2


def _emit(ppm_sizes, ppm_align_corners):
    model = FastSCNN(
        num_classes=NUM_CLASSES,
        ppm_sizes=ppm_sizes,
        ppm_align_corners=ppm_align_corners,
    )
    params, state = init_fast_scnn(jax.random.PRNGKey(0), NUM_CLASSES)
    folded = fold_inference_params(params, state, dtype=jnp.float32)
    folded_np = jax.tree.map(lambda a: np.asarray(a, np.float32), folded)
    data = emit_fastscnn_onnx(
        model, folded_np, (1, 3, IN_H, IN_W),
        internal_size=INTERNAL, mean=None, std=None, output="softmax",
    )
    return parse_onnx(data)


@pytest.fixture(scope="module")
def deploy_graph():
    """ATC deploy topology: fixed pools 1/2/4/8, align_corners=False."""
    return _emit(ppm_sizes=(1, 2, 4, 8), ppm_align_corners=False)


def test_io_contract(deploy_graph):
    """I/O names/dtypes/shapes of the deployed graph: float32 [0,255]
    NCHW 1×3×360×640 in, float32 softmax 1×2×360×640 out — all dims
    static (ATC compiles fixed shapes only)."""
    g = deploy_graph.graph
    (inp,) = g.inputs
    (out,) = g.outputs
    assert inp.name == "images"
    assert inp.elem_type == 1  # FLOAT
    assert inp.shape == [1, 3, IN_H, IN_W]
    assert out.name == "probs"
    assert out.elem_type == 1
    assert out.shape == [1, NUM_CLASSES, IN_H, IN_W]
    assert all(isinstance(d, int) and d > 0 for d in inp.shape + out.shape)


def test_topologically_valid(deploy_graph):
    """Every node input resolves to the graph input, an initializer, or
    an earlier node's output — i.e. the emitted node list is a valid
    topological order with no dangling references."""
    g = deploy_graph.graph
    known = {"images", ""} | set(g.initializers)
    for node in g.nodes:
        for name in node.inputs:
            assert name in known, f"{node.op_type} reads undefined tensor {name!r}"
        known.update(node.outputs)
    produced = set()
    for node in g.nodes:
        for name in node.outputs:
            assert name not in produced, f"tensor {name!r} produced twice"
            produced.add(name)
    assert all(o.name in produced for o in g.outputs)


def test_op_histogram_matches_architecture(deploy_graph):
    """Op counts derived from the reference architecture constants
    (reference:models/fast_scnn.py:20-23; LTD(32,48,64),
    GFE(64,[64,96,128],t=6,[3,3,3]), FFM, Classifier):

    Conv 45 = LTD 5 (conv + 2 DSConv) + bottlenecks 9×3 + PPM 4+1 +
    FFM 3 + Classifier 5;  Relu 34 = 45 − 12 relu-less (9 bottleneck
    projects, 2 FFM 1×1s, final classifier 1×1) + 1 post-add FFM Relu;
    Add 7 = 6 residuals (2 per bottleneck stack) + FFM fusion;
    Resize 8 = preprocess + 4 PPM upsamples + FFM upsample + final ×8
    upsample + softmax resize-back;  AveragePool 4 = ATC fixed pools
    (32×32 map, grids 1/2/4/8 all divide);  Softmax 1; Concat 1;
    Mul 1 (the /255 preprocess); no ArgMax in the softmax variant."""
    ops = Counter(n.op_type for n in deploy_graph.graph.nodes)
    assert ops["Conv"] == 45
    assert ops["Relu"] == 34
    assert ops["Add"] == 7
    assert ops["Resize"] == 8
    assert ops["AveragePool"] == 4
    assert ops["MatMul"] == 0  # divisible grids → plain pooling
    assert ops["Softmax"] == 1
    assert ops["Concat"] == 1
    assert ops["Mul"] == 1
    assert ops["ArgMax"] == 0


def test_internal_resize_is_1024(deploy_graph):
    """The preprocess Resize targets the reference's internal base size
    (1,3,1024,1024) — the 640×360 → 1024² step of EndToEndPreprocessing
    (reference:export_onnx_fixed.py:62-98)."""
    g = deploy_graph.graph
    sizes = []
    for node in g.nodes:
        if node.op_type == "Resize":
            size_name = node.inputs[3]
            sizes.append(tuple(int(v) for v in g.initializers[size_name]))
    assert (1, 3) + INTERNAL in sizes, sizes
    # and the final output resize goes back to external resolution
    assert (1, NUM_CLASSES, IN_H, IN_W) in sizes, sizes


def test_exact_variant_uses_matmul_pools():
    """Our training-exact export (adaptive 1/2/3/6 grids) must emit the
    exact separable MatMul formulation for the non-divisible grids (3
    and 6 on a 32×32 map) instead of silently approximating with fixed
    pooling — the drift the reference accepted (its published 0.38%
    deploy pixel diff, ATLAS_DEPLOYMENT_GUIDE.md:7)."""
    m = _emit(ppm_sizes=(1, 2, 3, 6), ppm_align_corners=True)
    ops = Counter(n.op_type for n in m.graph.nodes)
    assert ops["AveragePool"] == 2  # grids 1 and 2 divide 32
    assert ops["MatMul"] == 4  # 2 per non-divisible grid (3, 6)
    assert ops["Conv"] == 45


def test_checker_and_shape_inference_when_onnx_present(deploy_graph):
    """Auto-activating: the day the real `onnx` package appears, run its
    checker and shape inference over the deploy artifact — the
    structural half of the reference's ORT smoke gate
    (reference:export_onnx_fixed.py:382-443). Skips visibly until then."""
    if importlib.util.find_spec("onnx") is None:
        pytest.skip("onnx not installed — structural check runs via the "
                    "wire-format parser only (tests above)")
    import onnx
    from onnx import checker, shape_inference

    model = FastSCNN(num_classes=NUM_CLASSES, ppm_sizes=(1, 2, 4, 8),
                     ppm_align_corners=False)
    params, state = init_fast_scnn(jax.random.PRNGKey(0), NUM_CLASSES)
    folded = fold_inference_params(params, state, dtype=jnp.float32)
    folded_np = jax.tree.map(lambda a: np.asarray(a, np.float32), folded)
    data = emit_fastscnn_onnx(
        model, folded_np, (1, 3, IN_H, IN_W),
        internal_size=INTERNAL, mean=None, std=None, output="softmax",
    )
    proto = onnx.load_from_string(data)
    checker.check_model(proto)
    inferred = shape_inference.infer_shapes(proto)
    (out,) = inferred.graph.output
    dims = [d.dim_value for d in out.type.tensor_type.shape.dim]
    assert dims == [1, NUM_CLASSES, IN_H, IN_W]
