"""Model export for deployment.

TPU-native replacement for the reference's ONNX export path
(reference:export_onnx.py, reference:export_onnx_fixed.py): the deploy
artifact is a serialized **StableHLO** program (``jax.export``) of the
end-to-end graph — preprocessing (resize/normalize), BN-folded network,
and softmax/argmax postprocessing folded in, exactly like the
reference's ``EndToEndFastSCNN`` wrapper (reference:export_onnx_fixed.py:34-98).

StableHLO artifacts are the portable unit in the XLA ecosystem (servable
via PJRT on TPU/GPU/CPU, convertible to tflite/IREE). ``onnx`` is not
available in this environment; an ONNX emitter can slot in behind
``export_onnx`` later — the graph topology is already E2E-normalized
here the way ATC required (fixed pooling sizes hold whenever the
internal resolution is a multiple of 192, e.g. the reference's 1024²).

For the reference's EDGE deployment story (ONNX → Huawei ATC → .om on an
Atlas 200 NPU, reference:ATLAS_DEPLOYMENT_GUIDE.md), the TPU-ecosystem
analogue is **LiteRT/TFLite**: ``export_tflite`` lowers the same jitted
E2E function through jax2tf → TFLite flatbuffer, runnable on-device by
the TFLite interpreter (with optional post-training float16 quantization
— the ATC deploy was fp16 too). ``export_savedmodel`` emits a TF
SavedModel for TF-Serving hosts. Both are parity-gated against the
in-process engine the way the reference gates ONNX against PyTorch
(reference:compare_pytorch_onnx.py).
"""

from __future__ import annotations

import json
import os

import numpy as np

__all__ = [
    "export_stablehlo",
    "load_exported",
    "ExportedModel",
    "export_tflite",
    "export_savedmodel",
    "export_onnx",
    "TFLiteModel",
]


def export_stablehlo(fn, example_args, path: str, metadata: dict | None = None,
                     platforms=("tpu", "cpu", "cuda")) -> str:
    """Serialize a jittable function to a StableHLO artifact (+ JSON sidecar).

    ``fn`` — jitted or jittable callable; ``example_args`` — abstract or
    concrete arrays defining input shapes/dtypes. ``platforms`` — lowering
    targets baked into the artifact; the default covers TPU serving hosts
    plus CPU/GPU fallbacks, so an artifact exported on the TPU box still
    loads on a CPU-only machine (jax.export refuses to run an artifact on
    a platform it was not lowered for).
    """
    import jax
    from jax import export as jexport

    jitted = fn if hasattr(fn, "lower") else jax.jit(fn)
    specs = [
        jax.ShapeDtypeStruct(np.shape(a), np.asarray(a).dtype if not hasattr(a, "dtype") else a.dtype)
        for a in example_args
    ]
    exported = jexport.export(jitted, platforms=list(platforms))(*specs)
    data = exported.serialize()
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "wb") as f:
        f.write(data)
    meta = {
        "format": "stablehlo-jax-export",
        "inputs": [{"shape": list(s.shape), "dtype": str(s.dtype)} for s in specs],
        "mlir_bytes": len(data),
        "platforms": list(platforms),
    }
    if metadata:
        meta.update(metadata)
    with open(path + ".json", "w") as f:
        json.dump(meta, f, indent=2)
    return path


class ExportedModel:
    """A deserialized StableHLO artifact, callable like the original fn."""

    def __init__(self, path: str):
        from jax import export as jexport

        with open(path, "rb") as f:
            self._exported = jexport.deserialize(f.read())
        meta_path = path + ".json"
        self.metadata = {}
        if os.path.exists(meta_path):
            with open(meta_path) as f:
                self.metadata = json.load(f)

    def __call__(self, *args):
        return self._exported.call(*args)

    # reference InferSession duck-type (SURVEY §2.5)
    def infer(self, feeds: list) -> list:
        out = self._exported.call(*[np.asarray(x) for x in feeds])
        if isinstance(out, (tuple, list)):
            return [np.asarray(o) for o in out]
        return [np.asarray(out)]


def load_exported(path: str) -> ExportedModel:
    return ExportedModel(path)


def _tf_specs(example_args):
    import tensorflow as tf

    specs = []
    for a in example_args:
        shape = tuple(a.shape) if hasattr(a, "shape") else np.shape(a)
        dtype = a.dtype if hasattr(a, "dtype") else np.asarray(a).dtype
        specs.append(tf.TensorSpec(shape, tf.as_dtype(np.dtype(dtype))))
    return specs


def _as_concrete_tf_fn(fn, example_args):
    import tensorflow as tf
    from jax.experimental import jax2tf

    tf_fn = jax2tf.convert(fn, with_gradient=False)
    return tf.function(
        tf_fn, input_signature=_tf_specs(example_args), autograph=False
    ).get_concrete_function()


def export_tflite(
    fn,
    example_args,
    path: str,
    metadata: dict | None = None,
    fp16: bool = False,
    quantize: str | None = None,
    representative_data=None,
) -> str:
    """Lower a jittable function to a TFLite flatbuffer (+ JSON sidecar).

    The edge-deployment artifact: the reference ships ONNX → ATC → .om to
    an Atlas 200 NPU (reference:export_onnx_fixed.py,
    reference:ATLAS_DEPLOYMENT_GUIDE.md); our edge unit is LiteRT/TFLite,
    runnable by ``TFLiteModel`` (or any TFLite runtime) on CPUs/NPUs.

    ``quantize``: ``'fp16'`` applies post-training float16 weight
    quantization — the precision the reference's ATC deploy used;
    ``'int8'`` applies post-training int8 quantization calibrated on
    ``representative_data`` (an iterable of input batches; a handful of
    real frames — synthetic fallback only bounds the plumbing, not
    accuracy). Gate accuracy with the parity check in
    ``fastscnn_tpu.export_model``. ``fp16=True`` is a legacy alias for
    ``quantize='fp16'``.
    """
    import tensorflow as tf

    if fp16 and quantize is None:
        quantize = "fp16"
    converter = tf.lite.TFLiteConverter.from_concrete_functions(
        [_as_concrete_tf_fn(fn, example_args)]
    )
    if quantize == "fp16":
        converter.optimizations = [tf.lite.Optimize.DEFAULT]
        converter.target_spec.supported_types = [tf.float16]
    elif quantize == "int8":
        if representative_data is None:
            raise ValueError(
                "quantize='int8' needs representative_data (calibration "
                "batches); use quantize='dynamic' for uncalibrated "
                "dynamic-range quantization"
            )
        converter.optimizations = [tf.lite.Optimize.DEFAULT]
        batches = [np.asarray(b) for b in representative_data]
        converter.representative_dataset = lambda: ([b] for b in batches)
    elif quantize == "dynamic":
        converter.optimizations = [tf.lite.Optimize.DEFAULT]
    elif quantize is not None:
        raise ValueError(f"unknown quantize mode {quantize!r} (fp16|int8|dynamic)")
    blob = converter.convert()
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "wb") as f:
        f.write(blob)
    meta = {
        "format": "tflite",
        "quantize": quantize,
        "fp16_weights": quantize == "fp16",
        "inputs": [
            {"shape": [int(d) for d in s.shape], "dtype": s.dtype.name}
            for s in _tf_specs(example_args)
        ],
        "flatbuffer_bytes": len(blob),
    }
    if metadata:
        meta.update(metadata)
    with open(path + ".json", "w") as f:
        json.dump(meta, f, indent=2)
    return path


def export_savedmodel(fn, example_args, path: str, metadata: dict | None = None) -> str:
    """Serialize a jittable function as a TF SavedModel directory
    (TF-Serving / `tf.saved_model.load` hosts)."""
    import tensorflow as tf
    from jax.experimental import jax2tf

    module = tf.Module()
    module.__call__ = tf.function(
        jax2tf.convert(fn, with_gradient=False),
        input_signature=_tf_specs(example_args),
        autograph=False,
    )
    tf.saved_model.save(module, path)
    if metadata:
        with open(os.path.join(path, "fastscnn_metadata.json"), "w") as f:
            json.dump(metadata, f, indent=2)
    return path


def export_onnx(fn, example_args, path: str, metadata: dict | None = None,
                opset: int = 11) -> str:
    """Emit an ONNX artifact (reference:export_onnx_fixed.py:308-318 emits
    opset-11 ONNX via ``torch.onnx.export``; the JAX-native route is
    jax2tf → tf2onnx).

    ``onnx``/``tf2onnx`` are not part of this framework's base
    dependencies (the TPU serving path is StableHLO, and the edge path is
    TFLite — the ATC/OM analogue). This codepath is for environments that
    need ONNX interchange and have those packages installed; elsewhere it
    raises a clear error instead of half-working.
    """
    try:
        import tf2onnx  # noqa: F401
        import onnx  # noqa: F401
    except ImportError as e:
        raise RuntimeError(
            "ONNX export requires the 'onnx' and 'tf2onnx' packages "
            "(pip install onnx tf2onnx). For TPU serving use "
            "--format stablehlo; for edge devices use --format tflite "
            f"(missing: {e.name})"
        ) from e
    import tensorflow as tf
    from jax.experimental import jax2tf

    tf_fn = tf.function(
        jax2tf.convert(fn, with_gradient=False),
        input_signature=_tf_specs(example_args),
        autograph=False,
    )
    model_proto, _ = tf2onnx.convert.from_function(
        tf_fn, input_signature=_tf_specs(example_args), opset=opset
    )
    with open(path, "wb") as f:
        f.write(model_proto.SerializeToString())
    if metadata:
        with open(path + ".json", "w") as f:
            json.dump(metadata, f, indent=2)
    return path


class TFLiteModel:
    """A TFLite artifact, callable like the original fn and exposing the
    reference ``InferSession`` duck-type (SURVEY §2.5)."""

    def __init__(self, path: str):
        import tensorflow as tf

        self._interp = tf.lite.Interpreter(model_path=path)
        self._interp.allocate_tensors()
        self._inputs = self._interp.get_input_details()
        self._outputs = self._interp.get_output_details()
        self.metadata = {}
        if os.path.exists(path + ".json"):
            with open(path + ".json") as f:
                self.metadata = json.load(f)

    def __call__(self, *args):
        for detail, a in zip(self._inputs, args):
            self._interp.set_tensor(detail["index"], np.asarray(a))
        self._interp.invoke()
        outs = [self._interp.get_tensor(d["index"]) for d in self._outputs]
        return outs[0] if len(outs) == 1 else tuple(outs)

    def infer(self, feeds: list) -> list:
        out = self(*feeds)
        if isinstance(out, tuple):
            return [np.asarray(o) for o in out]
        return [np.asarray(out)]
