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
"""

from __future__ import annotations

import json
import os

import numpy as np

__all__ = ["export_stablehlo", "load_exported", "ExportedModel"]


def export_stablehlo(fn, example_args, path: str, metadata: dict | None = None) -> str:
    """Serialize a jittable function to a StableHLO artifact (+ JSON sidecar).

    ``fn`` — jitted or jittable callable; ``example_args`` — abstract or
    concrete arrays defining input shapes/dtypes.
    """
    import jax
    from jax import export as jexport

    jitted = fn if hasattr(fn, "lower") else jax.jit(fn)
    specs = [
        jax.ShapeDtypeStruct(np.shape(a), np.asarray(a).dtype if not hasattr(a, "dtype") else a.dtype)
        for a in example_args
    ]
    exported = jexport.export(jitted)(*specs)
    data = exported.serialize()
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "wb") as f:
        f.write(data)
    meta = {
        "format": "stablehlo-jax-export",
        "inputs": [{"shape": list(s.shape), "dtype": str(s.dtype)} for s in specs],
        "mlir_bytes": len(data),
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
