"""End-to-end jitted inference engines.

The whole serving pipeline — uint8 image → normalize → network → argmax/
softmax mask (optionally with internal resize, mirroring the reference's
"end-to-end" ONNX graph reference:export_onnx_fixed.py:34-98) — compiles
into ONE XLA program per input shape:

- preprocessing runs on device (uint8 HBM transfer only: 3 bytes/pixel,
  minimizing PCIe/DMA pressure — the reference instead feeds fp16/fp32
  tensors from the host, 2-4× the transfer volume);
- the network runs on BN-folded weights in bf16 (f32 MXU accumulation);
- argmax emits uint8/int32 masks so the device→host return is 1 byte/px.

Compiled executables are cached per (batch, H, W) — the bucket-and-pad
strategy for variable-size eval lives in the evaluator, not here.
"""

from __future__ import annotations

import dataclasses
from typing import Callable

import numpy as np
import jax
import jax.numpy as jnp

from fastscnn_tpu.models.fast_scnn import FastSCNN, fold_inference_params
from fastscnn_tpu.ops.resize import (
    resize_bilinear,
    resize_bilinear_matmul,
    resize_nearest,
)

from fastscnn_tpu.utils.profiling import enable_compilation_cache

# Persistent XLA compilation cache: on for every compute path.
enable_compilation_cache()

__all__ = ["InferenceEngine", "E2EConfig", "IMAGENET_MEAN", "IMAGENET_STD"]

# Training-side normalization for citys/tusimple/bdd100k
# (reference:train.py:104-107); custom dataset uses /255 only
# (reference:data_loader/custom.py:160-164).
IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


@dataclasses.dataclass(frozen=True)
class E2EConfig:
    """End-to-end graph options (reference:export_onnx_fixed.py:165-258).

    ``internal_size``: the fixed resolution the backbone runs at (the
    reference uses 1024×1024); ``None`` runs at the input resolution.
    ``mean``/``std``: per-channel normalization after /255 scaling; None
    means raw [0,1] (the custom-dataset convention).
    ``softmax``: emit class probabilities resized back to the input size
    instead of an argmax mask.
    ``final_upsample``: formulation of the final ×8 logits upsample —
    'matmul' (default; interp-matrix MXU contractions, the fast path on
    TPU), 'gather' (two-tap lerp gathers, minimal-FLOP reference path),
    'pallas' (mask path only: fused upsample+argmax kernel, zero
    full-res logits in HBM; softmax/logits fall back to 'matmul'),
    'hybrid' (mask path only: W-first interp-matmul plan — W stays
    minor through both contractions, XLA fuses the argmax; see
    ops/pallas/upsample_argmax.py::w_matmul_h_lerp_argmax),
    'hybrid-pallas' (the same plan with its opt-in Pallas H-lerp/argmax
    kernel — measured slower than the matmul plan, kept for study),
    'nbr-exact' (mask path only: the exact neighborhood-agreement
    scheme — argmax-first where the 2×2 source footprint agrees
    unanimously, proven to inherit the class under convex interpolation;
    full interp argmax elsewhere; see
    ops/pallas/upsample_argmax.py::neighborhood_agreement_mask),
    or 'argmax-first' (mask path only, OPT-IN SEMANTIC CHANGE: argmax at
    the classifier's 1/8 resolution, nearest-expanded — mask boundaries
    quantize to the 8-px grid, trading boundary fidelity for speed).
    All but 'argmax-first' share identical bilinear weights; see
    ops/resize.py and ops/pallas/upsample_argmax.py.
    """

    internal_size: tuple[int, int] | None = None
    mean: tuple[float, ...] | None = None
    std: tuple[float, ...] | None = None
    softmax: bool = False
    compute_dtype: str = "bfloat16"
    # 'hybrid' (the W-first matmul plan, no Pallas) is the measured
    # default: 1,564 vs 1,505 fps at batch 128 on v5e —
    # docs/PERFORMANCE.md. Its non-mask paths (softmax/logits) use the
    # same matmul formulation as 'matmul'.
    final_upsample: str = "hybrid"
    # dtype of the returned argmax mask. 'uint8' is lossless for every
    # supported dataset (num_classes ≤ 255) and quarters the device→host
    # transfer (1 byte/px vs 4) — serving uses it; 'int32' stays the
    # default for the library contract.
    mask_dtype: str = "int32"


class InferenceEngine:
    """Jit-compiled Fast-SCNN serving engine on BN-folded weights.

    Usage::

        model = FastSCNN(num_classes=19)
        engine = InferenceEngine(model, params, state,
                                 config=E2EConfig(mean=IMAGENET_MEAN, std=IMAGENET_STD))
        mask = engine.predict(uint8_images)      # (N,H,W) int32

    Also exposes the reference's ``InferSession`` duck-type
    (reference:kuruma/core/inference.py:28-65): ``engine.infer([x])``
    accepts a preprocessed NCHW float array and returns logits, so the
    downstream perception pipeline can swap backends untouched.
    """

    def __init__(
        self,
        model: FastSCNN,
        params,
        state,
        config: E2EConfig = E2EConfig(),
        mesh=None,
    ):
        """``mesh``: an optional ``jax.sharding.Mesh`` with a 'data' axis —
        predict() then shards the batch across chips (weights replicated),
        the multi-chip serving configuration (SURVEY §5.8)."""
        self.model = model
        self.config = config
        self.mesh = mesh
        # Pallas kernels lower to custom calls with no GSPMD partition
        # rule: under a jit-sharded batch XLA would replicate them (silent
        # all-gather of the batch — the exact failure mode the grad-accum
        # mesh work documented). Data-only meshes instead take the
        # shard_map path in _build_predict (per-shard local shapes make
        # the kernels legal); spatial sharding would need in-kernel halo
        # logic, so that combination fails loudly.
        self._uses_pallas = (
            getattr(model, "folded_dw_impl", "conv")
            in ("pallas", "fused-ds", "fused-ds-mr")
            or getattr(model, "folded_pw_impl", "conv") != "conv"
            or config.final_upsample in ("pallas", "hybrid-pallas")
        )
        if (
            mesh is not None
            and self._uses_pallas
            and mesh.shape.get("space", 1) > 1
        ):
            raise ValueError(
                "Pallas serving kernels (folded_dw_impl="
                f"{getattr(model, 'folded_dw_impl', 'conv')!r}, final_upsample="
                f"{config.final_upsample!r}) cannot be spatially sharded "
                "('space' axis > 1) — use a data-only mesh, or 'conv'/'taps' "
                "+ 'hybrid'/'matmul'"
            )
        dtype = jnp.dtype(config.compute_dtype)
        self.folded = fold_inference_params(params, state, dtype=dtype)
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            repl = NamedSharding(mesh, P())
            self.folded = jax.device_put(self.folded, repl)
        self._dtype = dtype
        self._predict_cache: dict = {}
        self._logits_cache: dict = {}

    # -- graph builders -----------------------------------------------------
    def _preprocess(self, images: jnp.ndarray) -> jnp.ndarray:
        """uint8/float NHWC [0,255] → normalized compute-dtype NHWC."""
        cfg = self.config
        x = images.astype(self._dtype) * jnp.asarray(1.0 / 255.0, self._dtype)
        if cfg.internal_size is not None:
            # The reference E2E graph resizes with align_corners=False
            # (reference:export_onnx_fixed.py:62-78).
            x = resize_bilinear(x, cfg.internal_size, align_corners=False)
        if cfg.mean is not None:
            mean = jnp.asarray(cfg.mean, self._dtype)
            std = jnp.asarray(cfg.std if cfg.std is not None else (1.0,) * 3, self._dtype)
            x = (x - mean) / std
        return x

    def _net_in_size(self, images_shape):
        return self.config.internal_size or tuple(images_shape[1:3])

    def _forward(self, images: jnp.ndarray, resize_back: bool = False,
                 upsample: bool = True):
        x = self._preprocess(images)
        logits = self.model.apply_folded(self.folded, x, upsample_outputs=False)[0]
        if upsample and logits.shape[1:3] != x.shape[1:3]:
            # The network's final ×8 align_corners=True upsample
            # (reference:models/fast_scnn.py:40), done outside the folded
            # graph so serving can pick the formulation: interp-matmul on
            # the MXU ('matmul') or the two-tap lane-gather path
            # ('gather') — benchmarked in docs/PERFORMANCE.md.
            up = (
                resize_bilinear
                if self.config.final_upsample == "gather"
                else resize_bilinear_matmul  # 'matmul', and the fallback
                # for 'pallas' on the softmax/logits (non-mask) paths
            )
            logits = up(logits, (x.shape[1], x.shape[2]), align_corners=True)
        if resize_back and logits.shape[1:3] != images.shape[1:3]:
            # deployed-graph contract: logits back at the input resolution
            # (reference:export_onnx_fixed.py:52-55, align_corners=False)
            logits = resize_bilinear(
                logits, (images.shape[1], images.shape[2]), align_corners=False
            )
        return logits

    def _mask_at_net_res(self, images):
        """argmax mask at the network's input resolution. 'pallas' fuses
        the ×8 upsample and the argmax in one kernel (no full-res logits
        in HBM); 'argmax-first' argmaxes at 1/8 res and nearest-expands
        (a semantic change — mask boundaries quantize to the 8-px grid);
        other modes upsample in `_forward` then argmax."""
        if self.config.final_upsample == "pallas":
            from fastscnn_tpu.ops.pallas.upsample_argmax import upsample_argmax

            logits = self._forward(images, upsample=False)
            return upsample_argmax(
                logits, self._net_in_size(images.shape),
                align_corners=True, use_pallas=True,
            )
        if self.config.final_upsample in ("hybrid", "hybrid-pallas"):
            from fastscnn_tpu.ops.pallas.upsample_argmax import (
                w_matmul_h_lerp_argmax,
            )

            logits = self._forward(images, upsample=False)
            # The mask is born in mask_dtype inside the fused graph (no
            # separate s32→u8 conversion pass over the full-res mask).
            return w_matmul_h_lerp_argmax(
                logits, self._net_in_size(images.shape), align_corners=True,
                use_pallas=self.config.final_upsample == "hybrid-pallas",
                out_dtype=jnp.dtype(self.config.mask_dtype),
            )
        if self.config.final_upsample == "nbr-exact":
            from fastscnn_tpu.ops.pallas.upsample_argmax import (
                neighborhood_agreement_mask,
            )

            logits = self._forward(images, upsample=False)
            return neighborhood_agreement_mask(
                logits, self._net_in_size(images.shape), align_corners=True,
                out_dtype=jnp.dtype(self.config.mask_dtype),
            )
        if self.config.final_upsample == "argmax-first":
            logits = self._forward(images, upsample=False)
            mask = jnp.argmax(logits, axis=-1).astype(jnp.int32)
            return resize_nearest(mask, self._net_in_size(images.shape))
        return jnp.argmax(self._forward(images), axis=-1).astype(jnp.int32)

    def _build_predict(self, shape):
        out_size = shape[1:3]
        cfg = self.config

        def fn(images):
            if cfg.softmax:
                logits = self._forward(images)
                probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
                if probs.shape[1:3] != tuple(out_size):
                    probs = resize_bilinear(probs, out_size, align_corners=False)
                return probs
            mask = self._mask_at_net_res(images)
            if mask.shape[1:3] != tuple(out_size):
                mask = resize_nearest(mask, out_size, h_axis=1, w_axis=2)
            return mask.astype(cfg.mask_dtype)

        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            if self._uses_pallas:
                # shard_map: each device runs fn on its LOCAL batch shard,
                # so the Pallas custom calls see ordinary per-shard shapes
                # (GSPMD has no partition rule for them). Weights are
                # closed over (already device_put-replicated in __init__).
                ndata = self.mesh.shape["data"]
                if shape[0] % ndata:
                    raise ValueError(
                        f"batch {shape[0]} must divide the data axis "
                        f"({ndata}) for Pallas serving under a mesh"
                    )
                out_spec = (
                    P("data", None, None, None) if cfg.softmax else P("data", None, None)
                )
                mapped = jax.shard_map(
                    fn,
                    mesh=self.mesh,
                    in_specs=P("data", None, None, None),
                    out_specs=out_spec,
                )
                return jax.jit(mapped)
            # Batch over 'data'; optionally image H over 'space' for
            # larger-than-HBM inputs (XLA SPMD inserts conv halo exchanges —
            # SURVEY §5.7's spatial-parallel extension).
            h_axis = "space" if self.mesh.shape.get("space", 1) > 1 else None
            return jax.jit(
                fn,
                in_shardings=NamedSharding(self.mesh, P("data", h_axis, None, None)),
            )
        return jax.jit(fn)

    # -- public API ---------------------------------------------------------
    def predict(self, images) -> np.ndarray:
        """uint8 NHWC batch → (N,H,W) int32 argmax mask (or (N,H,W,C)
        softmax probabilities when ``config.softmax``)."""
        images = jnp.asarray(images)
        squeeze = images.ndim == 3
        if squeeze:
            images = images[None]
        key = images.shape
        if key not in self._predict_cache:
            self._predict_cache[key] = self._build_predict(images.shape)
        out = self._predict_cache[key](images)
        out = np.asarray(out)
        return out[0] if squeeze else out

    def predict_fn(self, shape) -> Callable:
        """The raw jitted callable for a given input shape (bench/export)."""
        if shape not in self._predict_cache:
            self._predict_cache[shape] = self._build_predict(shape)
        return self._predict_cache[shape]

    def logits(self, images) -> np.ndarray:
        """Logits at the INPUT resolution (resized back when an internal
        backbone resolution is configured) — the `.infer()` seam contract."""
        images = jnp.asarray(images)
        key = ("logits", images.shape)
        if key not in self._logits_cache:
            self._logits_cache[key] = jax.jit(lambda x: self._forward(x, resize_back=True))
        return np.asarray(self._logits_cache[key](images))

    def throughput_fn(self, shape, iters: int = 30):
        """A single jitted program running ``iters`` full forward passes in
        an on-device ``fori_loop`` (returns a checksum scalar).

        This is the honest way to measure device throughput here: per-call
        host dispatch through the remote-TPU relay costs ~10 ms, which an
        in-graph loop amortizes away — on directly-attached TPUs the two
        protocols agree.

        CRITICAL: each iteration must depend on the previous one. A body
        that recomputes ``one(x)`` on an unchanged ``x`` is loop-invariant
        and XLA hoists the entire network out of the ``while`` — the loop
        then times ``iters`` scalar adds and reports up to iters× the real
        throughput (caught 2026-08-16: doubling ``iters`` left total time
        unchanged). Here the previous mask's checksum perturbs one input
        pixel, forcing a real forward per iteration at negligible cost
        (one in-place element update on the uint8 input)."""
        from jax import lax

        out_size = shape[1:3]

        def one(x):
            mask = self._mask_at_net_res(x)
            if mask.shape[1:3] != tuple(out_size):
                mask = resize_nearest(mask, out_size, h_axis=1, w_axis=2)
            return mask

        def loop_body(i, carry):
            x, acc = carry
            m = one(x)
            x = x.at[0, 0, 0, 0].add((m[0, 0, 0] % 2).astype(x.dtype))
            return (x, acc + m[0, 0, 0])

        @jax.jit
        def bench(x):
            _, acc = lax.fori_loop(0, iters, loop_body, (x, jnp.int32(0)))
            return acc

        return bench

    # -- reference InferSession duck-type ------------------------------------
    def infer(self, feeds: list) -> list:
        """Accept [NCHW float array in [0,255] or normalized], return
        [NCHW logits] — the ``.infer()`` seam shared by ONNXInferSession /
        AtlasInferSession (reference:onnx_single_image_inference.py:267-314)."""
        x = np.asarray(feeds[0])
        nhwc = np.transpose(x, (0, 2, 3, 1))
        logits = self.logits(jnp.asarray(nhwc))
        return [np.transpose(logits, (0, 3, 1, 2))]
