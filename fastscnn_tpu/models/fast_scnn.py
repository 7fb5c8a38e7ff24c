"""Fast-SCNN as pure functional JAX, NHWC, TPU-first.

Architecture parity (channel plan must match reference checkpoints,
reference:models/fast_scnn.py:20-23):

  LearningToDownsample(32, 48, 64)         → 1/8 res, 64 ch
  GlobalFeatureExtractor(64, [64,96,128], 128, t=6, [3,3,3]) + PPM(1/2/3/6)
  FeatureFusionModule(64, 128, 128)
  Classifier(128, num_classes)
  final bilinear upsample align_corners=True to input size
  optional aux head: 3×3 conv 64→32 + BN + ReLU + dropout(0.1) + 1×1 → C

Design notes (TPU):
- NHWC activations, HWIO weights; depthwise convs via feature_group_count.
- Two parameter trees: ``params`` (trainable) and ``state`` (BN running
  stats), mirrored. ``apply`` is a pure function; training mode returns
  the updated state (sync-BN across the data mesh falls out of sharded
  reductions).
- ``fold_inference_params`` bakes every BN into its conv for the serving
  path; the folded tree is what the inference engine jits.
- No Python control flow on traced values; all shapes static under jit.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any

import jax
import jax.numpy as jnp

from fastscnn_tpu.ops.conv import (
    batch_norm_apply,
    batch_norm_train,
    conv2d,
    conv2d_tapbwd,
    dw_conv2d_taps,
    fold_conv_bn,
)
from fastscnn_tpu.ops.pool import adaptive_avg_pool
from fastscnn_tpu.ops.resize import resize_bilinear, resize_bilinear_matmul

__all__ = ["FastSCNN", "init_fast_scnn", "fold_inference_params"]

Params = dict[str, Any]


# ---------------------------------------------------------------------------
# Initializers (match PyTorch defaults so from-scratch training behaves the
# same: conv = kaiming-uniform(a=√5) ≡ U(±√(6/((1+5)·fan_in))), BN scale=1,
# bias=0, conv bias = U(±1/√fan_in)).
# ---------------------------------------------------------------------------


def _conv_init(key, kh, kw, cin_per_group, cout, dtype=jnp.float32):
    fan_in = kh * kw * cin_per_group
    bound = math.sqrt(1.0 / fan_in)  # kaiming_uniform(a=sqrt(5)) == U(±1/√fan_in)
    return jax.random.uniform(key, (kh, kw, cin_per_group, cout), dtype, -bound, bound)


def _bias_init(key, fan_in, cout, dtype=jnp.float32):
    bound = math.sqrt(1.0 / fan_in)
    return jax.random.uniform(key, (cout,), dtype, -bound, bound)


def _bn_params(c, dtype=jnp.float32):
    return {"scale": jnp.ones((c,), dtype), "bias": jnp.zeros((c,), dtype)}


def _bn_state(c):
    return {"mean": jnp.zeros((c,), jnp.float32), "var": jnp.ones((c,), jnp.float32)}


def _init_cbr(key, cin, cout, k, groups=1):
    """Conv(bias=False)+BN(+ReLU) block params/state."""
    p = {"w": _conv_init(key, k, k, cin // groups, cout), "bn": _bn_params(cout)}
    return p, {"bn": _bn_state(cout)}


def _init_conv_bias(key, cin, cout, k):
    kw_, kb_ = jax.random.split(key)
    return {
        "w": _conv_init(kw_, k, k, cin, cout),
        "b": _bias_init(kb_, k * k * cin, cout),
    }


def _init_ds(key, cin, cout):
    """Depthwise-separable conv: dw 3×3 (+BN+ReLU) → pw 1×1 (+BN+ReLU).
    reference:models/fast_scnn.py:64-79."""
    k1, k2 = jax.random.split(key)
    dw_p, dw_s = _init_cbr(k1, cin, cin, 3, groups=cin)
    pw_p, pw_s = _init_cbr(k2, cin, cout, 1)
    return {"dw": dw_p, "pw": pw_p}, {"dw": dw_s, "pw": pw_s}


def _init_bottleneck(key, cin, cout, t):
    """MobileNetV2 inverted residual. reference:models/fast_scnn.py:95-115."""
    k1, k2, k3 = jax.random.split(key, 3)
    hidden = cin * t
    exp_p, exp_s = _init_cbr(k1, cin, hidden, 1)
    dw_p, dw_s = _init_cbr(k2, hidden, hidden, 3, groups=hidden)
    proj_p = {"w": _conv_init(k3, 1, 1, hidden, cout), "bn": _bn_params(cout)}
    proj_s = {"bn": _bn_state(cout)}
    return (
        {"expand": exp_p, "dw": dw_p, "project": proj_p},
        {"expand": exp_s, "dw": dw_s, "project": proj_s},
    )


# ---------------------------------------------------------------------------
# Block applies. Each takes (params, state_or_None, x) and returns
# (y, new_state_or_None): state=None selects inference mode on running stats.
# ---------------------------------------------------------------------------


def _apply_bn(p_bn, s_bn, x, training, packed=False):
    if training:
        y, m, v = batch_norm_train(
            x, p_bn["scale"], p_bn["bias"], s_bn["mean"], s_bn["var"], packed=packed
        )
        return y, {"mean": m, "var": v}
    return batch_norm_apply(x, p_bn["scale"], p_bn["bias"], s_bn["mean"], s_bn["var"]), s_bn


def _apply_cbr(
    p, s, x, training, stride=1, padding=0, groups=1, relu=True, conv_fn=conv2d,
    bn_packed=False,
):
    y = conv_fn(x, p["w"], stride=stride, padding=padding, groups=groups)
    y, s_bn = _apply_bn(p["bn"], s["bn"], y, training, packed=bn_packed)
    if relu:
        y = jax.nn.relu(y)
    return y, {"bn": s_bn}


def _apply_ds(p, s, x, training, stride=1, conv_fn=conv2d, bn_packed=False):
    cin = x.shape[-1]
    y, s_dw = _apply_cbr(
        p["dw"], s["dw"], x, training, stride=stride, padding=1, groups=cin,
        conv_fn=conv_fn, bn_packed=bn_packed,
    )
    y, s_pw = _apply_cbr(p["pw"], s["pw"], y, training, conv_fn=conv_fn, bn_packed=bn_packed)
    return y, {"dw": s_dw, "pw": s_pw}


def _apply_bottleneck(p, s, x, training, stride):
    cin = x.shape[-1]
    y, s_e = _apply_cbr(p["expand"], s["expand"], x, training)
    hidden = y.shape[-1]
    y, s_d = _apply_cbr(p["dw"], s["dw"], y, training, stride=stride, padding=1, groups=hidden)
    y = conv2d(y, p["project"]["w"])
    y, s_p_bn = _apply_bn(p["project"]["bn"], s["project"]["bn"], y, training)
    if stride == 1 and cin == y.shape[-1]:
        y = x + y
    return y, {"expand": s_e, "dw": s_d, "project": {"bn": s_p_bn}}


# ---------------------------------------------------------------------------
# The network.
# ---------------------------------------------------------------------------

_LTD = (32, 48, 64)
_GFE_BLOCKS = (64, 96, 128)
_GFE_OUT = 128
_GFE_T = 6
_GFE_NUM = (3, 3, 3)
_FFM_OUT = 128
_PPM_SIZES = (1, 2, 3, 6)


@dataclasses.dataclass(frozen=True)
class FastSCNN:
    """Configuration + pure apply functions for Fast-SCNN.

    ``apply(params, state, x, training=False, rng=None)`` returns
    ``(outputs, new_state)`` where ``outputs`` is ``(main,)`` or
    ``(main, aux)`` logits in NHWC at the input resolution — mirroring
    the tuple contract of reference:models/fast_scnn.py:33-46.
    """

    num_classes: int
    aux: bool = False
    dropout_rate: float = 0.1
    # Deployment-graph compatibility knobs. The reference's ATC/ONNX export
    # *changes the architecture* (reference:export_onnx_fixed.py:100-163):
    # fixed AvgPool2d(32/16/8/4) on the 32×32 feature map yields pyramid
    # grids 1/2/4/8 (training uses adaptive 1/2/3/6) and PPM upsampling
    # switches to align_corners=False — the source of its published 0.38%
    # deploy pixel drift. Our default export keeps the training
    # architecture exactly; set ppm_sizes=(1, 2, 4, 8) and
    # ppm_align_corners=False to reproduce the reference's deployed graph.
    ppm_sizes: tuple[int, ...] = _PPM_SIZES
    ppm_align_corners: bool = True
    # Training-time implementation of the small-channel stem (LTD) convs —
    # A/B candidates for the measured small-C bottleneck (docs/
    # PERFORMANCE.md §"Training: the 19-class Cityscapes recipe traced"):
    # 'xla' = plain lax convs (XLA-native backward); 'tapbwd' = same
    # forward HLO, dW as per-tap contractions (ops/conv.py::conv2d_tapbwd);
    # 'taps' = dw convs as shifted-slice VPU FMAs (AD reformulates fwd AND
    # bwd) + tapbwd dense/pw; 'taps-packbn' = 'taps' plus lane-packed
    # training BN (batch_norm_train(packed=True)); 'pallas' = Pallas dw
    # row kernel with the tap backward. All semantically identical
    # (f64-gated); the folded serving path ignores this field.
    stem_impl: str = "xla"
    # Serving-graph impl of the LTD depthwise convs in apply_folded:
    # 'conv' = lax conv (default); 'taps' = dw_conv2d_taps VPU tap
    # accumulation; 'pallas' = fused dw+bias+ReLU row kernel; 'fused-ds'
    # = the whole DSConv (dw+bias+ReLU+pw+bias+ReLU) in one kernel so the
    # dw intermediate never touches HBM (ops/pallas/dw_conv.py) — A/B
    # candidates for the measured #1 serving op (stem dsconv1-dw at
    # 169 GB/s, docs/PERFORMANCE.md round-2 profile).
    folded_dw_impl: str = "conv"
    # Post-training-quantization simulation hook (tools/quant_study.py):
    # a callable ``y -> y`` applied to every conv INPUT in apply_folded
    # (the value grid an int8 kernel would see). None — the default —
    # adds nothing to the traced graph. A declared field because the
    # dataclass is frozen; install with dataclasses.replace. compare
    # stays off so hook identity doesn't split equality-keyed caches.
    act_fake_quant: Any = dataclasses.field(default=None, compare=False)
    # Serving-graph pointwise-conv implementation: 'conv' (default) or
    # 'int8-a8' / 'int8-w8a8' — route the non-head 1×1 convs through the
    # fused int8+requant Pallas kernels (ops/pallas/int8_pw.py), using
    # the per-site activation scales in ``pw_act_scales`` (a hashable
    # tuple of (site, scale) pairs; calibrate with
    # models/quantize.py::calibrate_pw_scales). Sites absent from the
    # tuple stay bf16, so the accuracy study's "skip-ends" compromise
    # (heads stay float) falls out of the site list. Justified by
    # docs/quant_study_r3.json: w8a8 costs ≤0.005 mIoU on the 19-class
    # fixture set. The reference has no quantized path in-repo (its
    # Ascend deploy quantizes offline via ATC).
    folded_pw_impl: str = "conv"
    pw_act_scales: tuple = ()
    # Force/disable the Pallas path inside the int8 kernels (None =
    # auto by backend). The TPU-target lowering test sets True so the
    # exported graph contains the actual kernels, not the XLA fallback.
    pw_use_pallas: Any = None

    # -- init ---------------------------------------------------------------
    def init(self, key) -> tuple[Params, Params]:
        return init_fast_scnn(key, self.num_classes, self.aux)

    # -- forward ------------------------------------------------------------
    def apply(self, params, state, x, training=False, rng=None, upsample_outputs=True):
        """``upsample_outputs=False`` returns the logits at the classifier's
        1/8 resolution (and the aux head's), skipping the final bilinear
        upsamples — the train step uses this so the loss can fold the
        upsample into its own math (losses/segmentation.py
        ``_match_resolution``); semantics are identical because the losses
        perform the same align_corners=True resize."""
        size = (x.shape[1], x.shape[2])
        new_state = jax.tree_util.tree_map(lambda v: v, state)  # shallow copy

        higher, new_state["learning_to_downsample"] = self._ltd(
            params["learning_to_downsample"], state["learning_to_downsample"], x, training
        )
        lower, new_state["global_feature_extractor"] = self._gfe(
            params["global_feature_extractor"], state["global_feature_extractor"], higher, training
        )
        fused, new_state["feature_fusion"] = self._ffm(
            params["feature_fusion"], state["feature_fusion"], higher, lower, training
        )
        logits, new_state["classifier"] = self._classifier(
            params["classifier"], state["classifier"], fused, training, rng
        )
        if upsample_outputs:
            logits = resize_bilinear(logits, size, align_corners=True)
        outputs = (logits,)
        if self.aux:
            auxout, new_state["auxlayer"] = self._aux(
                params["auxlayer"], state["auxlayer"], higher, training, rng
            )
            if upsample_outputs:
                auxout = resize_bilinear(auxout, size, align_corners=True)
            outputs = (logits, auxout)
        return outputs, new_state

    # -- modules ------------------------------------------------------------
    def _ltd(self, p, s, x, training):
        """reference:models/fast_scnn.py:148-161."""
        bn_packed = False
        if self.stem_impl == "xla":
            conv_fn = conv2d
        elif self.stem_impl == "tapbwd":
            conv_fn = conv2d_tapbwd
        elif self.stem_impl in ("taps", "taps-packbn"):
            bn_packed = self.stem_impl == "taps-packbn"
            # dw convs as explicit VPU tap accumulation (fwd AND bwd
            # reformulated via AD of the slices); dense/pw convs keep the
            # XLA forward with the per-tap dW.
            def conv_fn(x, w, stride=1, padding=0, groups=1):
                if groups > 1:
                    return dw_conv2d_taps(x, w, stride=stride, padding=padding)
                return conv2d_tapbwd(x, w, stride=stride, padding=padding, groups=groups)
        elif self.stem_impl == "pallas":
            # dw convs through the Pallas row kernel (XLA tap backward via
            # its custom VJP; falls back to the lax conv off-TPU).
            from fastscnn_tpu.ops.pallas.dw_conv import dw_conv3x3_pallas_vjp

            def conv_fn(x, w, stride=1, padding=0, groups=1):
                if groups > 1:
                    return dw_conv3x3_pallas_vjp(x, w, stride, padding)
                return conv2d_tapbwd(x, w, stride=stride, padding=padding, groups=groups)
        else:
            raise ValueError(f"unknown stem_impl {self.stem_impl!r}")
        y, s1 = _apply_cbr(
            p["conv"], s["conv"], x, training, stride=2, padding=0,
            conv_fn=conv_fn, bn_packed=bn_packed,
        )
        y, s2 = _apply_ds(
            p["dsconv1"], s["dsconv1"], y, training, stride=2,
            conv_fn=conv_fn, bn_packed=bn_packed,
        )
        y, s3 = _apply_ds(
            p["dsconv2"], s["dsconv2"], y, training, stride=2,
            conv_fn=conv_fn, bn_packed=bn_packed,
        )
        return y, {"conv": s1, "dsconv1": s2, "dsconv2": s3}

    def _gfe(self, p, s, x, training):
        """reference:models/fast_scnn.py:164-187."""
        ns = {}
        for name, stride in (("bottleneck1", 2), ("bottleneck2", 2), ("bottleneck3", 1)):
            stage_s = []
            for i, (bp, bs) in enumerate(zip(p[name], s[name])):
                x, s_i = _apply_bottleneck(bp, bs, x, training, stride if i == 0 else 1)
                stage_s.append(s_i)
            ns[name] = stage_s
        x, ns["ppm"] = self._ppm(p["ppm"], s["ppm"], x, training)
        return x, ns

    def _ppm(self, p, s, x, training):
        """Pyramid pooling: adaptive pools 1/2/3/6 → 1×1 CBR → bilinear
        upsample (align_corners=True) → concat → 1×1 CBR.
        reference:models/fast_scnn.py:118-145."""
        size = (x.shape[1], x.shape[2])
        feats = [x]
        ns = {}
        for conv_name, pool_size in zip(("conv1", "conv2", "conv3", "conv4"), self.ppm_sizes):
            y = adaptive_avg_pool(x, pool_size)
            y, ns[conv_name] = _apply_cbr(p[conv_name], s[conv_name], y, training)
            feats.append(resize_bilinear(y, size, align_corners=self.ppm_align_corners))
        y = jnp.concatenate(feats, axis=-1)
        y, ns["out"] = _apply_cbr(p["out"], s["out"], y, training)
        return y, ns

    def _ffm(self, p, s, higher, lower, training):
        """reference:models/fast_scnn.py:190-218."""
        size = (higher.shape[1], higher.shape[2])
        lower = resize_bilinear(lower, size, align_corners=True)
        c = lower.shape[-1]
        lower, s_dw = _apply_cbr(p["dwconv"], s["dwconv"], lower, training, padding=1, groups=c)
        lower = conv2d(lower, p["conv_lower_res"]["w"], p["conv_lower_res"]["b"])
        lower, s_lo = _apply_bn(p["conv_lower_res"]["bn"], s["conv_lower_res"]["bn"], lower, training)
        higher = conv2d(higher, p["conv_higher_res"]["w"], p["conv_higher_res"]["b"])
        higher, s_hi = _apply_bn(p["conv_higher_res"]["bn"], s["conv_higher_res"]["bn"], higher, training)
        out = jax.nn.relu(higher + lower)
        return out, {
            "dwconv": s_dw,
            "conv_lower_res": {"bn": s_lo},
            "conv_higher_res": {"bn": s_hi},
        }

    def _classifier(self, p, s, x, training, rng):
        """reference:models/fast_scnn.py:221-237."""
        y, s1 = _apply_ds(p["dsconv1"], s["dsconv1"], x, training)
        y, s2 = _apply_ds(p["dsconv2"], s["dsconv2"], y, training)
        y = self._dropout(y, training, rng, salt=0)
        y = conv2d(y, p["conv"]["w"], p["conv"]["b"])
        return y, {"dsconv1": s1, "dsconv2": s2}

    def _aux(self, p, s, x, training, rng):
        """reference:models/fast_scnn.py:24-31."""
        y = conv2d(x, p["conv1"]["w"], padding=1)
        y, s_bn = _apply_bn(p["conv1"]["bn"], s["conv1"]["bn"], y, training)
        y = jax.nn.relu(y)
        y = self._dropout(y, training, rng, salt=1)
        y = conv2d(y, p["conv2"]["w"], p["conv2"]["b"])
        return y, {"conv1": {"bn": s_bn}}

    def _dropout(self, x, training, rng, salt):
        if not training or rng is None or self.dropout_rate <= 0.0:
            return x
        keep = 1.0 - self.dropout_rate
        mask = jax.random.bernoulli(jax.random.fold_in(rng, salt), keep, x.shape)
        return jnp.where(mask, x / keep, 0.0).astype(x.dtype)

    # -- folded inference ---------------------------------------------------
    def apply_folded(self, fparams, x, upsample_outputs=True):
        """Inference forward on a BN-folded parameter tree
        (see :func:`fold_inference_params`). Every block is conv+bias+ReLU;
        zero batch-norm work in the graph.

        ``upsample_outputs=False`` returns 1/8-res logits so the caller
        can choose the upsample formulation (the serving engine uses the
        MXU interp-matmul path — ops/resize.py).

        The optional ``act_fake_quant`` field (callable ``y → y``,
        installed via ``dataclasses.replace``) is applied to every conv
        INPUT — the post-training-quantization simulation hook used by
        ``tools/quant_study.py`` to measure int8 accuracy before any
        int8 kernel work. ``None`` (the default) adds nothing to the
        traced graph."""
        hook = self.act_fake_quant
        if hook is None:
            aq = lambda y, site=None: y  # noqa: E731
        else:
            import inspect

            try:
                _params = inspect.signature(hook).parameters
                _takes_site = "site" in _params or any(
                    p.kind is inspect.Parameter.VAR_KEYWORD for p in _params.values()
                )
            except (ValueError, TypeError):
                _takes_site = False
            if _takes_site:
                aq = hook
            else:  # site-less y→y hooks keep working
                aq = lambda y, site=None: hook(y)  # noqa: E731

        int8_scales = dict(self.pw_act_scales) if self.folded_pw_impl != "conv" else {}

        def pw_int8(p, y, site, relu):
            """Route one 1×1 conv through the fused int8 kernel: quantize
            the input (fuses into the producer's epilogue), fold the
            activation scale into the weights at trace time, keep the
            accumulator in VMEM (ops/pallas/int8_pw.py)."""
            from fastscnn_tpu.ops.pallas.int8_pw import (
                pw_conv_a8,
                pw_conv_w8a8,
                quantize_act,
            )

            s = int8_scales[site]
            if p["w"].shape[:2] != (1, 1):
                raise ValueError(f"int8 pw site {site!r} is not a 1×1 conv: {p['w'].shape}")
            q = quantize_act(y, s)
            w2 = p["w"][0, 0]  # HWIO 1×1 → (cin, cout)
            if self.folded_pw_impl == "int8-a8":
                return pw_conv_a8(
                    q, (w2.astype(jnp.float32) * s).astype(jnp.bfloat16), p["b"],
                    relu=relu, use_pallas=self.pw_use_pallas,
                )
            # 'int8-w8a8': per-channel weight quantization (the study's
            # w8-perchan grid) + the native s8×s8→s32 MXU dot
            wf = w2.astype(jnp.float32)
            amax = jnp.max(jnp.abs(wf), axis=0)
            s_w = jnp.where(amax > 0, amax / 127.0, 1.0)
            w_q = jnp.clip(jnp.round(wf / s_w), -127, 127).astype(jnp.int8)
            return pw_conv_w8a8(
                q, w_q, s * s_w, p["b"], relu=relu, use_pallas=self.pw_use_pallas,
            )

        def cbr(p, y, stride=1, padding=0, groups=1, relu=True, site=None):
            if site is not None and site in int8_scales:
                return pw_int8(p, y, site, relu)
            y = conv2d(
                aq(y, site), p["w"], p["b"], stride=stride, padding=padding, groups=groups
            )
            return jax.nn.relu(y) if relu else y

        def cbr_dw_alt(p, y, stride):
            if self.folded_dw_impl == "taps":
                return jax.nn.relu(dw_conv2d_taps(y, p["w"], p["b"], stride=stride, padding=1))
            # 'pallas': fused dw+bias+ReLU row kernel — ONE HBM round trip
            from fastscnn_tpu.ops.pallas.dw_conv import dw_conv3x3_pallas

            return dw_conv3x3_pallas(y, p["w"], p["b"], stride=stride, padding=1, relu=True)

        def ds(p, y, stride=1, dw_alt=False, site=None):
            if self.folded_dw_impl in ("fused-ds", "fused-ds-mr") and dw_alt:
                # whole DSConv in one kernel: the dw intermediate never
                # touches HBM; '-mr' = multi-row double-buffered manual-DMA
                # variant (~1.06× input re-read vs the row kernel's 1.5×)
                from fastscnn_tpu.ops.pallas.dw_conv import (
                    ds_conv3x3_pw_pallas,
                    ds_conv3x3_pw_pallas_multirow,
                )

                fn = (
                    ds_conv3x3_pw_pallas
                    if self.folded_dw_impl == "fused-ds"
                    else ds_conv3x3_pw_pallas_multirow
                )
                return fn(
                    y, p["dw"]["w"], p["dw"]["b"], p["pw"]["w"], p["pw"]["b"],
                    stride=stride, padding=1,
                )
            if dw_alt:
                y = cbr_dw_alt(p["dw"], y, stride)
            else:
                y = cbr(
                    p["dw"], y, stride=stride, padding=1, groups=y.shape[-1],
                    site=site and f"{site}/dw",
                )
            return cbr(p["pw"], y, site=site and f"{site}/pw")

        def bottleneck(p, y, stride, site=None):
            cin = y.shape[-1]
            z = cbr(p["expand"], y, site=site and f"{site}/expand")
            z = cbr(
                p["dw"], z, stride=stride, padding=1, groups=z.shape[-1],
                site=site and f"{site}/dw",
            )
            z = cbr(p["project"], z, relu=False, site=site and f"{site}/project")
            if stride == 1 and cin == z.shape[-1]:
                z = y + z
            return z

        size = (x.shape[1], x.shape[2])
        p = fparams
        # LTD
        dw_alt = self.folded_dw_impl in ("taps", "pallas", "fused-ds", "fused-ds-mr")
        y = cbr(p["learning_to_downsample"]["conv"], x, stride=2, site="ltd/conv")
        y = ds(
            p["learning_to_downsample"]["dsconv1"], y, stride=2, dw_alt=dw_alt,
            site="ltd/dsconv1",
        )
        higher = ds(
            p["learning_to_downsample"]["dsconv2"], y, stride=2, dw_alt=dw_alt,
            site="ltd/dsconv2",
        )
        # GFE
        y = higher
        g = p["global_feature_extractor"]
        for name, stride in (("bottleneck1", 2), ("bottleneck2", 2), ("bottleneck3", 1)):
            for i, bp in enumerate(g[name]):
                y = bottleneck(bp, y, stride if i == 0 else 1, site=f"gfe/{name}/{i}")
        psize = (y.shape[1], y.shape[2])
        feats = [y]
        for conv_name, pool_size in zip(("conv1", "conv2", "conv3", "conv4"), self.ppm_sizes):
            z = adaptive_avg_pool(y, pool_size)
            z = cbr(g["ppm"][conv_name], z, site=f"gfe/ppm/{conv_name}")
            feats.append(
                resize_bilinear_matmul(z, psize, align_corners=self.ppm_align_corners)
            )
        y = jnp.concatenate(feats, axis=-1)
        lower = cbr(g["ppm"]["out"], y, site="gfe/ppm/out")
        # FFM
        f = p["feature_fusion"]
        # Matmul-formulated resizes in the folded (serving) graph: the FFM
        # ×4 upsample was 9.5% of E2E as lane gathers (docs/PERFORMANCE.md);
        # the training-mode apply() above keeps the bit-exact gather path.
        lo = resize_bilinear_matmul(
            lower, (higher.shape[1], higher.shape[2]), align_corners=True
        )
        lo = cbr(f["dwconv"], lo, padding=1, groups=lo.shape[-1], site="ffm/dwconv")
        lo = cbr(f["conv_lower_res"], lo, relu=False, site="ffm/conv_lower_res")
        hi = cbr(f["conv_higher_res"], higher, relu=False, site="ffm/conv_higher_res")
        fused = jax.nn.relu(hi + lo)
        # Classifier
        c = p["classifier"]
        y = ds(c["dsconv1"], fused, site="cls/dsconv1")
        y = ds(c["dsconv2"], y, site="cls/dsconv2")
        logits = conv2d(aq(y, "cls/conv"), c["conv"]["w"], c["conv"]["b"])
        if upsample_outputs:
            logits = resize_bilinear_matmul(logits, size, align_corners=True)
        if self.aux and "auxlayer" in p:
            a = p["auxlayer"]
            z = cbr(a["conv1"], higher, padding=1, site="aux/conv1")
            auxout = conv2d(aq(z, "aux/conv2"), a["conv2"]["w"], a["conv2"]["b"])
            if upsample_outputs:
                auxout = resize_bilinear_matmul(auxout, size, align_corners=True)
            return (logits, auxout)
        return (logits,)


def init_fast_scnn(key, num_classes: int, aux: bool = False) -> tuple[Params, Params]:
    """Initialize (params, state) trees for Fast-SCNN."""
    keys = iter(jax.random.split(key, 64))
    params: Params = {}
    state: Params = {}

    # LTD
    conv_p, conv_s = _init_cbr(next(keys), 3, _LTD[0], 3)
    ds1_p, ds1_s = _init_ds(next(keys), _LTD[0], _LTD[1])
    ds2_p, ds2_s = _init_ds(next(keys), _LTD[1], _LTD[2])
    params["learning_to_downsample"] = {"conv": conv_p, "dsconv1": ds1_p, "dsconv2": ds2_p}
    state["learning_to_downsample"] = {"conv": conv_s, "dsconv1": ds1_s, "dsconv2": ds2_s}

    # GFE
    gfe_p: Params = {}
    gfe_s: Params = {}
    chans = [(_LTD[2], _GFE_BLOCKS[0]), (_GFE_BLOCKS[0], _GFE_BLOCKS[1]), (_GFE_BLOCKS[1], _GFE_BLOCKS[2])]
    for stage, ((cin, cout), nblocks) in enumerate(zip(chans, _GFE_NUM), start=1):
        blocks_p, blocks_s = [], []
        for i in range(nblocks):
            bp, bs = _init_bottleneck(next(keys), cin if i == 0 else cout, cout, _GFE_T)
            blocks_p.append(bp)
            blocks_s.append(bs)
        gfe_p[f"bottleneck{stage}"] = blocks_p
        gfe_s[f"bottleneck{stage}"] = blocks_s
    inter = _GFE_BLOCKS[2] // 4
    ppm_p: Params = {}
    ppm_s: Params = {}
    for name in ("conv1", "conv2", "conv3", "conv4"):
        ppm_p[name], ppm_s[name] = _init_cbr(next(keys), _GFE_BLOCKS[2], inter, 1)
    ppm_p["out"], ppm_s["out"] = _init_cbr(next(keys), _GFE_BLOCKS[2] * 2, _GFE_OUT, 1)
    gfe_p["ppm"] = ppm_p
    gfe_s["ppm"] = ppm_s
    params["global_feature_extractor"] = gfe_p
    state["global_feature_extractor"] = gfe_s

    # FFM — note conv_lower_res / conv_higher_res are 1×1 convs *with* bias
    # (nn.Conv2d default, reference:models/fast_scnn.py:197-204).
    dw_p, dw_s = _init_cbr(next(keys), _GFE_OUT, _FFM_OUT, 3, groups=_GFE_OUT)
    lower_p = _init_conv_bias(next(keys), _FFM_OUT, _FFM_OUT, 1)
    lower_p["bn"] = _bn_params(_FFM_OUT)
    higher_p = _init_conv_bias(next(keys), _LTD[2], _FFM_OUT, 1)
    higher_p["bn"] = _bn_params(_FFM_OUT)
    params["feature_fusion"] = {
        "dwconv": dw_p,
        "conv_lower_res": lower_p,
        "conv_higher_res": higher_p,
    }
    state["feature_fusion"] = {
        "dwconv": dw_s,
        "conv_lower_res": {"bn": _bn_state(_FFM_OUT)},
        "conv_higher_res": {"bn": _bn_state(_FFM_OUT)},
    }

    # Classifier
    c1_p, c1_s = _init_ds(next(keys), _FFM_OUT, _FFM_OUT)
    c2_p, c2_s = _init_ds(next(keys), _FFM_OUT, _FFM_OUT)
    params["classifier"] = {
        "dsconv1": c1_p,
        "dsconv2": c2_p,
        "conv": _init_conv_bias(next(keys), _FFM_OUT, num_classes, 1),
    }
    state["classifier"] = {"dsconv1": c1_s, "dsconv2": c2_s}

    if aux:
        a1 = {"w": _conv_init(next(keys), 3, 3, _LTD[2], 32), "bn": _bn_params(32)}
        params["auxlayer"] = {
            "conv1": a1,
            "conv2": _init_conv_bias(next(keys), 32, num_classes, 1),
        }
        state["auxlayer"] = {"conv1": {"bn": _bn_state(32)}}

    return params, state


def _fold_tree(p: Params, s: Params) -> Params:
    """Recursively fold {w[,b],bn}+state{bn} leaves into {w,b}."""
    if isinstance(p, list):
        return [_fold_tree(pi, si) for pi, si in zip(p, s)]
    if isinstance(p, dict):
        if "w" in p and "bn" in p:
            w, b = fold_conv_bn(
                p["w"], p.get("b"), p["bn"]["scale"], p["bn"]["bias"], s["bn"]["mean"], s["bn"]["var"]
            )
            return {"w": w, "b": b}
        if "w" in p:  # plain conv (+bias), e.g. final classifier conv
            out = {"w": p["w"].astype(jnp.float32)}
            out["b"] = (
                p["b"].astype(jnp.float32) if "b" in p else jnp.zeros((p["w"].shape[-1],), jnp.float32)
            )
            return out
        return {k: _fold_tree(p[k], s.get(k, {}) if isinstance(s, dict) else {}) for k in p}
    return p


def fold_inference_params(params: Params, state: Params, dtype=jnp.bfloat16) -> Params:
    """Produce the BN-folded inference tree, cast to ``dtype`` (weights stay
    attached to f32 accumulation via ``preferred_element_type`` in conv2d).

    Equivalent in spirit to the reference's export-time graph surgery
    (reference:export_onnx_fixed.py:139-163) but done once at load."""
    folded = _fold_tree(params, state)
    return jax.tree_util.tree_map(lambda v: v.astype(dtype), folded)
