"""Int8 pointwise-conv serving: site enumeration, calibration, model build.

The serving graph's 1×1 convs are HBM-bandwidth-bound (600-700 GB/s
measured, docs/PERFORMANCE.md), so int8 activations halve their input
traffic. The PTQ accuracy study (docs/quant_study_r3.json) showed the
int8 value grid costs ≤0.005 mIoU on the 19-class fixture set; the fused
Pallas kernels (ops/pallas/int8_pw.py) realize it without the XLA
requant round-trip that killed the round-2 int8 probe.

This module provides the deployment pieces:

- :data:`PW_INT8_SITES` — the eligible conv sites (every non-head,
  non-tiny 1×1 conv of ``apply_folded``; heads stay bf16 per the study's
  "skip-ends" variant, the tiny pooled PPM convs aren't worth a
  quantize step).
- :func:`calibrate_pw_scales` — per-site MinMax activation scales over
  calibration batches (the study's calibration, keyed by site instead
  of call index).
- :func:`quantized_model` — a FastSCNN configured to run those sites
  through the int8 kernels.

Reference mapping: the reference has no in-repo quantized path — its
Ascend deployment quantizes offline inside ATC
(reference:ATLAS_DEPLOYMENT_GUIDE.md); this is the TPU-native analog
with the quantization step owned by the framework.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

__all__ = ["PW_INT8_SITES", "calibrate_pw_scales", "quantized_model"]


def _bottleneck_sites():
    for stage in (1, 2, 3):
        for i in range(3):
            yield f"gfe/bottleneck{stage}/{i}/expand"
            yield f"gfe/bottleneck{stage}/{i}/project"


PW_INT8_SITES: tuple[str, ...] = (
    "ltd/dsconv1/pw",
    "ltd/dsconv2/pw",
    *_bottleneck_sites(),
    "gfe/ppm/out",
    "ffm/conv_lower_res",
    "ffm/conv_higher_res",
    "cls/dsconv1/pw",
    "cls/dsconv2/pw",
)


class _SiteAmaxHook:
    """act_fake_quant hook that records per-site max|x| as traced values."""

    def __init__(self, sites):
        self.sites = frozenset(sites)
        self.amax = {}

    def __call__(self, y, site=None):
        if site in self.sites:
            m = jnp.max(jnp.abs(y.astype(jnp.float32)))
            self.amax[site] = (
                jnp.maximum(self.amax[site], m) if site in self.amax else m
            )
        return y

    def reset(self):
        self.amax = {}


def calibrate_pw_scales(model, folded, batches, sites=PW_INT8_SITES, preprocess=None):
    """Per-site symmetric int8 scales (max|x|/127) over ``batches``.

    ``batches`` — iterable of arrays fed to ``apply_folded`` (after
    ``preprocess`` if given — pass the serving normalization so scales
    match deployment inputs). Returns a hashable sorted tuple of
    ``(site, scale)`` pairs ready for :func:`quantized_model`.
    """
    import numpy as np

    hook = _SiteAmaxHook(sites)
    qmodel = dataclasses.replace(
        model, act_fake_quant=hook, folded_pw_impl="conv", pw_act_scales=()
    )

    @jax.jit
    def amax_fn(batch):
        hook.reset()
        x = preprocess(batch) if preprocess is not None else batch
        qmodel.apply_folded(folded, x, upsample_outputs=False)
        return dict(hook.amax)

    total: dict[str, float] = {}
    for b in batches:
        out = {k: float(v) for k, v in amax_fn(jnp.asarray(b)).items()}
        for k, v in out.items():
            total[k] = max(total.get(k, 0.0), v)
    missing = set(sites) - set(total)
    if missing:
        raise ValueError(f"sites never reached during calibration: {sorted(missing)}")
    return tuple(sorted((k, (v / 127.0) if v > 0 else 1.0) for k, v in total.items()))


def quantized_model(model, scales, impl: str = "int8-a8", use_pallas=None):
    """A copy of ``model`` whose calibrated pw-conv sites run through the
    fused int8 kernels (``impl`` ∈ {'int8-a8', 'int8-w8a8'})."""
    if impl not in ("int8-a8", "int8-w8a8"):
        raise ValueError(f"unknown int8 pw impl: {impl!r}")
    return dataclasses.replace(
        model,
        folded_pw_impl=impl,
        pw_act_scales=tuple(scales),
        pw_use_pallas=use_pallas,
        act_fake_quant=None,
    )
