"""Fused bilinear-upsample + argmax Pallas kernel.

The serving hot spot: Fast-SCNN's final ×8 upsample of C-class logits to
full resolution (reference:models/fast_scnn.py:40) followed by argmax.
Done naively this materializes an (N, 1024, 2048, C) tensor — ~160 MB of
HBM write+read per 4-frame batch, which measured at ~7 ms/batch on v5e
(more than the whole backbone). This kernel computes the mask without
ever writing the full-resolution logits to HBM.

Formulation (gather-free, MXU-native): 1-D bilinear resampling along an
axis is multiplication by a banded two-tap matrix. So

    mask = argmax_C( A_H @ logits @ A_W )

with A_H (H_out, h) and A_W (w, W_out) built from the align_corners
source mapping. The kernel tiles over (batch, H_out/TH): each step
  1. H-expands a TH-row strip:  (TH, h) @ (h, C·w)    [tiny matmul]
  2. W-expands:                 (TH·C, w) @ (w, W)    [the big matmul,
     M = TH·C ≈ 300, K = w, N = W — all MXU-aligned]
  3. argmaxes over C in VMEM and writes only the (TH, W) int32 mask.

HBM traffic per image: read h·C·w logits (~1 MB) + write H·W int mask —
two orders of magnitude less than the naive path. The dense matmuls
"waste" FLOPs vs the 2-tap band structure, but at these shapes the MXU
is bandwidth-starved anyway (~80 GFLOP per 4-frame batch ≈ 0.4 ms).

Interpolation runs in bf16 with f32 accumulation; ties and near-ties can
differ from the f32 reference on <0.01% of pixels (well inside the 0.38%
mask-diff tolerance of reference:compare_pytorch_onnx.py).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from fastscnn_tpu.ops.resize import (
    _interp_matrix as _resize_interp_matrix,
    resize_bilinear,
)

__all__ = ["upsample_argmax", "packed_argmax"]


def packed_argmax(y: jnp.ndarray, axis: int, out_dtype=jnp.int32) -> jnp.ndarray:
    """``argmax`` as a SINGLE-accumulator max-reduce via bit-packing.

    **Measured rejection (2026-08-17): do NOT use on the serving path.**
    Hypothesis was that XLA's variadic (max-value, index) reduce wastes
    HBM writes on the dead bf16 max output; the interleaved A/B at the
    flagship shape (batch 128, 1024×2048×19 bf16) says otherwise:
    1,022 fps with this packing vs 1,576 fps with plain ``jnp.argmax``
    (−35%). XLA fuses the variadic reduce into the H-matmul epilogue and
    never pays for the max tensor, while the packing's bitcast / where /
    iota / shift passes are extra VPU work that the fusion then carries
    per output element. Kept (exact + tested) as a documented rejected
    experiment; see docs/PERFORMANCE.md "Rejected after honest A/B".

    Mechanics: map each bf16 value's bits to an order-preserving uint16
    (IEEE trick: flip all bits of negatives, set the sign bit of
    non-negatives), pack ``(ordered << 8) | (C-1-class)`` into one
    int32, take a plain ``max`` reduce, decode the class from the low
    byte. Ordering is exact and ties break toward the LOWEST class
    index — identical to ``jnp.argmax``'s first-occurrence rule.

    Falls back to ``jnp.argmax`` for non-bf16 dtypes or C > 256.
    """
    axis = axis % y.ndim
    c = y.shape[axis]
    if y.dtype != jnp.bfloat16 or c > 256:
        return jnp.argmax(y, axis=axis).astype(out_dtype)
    u = jax.lax.bitcast_convert_type(y, jnp.uint16).astype(jnp.int32)
    ordered = jnp.where(u & 0x8000 != 0, ~u & 0xFFFF, u | 0x8000)
    cls = jax.lax.broadcasted_iota(jnp.int32, y.shape, axis)
    packed = (ordered << 8) | (c - 1 - cls)
    m = jnp.max(packed, axis=axis)
    return ((c - 1) - (m & 0xFF)).astype(out_dtype)


def _interp_matrix(in_size: int, out_size: int, align_corners: bool, transpose: bool):
    """Dense two-tap interpolation matrix — the single shared builder in
    ops/resize.py, oriented (out, in) here unless ``transpose``."""
    m = _resize_interp_matrix(in_size, out_size, align_corners).T  # (out, in)
    return np.ascontiguousarray(m.T) if transpose else np.ascontiguousarray(m)


def _pick_tile(total: int, target: int = 16) -> int:
    for t in range(target, 0, -1):
        if total % t == 0:
            return t
    return 1


def _xla_reference(logits, out_size, align_corners):
    up = resize_bilinear(logits.astype(jnp.float32), out_size, align_corners=align_corners)
    return jnp.argmax(up, axis=-1).astype(jnp.int32)


def upsample_argmax(
    logits: jnp.ndarray,
    out_size: tuple[int, int],
    align_corners: bool = True,
    use_pallas: bool | None = None,
) -> jnp.ndarray:
    """``argmax_C(bilinear_resize(logits, out_size))`` for NHWC logits.

    Returns (N, H_out, W_out) int32. Falls back to the XLA path on
    non-TPU backends or shapes the kernel doesn't tile.
    """
    n, h, w, c = logits.shape
    out_h, out_w = int(out_size[0]), int(out_size[1])
    if use_pallas is None:
        # Default OFF, by honest measurement (2026-08-17, interleaved
        # E2E A/B on v5e): this kernel reaches 959 fps at batch 64 vs
        # 1,132 fps for the plain-XLA interp-matmul path
        # (ops/resize.py::resize_bilinear_matmul + argmax) — XLA
        # pipelines the big W-contraction better and already fuses the
        # argmax. Selectable via E2EConfig.final_upsample='pallas';
        # revisit for C ≫ 19.
        use_pallas = False
    th = _pick_tile(out_h)
    # VMEM budget: full input strip + A_H + A_W + f32 expansion buffer.
    vmem_est = (
        h * c * w * 2 + out_h * h * 2 + w * out_w * 2 + th * c * out_w * 4 + th * c * w * 4
    )
    if (
        not use_pallas
        or jax.default_backend() not in ("tpu", "axon")
        or th < 4
        or vmem_est > 100 * 2**20
        or (h, w) == (out_h, out_w)
    ):
        return _xla_reference(logits, out_size, align_corners)

    from jax.experimental import pallas as pl

    a_h = jnp.asarray(_interp_matrix(h, out_h, align_corners, transpose=False), jnp.bfloat16)
    a_w = jnp.asarray(_interp_matrix(w, out_w, align_corners, transpose=True), jnp.bfloat16)
    # (N, h, w, C) → (N, h, C, w) so both kernel reshapes are contiguous.
    x = jnp.transpose(logits.astype(jnp.bfloat16), (0, 1, 3, 2))

    def kernel(x_ref, ah_ref, aw_ref, out_ref):
        xm = x_ref[0].reshape(h, c * w)
        y = jnp.dot(ah_ref[:], xm, preferred_element_type=jnp.float32)  # (th, c*w)
        y = y.astype(jnp.bfloat16).reshape(th * c, w)
        z = jnp.dot(y, aw_ref[:], preferred_element_type=jnp.float32)  # (th*c, W)
        z = z.reshape(th, c, out_w)
        best = z[:, 0, :]
        idx = jnp.zeros((th, out_w), jnp.int32)
        for cls in range(1, c):
            cur = z[:, cls, :]
            upd = cur > best
            best = jnp.where(upd, cur, best)
            idx = jnp.where(upd, cls, idx)
        out_ref[0] = idx

    grid = (n, out_h // th)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, h, c, w), lambda i, j: (i, 0, 0, 0)),
            pl.BlockSpec((th, h), lambda i, j: (j, 0)),
            pl.BlockSpec((w, out_w), lambda i, j: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, th, out_w), lambda i, j: (i, j, 0)),
        out_shape=jax.ShapeDtypeStruct((n, out_h, out_w), jnp.int32),
    )(x, a_h, a_w)


def _block_start(i0, h, out_h, align_corners):
    """⌊src(i0)⌋ of the 1-D resample mapping in exact integer math,
    BEFORE the clamp to [0, h−1] (align_corners=False can return −1 for
    the first rows). Works for Python ints and traced scalars alike —
    both use floor division, so the kernel and the plan cannot drift.

    align_corners=True:  src = i·(h−1)/(H−1)
    align_corners=False: src = (i+0.5)·h/H − 0.5 = ((2i+1)h − H)/(2H)
    """
    if align_corners:
        return (i0 * (h - 1)) // max(out_h - 1, 1)
    return ((2 * i0 + 1) * h - out_h) // (2 * out_h)


def _hybrid_plan(h, w, c, out_h, out_w, align_corners, itemsize):
    """Shape plan + engagement gate for the blocked hybrid kernel.

    Returns ``(ok, th, win, wblk, nj, walign)``; ``ok`` covers only the
    shape legality — the caller ANDs in the backend/opt-in checks. Pure
    so tests can probe the gate at shapes the CPU suite cannot execute.

    - ``th``: output-row tile; ``win``: the source-row window (the MXU K
      dim, pads to 128 either way), sized from the scale with slack.
    - Coverage + alignment are then verified AUTHORITATIVELY, per block,
      against ``_axis_lerp_coeffs`` — the single source of truth for the
      rows an output row interpolates from — using the exact same
      ``_block_start`` arithmetic the kernel executes. A closed-form
      gate here previously used the align_corners source mapping
      unconditionally, so align_corners=False (whose half-pixel mapping
      can need row ⌊src⌋ = start−1) passed the gate while the kernel
      read the wrong rows (round-2 advisor finding). Any block whose
      floor-aligned, clamped window misses a needed row, or whose
      clamped start breaks the ``pl.multiple_of`` promise (the 480²
      serving case: h=60, block 7 clamps to 28), rejects the plan.
    - ``wblk``/``nj``: W split so the f32 (th, C·wblk) product and the
      (h, C, wblk) input strip fit VMEM comfortably.
    """
    th = 128 if out_h % 128 == 0 else _pick_tile(out_h, 64)
    walign = 16
    scale = (h - 1) / (out_h - 1) if (align_corners and out_h > 1) else h / out_h
    span = int(np.ceil(th * scale)) + 3
    win = min(h, -(-(span + walign - 1) // walign) * walign)
    wblk, nj = out_w, 1
    while th * c * wblk * 4 > 5 * 2**20 and wblk % 2 == 0:
        wblk //= 2
        nj *= 2
    from fastscnn_tpu.ops.resize import _axis_lerp_coeffs

    cover_ok = out_h % th == 0 and 0 < win <= h
    if cover_ok:
        lo_all, hi_all, _ = _axis_lerp_coeffs(h, out_h, align_corners)
        for k in range(out_h // th):
            s = max(int(_block_start(k * th, h, out_h, align_corners)), 0)
            s = min((s // walign) * walign, h - win)
            need_lo = int(lo_all[k * th : (k + 1) * th].min())
            need_hi = int(hi_all[k * th : (k + 1) * th].max())
            if s % walign != 0 or s < 0 or not (s <= need_lo and need_hi < s + win):
                cover_ok = False
                break
    ok = (
        cover_ok
        and th * c * wblk * 4 <= 5 * 2**20
        and h * c * wblk * itemsize <= 4 * 2**20
        and (h, w) != (out_h, out_w)
    )
    return ok, th, win, wblk, nj, walign


def w_matmul_h_lerp_argmax(
    logits: jnp.ndarray,
    out_size: tuple[int, int],
    align_corners: bool = True,
    use_pallas: bool | None = None,
    out_dtype=jnp.int32,
) -> jnp.ndarray:
    """Hybrid mask path: W-upsample on the MXU, then H-upsample + argmax
    — by default as a second interp-matmul + XLA argmax in the
    (N, h, C, W) layout; opt-in (``use_pallas=True``) as a blocked
    Pallas kernel.

    History, honestly attributed (batch-128 serving A/Bs on v5e,
    2026-08-17): the +3.9% this mode delivers over 'matmul'
    (1,564 vs 1,505 fps) comes from the LAYOUT PLAN — contracting W
    first keeps W minor through both matmuls and lets XLA fuse the
    argmax over the (N, H, C, W) product without the relayout copies the
    'matmul' path (H-first via `resize_bilinear_matmul`) incurs. The
    blocked Pallas kernel below was written to replace XLA's 188 GB/s
    H-lerp+argmax `iota_reduce_fusion`, but its shape gate silently
    failed at the flagship 1024×2048 shape (fixed 32-row window < the
    33-row aligned span), so every committed benchmark of "hybrid" ran
    this matmul fallback. With the gate fixed the kernel engages and
    measures **954 fps vs 1,576 fps** for the fallback at batch 64-128 —
    the in-kernel (win, C·W_blk) reshape + K=win≤48-padded-to-128 MXU
    matmuls lose to XLA's pipelined full-K contraction. Kernel kept
    opt-in for study; the matmul plan is the measured default.

    A per-row fori_loop + dynamic-slice formulation measured 1,115 fps
    (per-row granularity dominates) and was replaced by this blocked
    version before both were rejected by the A/B above.

    Sampling weights identical to the 'matmul' path (same
    `_interp_matrix`); interpolation accumulates in f32 on the MXU and
    argmaxes the f32 result (the 'matmul' path rounds its H pass to bf16
    before argmax, so near-tie pixels can differ — ~0.3% on random
    logits; boundary pixels only on real ones).
    """
    n, h, w, c = logits.shape
    out_h, out_w = int(out_size[0]), int(out_size[1])
    if use_pallas is None:
        # Default OFF by measurement (see docstring): 954 vs 1,576 fps
        # at the flagship shape once the kernel actually engages.
        use_pallas = False

    # W-upsample (MXU, input dtype, same matrix/precision discipline as
    # resize_bilinear_matmul) — laid out (N, h, C, W) so W stays minor.
    from fastscnn_tpu.ops.conv import f32_precision
    from fastscnn_tpu.ops.resize import _interp_matrix as _im

    dt = logits.dtype
    xw = jnp.tensordot(
        logits,
        jnp.asarray(_im(w, out_w, align_corners), dt),
        axes=[[2], [0]],
        precision=f32_precision(dt),
    )  # (N, h, C, W_out)

    shape_ok, th, win, wblk, nj, walign = _hybrid_plan(
        h, w, c, out_h, out_w, align_corners, jnp.dtype(dt).itemsize
    )
    ok = use_pallas and jax.default_backend() in ("tpu", "axon") and shape_ok
    if not ok:
        y = _matmul_h(xw, out_h, align_corners)
        # Plain jnp.argmax: the variadic reduce fuses into the H-matmul
        # epilogue; packed_argmax was A/B'd 35% slower here (see its doc).
        return jnp.argmax(y, axis=2).astype(out_dtype)

    from jax.experimental import pallas as pl

    # (h, out_h) orientation: the dynamic win-row slice runs over
    # SUBLANES (walign=16 matches the bf16 sublane tile) — a lane-dim
    # slice at non-128 multiples is rejected by Mosaic.
    a_mat = jnp.asarray(np.ascontiguousarray(_im(h, out_h, align_corners)), dt)

    def kernel(a_ref, x_ref, out_ref):
        k = pl.program_id(2)
        # Same arithmetic _hybrid_plan verified against _axis_lerp_coeffs
        # (align_corners=False's half-pixel ⌊src⌋ can be −1 → clamp at 0).
        s = jnp.maximum(_block_start(k * th, h, out_h, align_corners), 0)
        s = jnp.minimum((s // walign) * walign, h - win)
        s = pl.multiple_of(s, walign)
        a_blk = a_ref[pl.ds(s, win), :]                       # (win, th)
        win_m = x_ref[0, pl.ds(s, win)].reshape(win, c * wblk)
        z = jax.lax.dot_general(
            a_blk, win_m,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (th, c*wblk)
        z = z.reshape(th, c, wblk)
        best = z[:, 0, :]
        idx = jnp.zeros((th, wblk), jnp.int32)
        for cls in range(1, c):
            cur = z[:, cls, :]
            upd = cur > best
            best = jnp.where(upd, cur, best)
            idx = jnp.where(upd, cls, idx)
        out_ref[0] = idx

    grid = (n, nj, out_h // th)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((h, th), lambda i, j, k: (0, k)),
            # the whole (h, C, wblk) strip; constant over k so Pallas
            # fetches it once per (image, W block)
            pl.BlockSpec((1, h, c, wblk), lambda i, j, k: (i, 0, 0, j)),
        ],
        out_specs=pl.BlockSpec((1, th, wblk), lambda i, j, k: (i, k, j)),
        out_shape=jax.ShapeDtypeStruct((n, out_h, out_w), jnp.int32),
    )(a_mat, xw)
    return out.astype(out_dtype)


def _lo_onehot(in_size: int, out_size: int, align_corners: bool) -> np.ndarray:
    """(out, in) 0/1 matrix selecting each output position's FLOOR source
    index (⌊src⌋ from the authoritative ``_axis_lerp_coeffs``). Matmul by
    this matrix is an exact gather-free nearest-style expansion on the
    MXU — integer values ≤ 256 survive bf16 exactly."""
    from fastscnn_tpu.ops.resize import _axis_lerp_coeffs

    lo, _, _ = _axis_lerp_coeffs(in_size, out_size, align_corners)
    m = np.zeros((out_size, in_size), np.float32)
    m[np.arange(out_size), lo] = 1.0
    return m


def neighborhood_agreement_mask(
    logits: jnp.ndarray,
    out_size: tuple[int, int],
    align_corners: bool = True,
    out_dtype=jnp.int32,
) -> jnp.ndarray:
    """EXACT fast mask via neighborhood agreement (docs/PERFORMANCE.md
    Future-work #2, built and A/B'd in round 3).

    Theorem: if every source pixel of an output pixel's 2×2 bilinear
    footprint has the same argmax class c, the interpolated pixel's
    argmax is c — convex combinations preserve dominance: z = Σ wᵢzᵢ
    with zᵢ[c] ≥ zᵢ[k] ∀i,k gives z[c] ≥ z[k]; strictness at k < c
    follows from first-occurrence argmax picking c at each corner, so
    the tie-break also matches ``jnp.argmax`` exactly.

    Dense TPU-friendly formulation (no sparse control flow):
      1. low-res argmax ``am`` (N,h,w) — cheap;
      2. per-CELL unanimity from three shifted equalities (right, down,
         diagonal — pairwise equality of all 4 corners follows);
      3. pack ``am + 32·unanimous`` and expand to full res with ⌊src⌋
         one-hot interp-matmuls (C=1 — 19× less MXU work than the
         logits expansion), decode class/flag;
      4. ``where(unanimous, corner class, full interp argmax)`` with the
         interp branch the default 'hybrid' matmul plan.

    Exactness caveat (measured, see tests): the theorem is exact in real
    arithmetic; the default path rounds its interp to bf16 before the
    argmax, so a near-tie at a unanimous pixel can round to equality and
    flip the default's argmax to a LOWER class index while this path
    keeps c. On random logits that affects <0.1% of pixels (the same
    near-tie band as every other formulation here); on real trained
    logits boundary pixels are never unanimous, so the two paths agree.

    The dense formulation computes the full interp branch anyway, so it
    can only be SLOWER than the default — it exists to pin the semantics
    and as the correctness reference for a sparse (capacity-gathered)
    variant; see the A/B table in docs/PERFORMANCE.md for the measured
    numbers and the verdict.
    """
    n, h, w, c = logits.shape
    out_h, out_w = int(out_size[0]), int(out_size[1])
    am = jnp.argmax(logits, axis=-1).astype(jnp.int32)  # (N,h,w)
    # cell unanimity: corners (y,x),(y,x+1),(y+1,x),(y+1,x+1) all equal
    # (edge-clamped shifts make border cells compare with themselves)
    am_r = jnp.concatenate([am[:, :, 1:], am[:, :, -1:]], axis=2)
    am_d = jnp.concatenate([am[:, 1:, :], am[:, -1:, :]], axis=1)
    am_dr = jnp.concatenate([am_d[:, :, 1:], am_d[:, :, -1:]], axis=2)
    unanimous = (am == am_r) & (am == am_d) & (am == am_dr)
    # expansion dtype follows the logits (bf16 serving → MXU rate; f32 on
    # CPU where eager bf16 dots are unsupported) — packed ints ≤ 50 are
    # exact in bf16, and one-hot rows have a single nonzero, so the
    # matmul is an exact selection either way
    dt = logits.dtype
    packed = (am + 32 * unanimous.astype(jnp.int32)).astype(dt)
    e_h = jnp.asarray(_lo_onehot(h, out_h, align_corners), dt)
    e_w = jnp.asarray(_lo_onehot(w, out_w, align_corners).T, dt)
    up = jnp.einsum(
        "Oh,nhw,wW->nOW", e_h, packed, e_w,
        preferred_element_type=jnp.float32,
    ).astype(jnp.int32)
    near_cls, near_ok = up % 32, up >= 32
    interp = w_matmul_h_lerp_argmax(
        logits, out_size, align_corners, use_pallas=False, out_dtype=jnp.int32
    )
    return jnp.where(near_ok, near_cls, interp).astype(out_dtype)


def _matmul_h(xw: jnp.ndarray, out_h: int, align_corners: bool):
    """H-upsample of an (N, h, C, W) strip via interp-matmul (fallback)."""
    from fastscnn_tpu.ops.conv import f32_precision
    from fastscnn_tpu.ops.resize import _interp_matrix as _im

    a = jnp.asarray(_im(xw.shape[1], out_h, align_corners), xw.dtype)
    y = jnp.tensordot(xw, a, axes=[[1], [0]], precision=f32_precision(xw.dtype))
    return jnp.moveaxis(y, -1, 1)  # (N, H, C, W)
