"""Depthwise 3×3 conv Pallas kernels for the small-C stem.

Why: the LTD stem's stride-2 depthwise convs are the serving graph's #1
op (11.1 ms/iter at 169 GB/s, batch 128 — docs/PERFORMANCE.md round-2
profile) and a large share of the 19-class training step's stem cost.
XLA's depthwise path for these C ∈ {32, 48} shapes runs well below HBM
bandwidth; the op itself is trivially bandwidth-bound (9 FMAs per output
element).

Formulation: one grid step per (image, output row) — or per image with a
double-buffered manual-DMA row-block loop in the multirow variant. The
three input rows an output row needs arrive as three BlockSpec views of
the same padded tensor (block size 1 in H makes the index maps
element-granular, so no halo machinery is needed). Lanes carry C (padded
to 128 in VMEM — a capacity/ALU cost, not an HBM one: the DMA moves only
real bytes). Bias-add and ReLU fuse into the same kernel for the folded
serving graph.

Stride-2 column taps — the Mosaic constraint that shaped this file:
``vector.extract_strided_slice`` only allows stride-1 slices (verified
by cross-platform ``jax.export`` lowering, which caught the naive
strided-slice formulation before any hardware run). So for stride 2 the
padded input is reshaped at the XLA level to pair-merged lanes
``(…, Wp/2, 2C)`` — bitwise free, row-major — and each di contributes
two pairwise FMAs with concatenated weight vectors:

    acc2[k, 0:2C] += x2[k]   · [w(di,0,·), w(di,1,·)]   (taps dj=0,1)
    acc2[k, 0:2C] += x2[k+1] · [w(di,2,·), 0]           (tap  dj=2)

followed by ONE static lane fold ``acc = acc2[:, :C] + acc2[:, C:]`` —
all unit-stride slices. Integer indexing is avoided throughout (Mosaic
lowers it as an unsupported 1-D gather); everything is
slice-with-keepdims.

Semantics match ``ops.conv.conv2d(..., groups=C)`` exactly up to f32
accumulation order (the conv op also accumulates f32 internally); parity
is pinned by interpret-mode tests, the XLA fallback, and TPU-target
export lowering tests.

Reference mapping: the dw halves of reference:models/fast_scnn.py:64-79
(_DSConv) and :148-161 (LearningToDownsample).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

__all__ = [
    "dw_conv3x3_pallas",
    "dw_conv3x3_pallas_vjp",
    "ds_conv3x3_pw_pallas",
    "ds_conv3x3_pw_pallas_multirow",
]


def _out_len(size: int, k: int, stride: int, padding: int) -> int:
    from fastscnn_tpu.ops.conv import _conv_out_len

    return _conv_out_len(size, k, stride, padding)


def _xla_fallback(x, w, b, stride, padding, relu):
    from fastscnn_tpu.ops.conv import conv2d

    y = conv2d(x, w, b, stride=stride, padding=padding, groups=x.shape[-1])
    return jax.nn.relu(y) if relu else y


def _pad_input(x, padding, stride):
    """Spatially pad; for stride 2 additionally pad W to even and return
    the pair-merged view (N, Hp, Wp/2, 2C) — a bitwise-free reshape."""
    n, h, wd, c = x.shape
    wp = wd + 2 * padding
    extra = (wp % 2) if stride == 2 else 0
    xp = jnp.pad(x, ((0, 0), (padding, padding), (padding, padding + extra), (0, 0)))
    if stride == 2:
        return xp.reshape(n, h + 2 * padding, (wp + extra) // 2, 2 * c), (wp + extra) // 2
    return xp, wp


def _pair_weights(w, dtype=jnp.float32):
    """(3,3,1,C) → (w01 (3, 2C), w2 (3, 2C)): per-di concatenated tap
    vectors for the pair-merged stride-2 formulation."""
    c = w.shape[-1]
    wf = w.astype(dtype).reshape(3, 3, c)
    w01 = jnp.concatenate([wf[:, 0, :], wf[:, 1, :]], axis=-1)  # (3, 2C)
    w2 = jnp.concatenate([wf[:, 2, :], jnp.zeros((3, c), dtype)], axis=-1)
    return w01, w2


def _dw_rows_accum(rows_fn, w01_ref, w2_ref, w9_ref, stride, wo, c, row_offset=0):
    """Accumulate the 9 taps for one output row (or row-block slice).

    ``rows_fn(di)`` must return the di-th input row as a 2-D (Wcols, L)
    array — L = 2C pair-merged for stride 2, L = C for stride 1. Returns
    the folded (wo, c) f32 accumulator contribution.
    """
    if stride == 2:
        acc2 = None
        for di in range(3):
            row2 = rows_fn(di)  # (wp2, 2C) f32
            a = jax.lax.slice(row2, (row_offset, 0), (row_offset + wo, 2 * c))
            b = jax.lax.slice(row2, (row_offset + 1, 0), (row_offset + wo + 1, 2 * c))
            term = a * jax.lax.slice(w01_ref[:], (di, 0), (di + 1, 2 * c)) + b * jax.lax.slice(
                w2_ref[:], (di, 0), (di + 1, 2 * c)
            )
            acc2 = term if acc2 is None else acc2 + term
        return jax.lax.slice(acc2, (0, 0), (wo, c)) + jax.lax.slice(
            acc2, (0, c), (wo, 2 * c)
        )
    acc = None
    for di in range(3):
        row = rows_fn(di)  # (wp, C) f32
        for dj in range(3):
            seg = jax.lax.slice(row, (row_offset + dj, 0), (row_offset + dj + wo, c))
            term = seg * jax.lax.slice(w9_ref[:], (di * 3 + dj, 0), (di * 3 + dj + 1, c))
            acc = term if acc is None else acc + term
    return acc


def dw_conv3x3_pallas(
    x: jnp.ndarray,
    w: jnp.ndarray,
    b: jnp.ndarray | None = None,
    stride: int = 1,
    padding: int = 1,
    relu: bool = False,
    use_pallas: bool | None = None,
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused depthwise-3×3 [+bias][+ReLU], NHWC, multiplier 1.

    Forward-only (serving): for a differentiable version see
    :func:`dw_conv3x3_pallas_vjp`. Falls back to the lax conv on non-TPU
    backends unless ``interpret=True`` (tests run the actual kernel body
    in the Pallas interpreter on CPU).
    """
    kh, kw, mult, c = w.shape
    if (kh, kw, mult) != (3, 3, 1) or c != x.shape[-1]:
        raise ValueError(f"dw_conv3x3_pallas needs (3,3,1,C) weights, got {w.shape}")
    if stride not in (1, 2):
        raise ValueError(f"stride must be 1 or 2, got {stride}")
    if use_pallas is None:
        use_pallas = jax.default_backend() in ("tpu", "axon")
    if not (use_pallas or interpret):
        return _xla_fallback(x, w, b, stride, padding, relu)

    from jax.experimental import pallas as pl

    n, h, wd, _ = x.shape
    ho, wo = _out_len(h, 3, stride, padding), _out_len(wd, 3, stride, padding)
    xp, wcols = _pad_input(x, padding, stride)
    lanes = 2 * c if stride == 2 else c
    w01, w2 = _pair_weights(w)
    w9 = w.astype(jnp.float32).reshape(9, c)
    bias = jnp.zeros((1, c), jnp.float32) if b is None else b.astype(jnp.float32).reshape(1, c)

    def kernel(r0_ref, r1_ref, r2_ref, w01_ref, w2_ref, w9_ref, b_ref, out_ref):
        rows = (r0_ref, r1_ref, r2_ref)

        def row_of(di):
            return rows[di][0, 0].astype(jnp.float32)

        acc = _dw_rows_accum(row_of, w01_ref, w2_ref, w9_ref, stride, wo, c)
        acc = acc + b_ref[0:1, :]
        if relu:
            acc = jnp.maximum(acc, 0.0)
        out_ref[0, 0] = acc.astype(out_ref.dtype)

    grid = (n, ho)
    row_spec = lambda di: pl.BlockSpec(
        (1, 1, wcols, lanes), lambda i, j, di=di: (i, stride * j + di, 0, 0)
    )
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            row_spec(0),
            row_spec(1),
            row_spec(2),
            pl.BlockSpec((3, 2 * c), lambda i, j: (0, 0)),
            pl.BlockSpec((3, 2 * c), lambda i, j: (0, 0)),
            pl.BlockSpec((9, c), lambda i, j: (0, 0)),
            pl.BlockSpec((1, c), lambda i, j: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, wo, c), lambda i, j: (i, j, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((n, ho, wo, c), x.dtype),
        interpret=interpret,
    )(xp, xp, xp, w01, w2, w9, bias)


def ds_conv3x3_pw_pallas(
    x: jnp.ndarray,
    w_dw: jnp.ndarray,
    b_dw: jnp.ndarray,
    w_pw: jnp.ndarray,
    b_pw: jnp.ndarray,
    stride: int = 1,
    padding: int = 1,
    use_pallas: bool | None = None,
    interpret: bool = False,
) -> jnp.ndarray:
    """The full folded DSConv — relu(pw(relu(dw(x)+b_dw))+b_pw) — in ONE
    kernel (serving only; forward-only).

    Beyond :func:`dw_conv3x3_pallas` this also removes the intermediate
    depthwise output's HBM round trip entirely (at the serving flagship
    shape, dsconv1's dw output is ~1.07 GB/iteration at batch 128): the
    (Wo, C) depthwise row accumulator feeds the 1×1 pointwise matmul
    directly from VMEM (the dw→pw fusion of arxiv.org/2404.19331, done
    the TPU way). Matches the unfused folded graph: the dw activation is
    cast to the compute dtype before the pw contraction, exactly as the
    bf16 serving graph hands a bf16 tensor between the two convs.

    Reference mapping: _DSConv, reference:models/fast_scnn.py:64-79.
    """
    kh, kw, mult, c = w_dw.shape
    if (kh, kw, mult) != (3, 3, 1) or c != x.shape[-1]:
        raise ValueError(f"ds_conv3x3_pw_pallas needs (3,3,1,C) dw weights, got {w_dw.shape}")
    if w_pw.shape[:2] != (1, 1) or w_pw.shape[2] != c:
        raise ValueError(f"pw weights must be (1,1,{c},Cout), got {w_pw.shape}")
    if stride not in (1, 2):
        raise ValueError(f"stride must be 1 or 2, got {stride}")
    cout = w_pw.shape[3]
    if use_pallas is None:
        use_pallas = jax.default_backend() in ("tpu", "axon")
    if not (use_pallas or interpret):
        y = _xla_fallback(x, w_dw, b_dw, stride, padding, relu=True)
        return jax.nn.relu(
            jnp.tensordot(y, w_pw.reshape(c, cout).astype(y.dtype), axes=((3,), (0,)))
            + b_pw.astype(y.dtype)
        )

    from jax.experimental import pallas as pl

    n, h, wd, _ = x.shape
    ho, wo = _out_len(h, 3, stride, padding), _out_len(wd, 3, stride, padding)
    xp, wcols = _pad_input(x, padding, stride)
    lanes = 2 * c if stride == 2 else c
    w01, w2 = _pair_weights(w_dw)
    w9 = w_dw.astype(jnp.float32).reshape(9, c)
    bd = b_dw.astype(jnp.float32).reshape(1, c)
    wpw = w_pw.reshape(c, cout).astype(x.dtype)
    bp = b_pw.astype(jnp.float32).reshape(1, cout)

    def kernel(r0_ref, r1_ref, r2_ref, w01_ref, w2_ref, w9_ref, bd_ref, wpw_ref, bp_ref, out_ref):
        rows = (r0_ref, r1_ref, r2_ref)

        def row_of(di):
            return rows[di][0, 0].astype(jnp.float32)

        acc = _dw_rows_accum(row_of, w01_ref, w2_ref, w9_ref, stride, wo, c)
        acc = acc + bd_ref[0:1, :]
        mid = jnp.maximum(acc, 0.0).astype(out_ref.dtype)  # the dw activation
        z = jnp.dot(mid, wpw_ref[:], preferred_element_type=jnp.float32)
        z = jnp.maximum(z + bp_ref[0:1, :], 0.0)
        out_ref[0, 0] = z.astype(out_ref.dtype)

    grid = (n, ho)
    row_spec = lambda di: pl.BlockSpec(
        (1, 1, wcols, lanes), lambda i, j, di=di: (i, stride * j + di, 0, 0)
    )
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            row_spec(0),
            row_spec(1),
            row_spec(2),
            pl.BlockSpec((3, 2 * c), lambda i, j: (0, 0)),
            pl.BlockSpec((3, 2 * c), lambda i, j: (0, 0)),
            pl.BlockSpec((9, c), lambda i, j: (0, 0)),
            pl.BlockSpec((1, c), lambda i, j: (0, 0)),
            pl.BlockSpec((c, cout), lambda i, j: (0, 0)),
            pl.BlockSpec((1, cout), lambda i, j: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, wo, cout), lambda i, j: (i, j, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((n, ho, wo, cout), x.dtype),
        interpret=interpret,
    )(xp, xp, xp, w01, w2, w9, bd, wpw, bp)


def ds_conv3x3_pw_pallas_multirow(
    x: jnp.ndarray,
    w_dw: jnp.ndarray,
    b_dw: jnp.ndarray,
    w_pw: jnp.ndarray,
    b_pw: jnp.ndarray,
    stride: int = 1,
    padding: int = 1,
    rows_per_step: int = 8,
    use_pallas: bool | None = None,
    interpret: bool = False,
) -> jnp.ndarray:
    """Multi-row, double-buffered variant of :func:`ds_conv3x3_pw_pallas`.

    The single-row kernel re-fetches overlapping input rows (stride 2:
    1.5× input reads; stride 1: 3×) because BlockSpec blocks cannot
    overlap. Here the input stays in HBM and the kernel DMAs
    ``(rows_per_step−1)·stride + 3`` input rows per block into a
    two-slot VMEM buffer (prefetching block b+1 during block b — the
    guide's double-buffer pattern), cutting the re-read to
    ~(2B+1)/(2B); the (B, Wo, Cout) output block streams back to HBM
    through a second two-slot buffer. One grid step per image; the B
    output rows of a block are unrolled statically (Mosaic rejects
    strided row slices — see the module docstring).

    Falls back to the single-row kernel when ``rows_per_step`` does not
    divide the output height (every production shape here is a power of
    two × the B=8 default).
    """
    kh, kw, mult, c = w_dw.shape
    if (kh, kw, mult) != (3, 3, 1) or c != x.shape[-1]:
        raise ValueError(f"needs (3,3,1,C) dw weights, got {w_dw.shape}")
    if w_pw.ndim != 4 or w_pw.shape[:2] != (1, 1) or w_pw.shape[2] != c:
        raise ValueError(f"pw weights must be (1,1,{c},Cout), got {w_pw.shape}")
    if stride not in (1, 2):
        raise ValueError(f"stride must be 1 or 2, got {stride}")
    cout = w_pw.shape[3]
    if use_pallas is None:
        use_pallas = jax.default_backend() in ("tpu", "axon")
    n, h, wd, _ = x.shape
    ho, wo = _out_len(h, 3, stride, padding), _out_len(wd, 3, stride, padding)
    bb = int(rows_per_step)
    # Manual HBM `memref_slice` DMAs additionally require the LANE dim to
    # be a multiple of the 128-lane tiling (found on-chip 2026-08-18:
    # "Slice shape along dimension 3 must be aligned to tiling (128)")
    # and the second-minor extent a multiple of the 8-sublane tiling —
    # on BOTH ends: the input copy (lanes, wcols is padded to 8 below)
    # and the output copy (cout, wo). The LTD DSConvs have 2C ∈ {64, 96}
    # lanes pair-merged, so they take the single-row BlockSpec kernel
    # instead (BlockSpec pipelining has no such constraint); see
    # docs/KERNELS.md for the packed-lane design that would lift this.
    tiles_ok = (
        (2 * c if stride == 2 else c) % 128 == 0
        and cout % 128 == 0
        and wo % 8 == 0
    )
    if not (use_pallas or interpret) or bb <= 1 or ho % bb or not (tiles_ok or interpret):
        return ds_conv3x3_pw_pallas(
            x, w_dw, b_dw, w_pw, b_pw, stride=stride, padding=padding,
            use_pallas=use_pallas, interpret=interpret,
        )

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    xp, wcols = _pad_input(x, padding, stride)
    # Manual HBM→VMEM DMA slices must be tile-aligned in the second-minor
    # dim: Mosaic rejects `memref_slice` extents that are not multiples of
    # the 8-sublane tiling (found on-chip 2026-08-18 — the offline
    # jax.export lowering can NOT catch this; the check runs in the
    # backend AOT compile). Pad the column dim to 8; the accumulator
    # slices only the first `wo(+1)` columns, so the extra zeros are dead.
    col_pad = -wcols % 8
    if col_pad:
        xp = jnp.pad(xp, ((0, 0), (0, 0), (0, col_pad), (0, 0)))
        wcols += col_pad
    lanes = 2 * c if stride == 2 else c
    rows_in = (bb - 1) * stride + 3
    nblk = ho // bb
    w01, w2 = _pair_weights(w_dw)
    w9 = w_dw.astype(jnp.float32).reshape(9, c)
    bd = b_dw.astype(jnp.float32).reshape(1, c)
    wpw = w_pw.reshape(c, cout).astype(x.dtype)
    bp = b_pw.astype(jnp.float32).reshape(1, cout)

    def kernel(x_hbm, w01_ref, w2_ref, w9_ref, bd_ref, wpw_ref, bp_ref, out_hbm):
        i = pl.program_id(0)

        def body(x_buf, y_buf, in_sem, out_sem):
            def in_dma(slot, b):
                return pltpu.make_async_copy(
                    x_hbm.at[i, pl.ds(b * bb * stride, rows_in), :, :],
                    x_buf.at[slot],
                    in_sem.at[slot],
                )

            def out_dma(slot, b):
                return pltpu.make_async_copy(
                    y_buf.at[slot],
                    out_hbm.at[i, pl.ds(b * bb, bb), :, :],
                    out_sem.at[slot],
                )

            in_dma(0, 0).start()

            def loop(b, carry):
                slot = b % 2

                @pl.when(b + 1 < nblk)
                def _prefetch():
                    in_dma((b + 1) % 2, b + 1).start()

                in_dma(slot, b).wait()

                # the slot's previous output DMA must land before overwrite
                @pl.when(b >= 2)
                def _drain_prev():
                    out_dma(slot, b - 2).wait()

                # B output rows, statically unrolled; all row selections
                # are unit-stride slices of the (rows_in, Wcols, L) tile.
                for k in range(bb):
                    def row_of(di, k=k):
                        r0 = stride * k + di
                        return x_buf[slot, r0:r0 + 1].astype(jnp.float32)[0]

                    acc = _dw_rows_accum(row_of, w01_ref, w2_ref, w9_ref, stride, wo, c)
                    acc = acc + bd_ref[0:1, :]
                    mid = jnp.maximum(acc, 0.0).astype(y_buf.dtype)
                    z = jnp.dot(mid, wpw_ref[:], preferred_element_type=jnp.float32)
                    z = jnp.maximum(z + bp_ref[0:1, :], 0.0)
                    y_buf[slot, k:k + 1] = z.astype(y_buf.dtype)[None]

                out_dma(slot, b).start()
                return carry

            jax.lax.fori_loop(0, nblk, loop, None)

            # drain the last (up to) two in-flight output DMAs
            @pl.when(nblk >= 2)
            def _drain_tail():
                out_dma((nblk - 2) % 2, nblk - 2).wait()

            out_dma((nblk - 1) % 2, nblk - 1).wait()

        pl.run_scoped(
            body,
            x_buf=pltpu.VMEM((2, rows_in, wcols, lanes), x.dtype),
            y_buf=pltpu.VMEM((2, bb, wo, cout), x.dtype),
            in_sem=pltpu.SemaphoreType.DMA((2,)),
            out_sem=pltpu.SemaphoreType.DMA((2,)),
        )

    return pl.pallas_call(
        kernel,
        grid=(n,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec((3, 2 * c), lambda i: (0, 0)),
            pl.BlockSpec((3, 2 * c), lambda i: (0, 0)),
            pl.BlockSpec((9, c), lambda i: (0, 0)),
            pl.BlockSpec((1, c), lambda i: (0, 0)),
            pl.BlockSpec((c, cout), lambda i: (0, 0)),
            pl.BlockSpec((1, cout), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        out_shape=jax.ShapeDtypeStruct((n, ho, wo, cout), x.dtype),
        interpret=interpret,
    )(xp, w01, w2, w9, bd, wpw, bp)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5))
def dw_conv3x3_pallas_vjp(x, w, stride=1, padding=1, use_pallas=None, interpret=False):
    """Differentiable depthwise-3×3 (no bias/ReLU — the model applies BN
    right after, reference:models/fast_scnn.py:70): Pallas forward,
    XLA tap-formulated backward (ops/conv.py::_conv_dx / _conv_dw_taps)."""
    return dw_conv3x3_pallas(
        x, w, None, stride=stride, padding=padding, relu=False,
        use_pallas=use_pallas, interpret=interpret,
    )


def _vjp_fwd(x, w, stride, padding, use_pallas, interpret):
    y = dw_conv3x3_pallas_vjp(x, w, stride, padding, use_pallas, interpret)
    return y, (x, w)


def _vjp_bwd(stride, padding, use_pallas, interpret, res, g):
    from fastscnn_tpu.ops.conv import _conv_dw_taps, _conv_dx, f32_precision

    x, w = res
    prec = f32_precision(x.dtype)
    groups = x.shape[-1]
    dx = _conv_dx(g, w.astype(x.dtype), stride, padding, groups, x.shape, prec)
    dw = _conv_dw_taps(x, g, 3, 3, stride, padding, groups, prec).astype(w.dtype)
    return dx, dw


dw_conv3x3_pallas_vjp.defvjp(_vjp_fwd, _vjp_bwd)
