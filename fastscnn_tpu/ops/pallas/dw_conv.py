"""Depthwise 3×3 conv Pallas kernel for the small-C stem.

Why: the LTD stem's stride-2 depthwise convs are the serving graph's #1
op (11.1 ms/iter at 169 GB/s, batch 128 — docs/PERFORMANCE.md round-2
profile) and a large share of the 19-class training step's stem cost.
XLA's depthwise path for these C ∈ {32, 48} shapes runs well below HBM
bandwidth; the op itself is trivially bandwidth-bound (9 FMAs per output
element).

Formulation: one grid step per (image, output row). The three input rows
an output row needs arrive as three BlockSpec views of the same padded
tensor (block size 1 in H makes the index maps element-granular, so no
halo machinery is needed); each of the 9 taps is a strided sublane slice
times a per-channel scalar, accumulated in f32 on the VPU. Lanes carry C
(padded to 128 in VMEM — a capacity/ALU cost, not an HBM one: the DMA
moves only real bytes). Bias-add and ReLU fuse into the same kernel for
the folded serving graph (conv+bias+ReLU is one HBM round trip).

Semantics match ``ops.conv.conv2d(..., groups=C)`` exactly up to f32
accumulation order (the conv op also accumulates f32 internally); parity
is pinned by tests in interpret mode and against the XLA fallback.

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
    return (size + 2 * padding - k) // stride + 1


def _xla_fallback(x, w, b, stride, padding, relu):
    from fastscnn_tpu.ops.conv import conv2d

    y = conv2d(x, w, b, stride=stride, padding=padding, groups=x.shape[-1])
    return jax.nn.relu(y) if relu else y


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
    xp = jnp.pad(x, ((0, 0), (padding, padding), (padding, padding), (0, 0)))
    wp = wd + 2 * padding
    w9 = w.astype(jnp.float32).reshape(9, c)
    bias = jnp.zeros((1, c), jnp.float32) if b is None else b.astype(jnp.float32).reshape(1, c)

    def kernel(r0_ref, r1_ref, r2_ref, w_ref, b_ref, out_ref):
        rows = (r0_ref, r1_ref, r2_ref)
        acc = jnp.broadcast_to(b_ref[0, :], (wo, c)).astype(jnp.float32)
        for di in range(3):
            row = rows[di][0, 0].astype(jnp.float32)  # (Wp, C)
            for dj in range(3):
                seg = jax.lax.slice(
                    row, (dj, 0), (dj + (wo - 1) * stride + 1, c), (stride, 1)
                )  # (Wo, C)
                acc = acc + seg * w_ref[di * 3 + dj, :]
        if relu:
            acc = jnp.maximum(acc, 0.0)
        out_ref[0, 0] = acc.astype(out_ref.dtype)

    grid = (n, ho)
    row_spec = lambda di: pl.BlockSpec(
        (1, 1, wp, c), lambda i, j, di=di: (i, stride * j + di, 0, 0)
    )
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            row_spec(0),
            row_spec(1),
            row_spec(2),
            pl.BlockSpec((9, c), lambda i, j: (0, 0)),
            pl.BlockSpec((1, c), lambda i, j: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, wo, c), lambda i, j: (i, j, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((n, ho, wo, c), x.dtype),
        interpret=interpret,
    )(xp, xp, xp, w9, bias)


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
    xp = jnp.pad(x, ((0, 0), (padding, padding), (padding, padding), (0, 0)))
    wp = wd + 2 * padding
    w9 = w_dw.astype(jnp.float32).reshape(9, c)
    bd = b_dw.astype(jnp.float32).reshape(1, c)
    wpw = w_pw.reshape(c, cout).astype(x.dtype)
    bp = b_pw.astype(jnp.float32).reshape(1, cout)

    def kernel(r0_ref, r1_ref, r2_ref, w_ref, bd_ref, wpw_ref, bp_ref, out_ref):
        rows = (r0_ref, r1_ref, r2_ref)
        acc = jnp.broadcast_to(bd_ref[0, :], (wo, c)).astype(jnp.float32)
        for di in range(3):
            row = rows[di][0, 0].astype(jnp.float32)  # (Wp, C)
            for dj in range(3):
                seg = jax.lax.slice(
                    row, (dj, 0), (dj + (wo - 1) * stride + 1, c), (stride, 1)
                )
                acc = acc + seg * w_ref[di * 3 + dj, :]
        mid = jnp.maximum(acc, 0.0).astype(out_ref.dtype)  # the dw activation
        z = jnp.dot(mid, wpw_ref[:], preferred_element_type=jnp.float32)
        z = jnp.maximum(z + bp_ref[0, :], 0.0)
        out_ref[0, 0] = z.astype(out_ref.dtype)

    grid = (n, ho)
    row_spec = lambda di: pl.BlockSpec(
        (1, 1, wp, c), lambda i, j, di=di: (i, stride * j + di, 0, 0)
    )
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            row_spec(0),
            row_spec(1),
            row_spec(2),
            pl.BlockSpec((9, c), lambda i, j: (0, 0)),
            pl.BlockSpec((1, c), lambda i, j: (0, 0)),
            pl.BlockSpec((c, cout), lambda i, j: (0, 0)),
            pl.BlockSpec((1, cout), lambda i, j: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, wo, cout), lambda i, j: (i, j, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((n, ho, wo, cout), x.dtype),
        interpret=interpret,
    )(xp, xp, xp, w9, bd, wpw, bp)


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
    through a second two-slot buffer. One grid step per image.

    Falls back to the single-row kernel when ``rows_per_step`` does not
    divide the output height (every production shape here is a power of
    two × the B=8 default).
    """
    kh, kw, mult, c = w_dw.shape
    if (kh, kw, mult) != (3, 3, 1) or c != x.shape[-1]:
        raise ValueError(f"needs (3,3,1,C) dw weights, got {w_dw.shape}")
    if stride not in (1, 2):
        raise ValueError(f"stride must be 1 or 2, got {stride}")
    cout = w_pw.shape[3]
    if use_pallas is None:
        use_pallas = jax.default_backend() in ("tpu", "axon")
    n, h, wd, _ = x.shape
    ho, wo = _out_len(h, 3, stride, padding), _out_len(wd, 3, stride, padding)
    bb = int(rows_per_step)
    if not (use_pallas or interpret) or bb <= 1 or ho % bb:
        return ds_conv3x3_pw_pallas(
            x, w_dw, b_dw, w_pw, b_pw, stride=stride, padding=padding,
            use_pallas=use_pallas, interpret=interpret,
        )

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    xp = jnp.pad(x, ((0, 0), (padding, padding), (padding, padding), (0, 0)))
    wp = wd + 2 * padding
    rows_in = (bb - 1) * stride + 3
    nblk = ho // bb
    w9 = w_dw.astype(jnp.float32).reshape(9, c)
    bd = b_dw.astype(jnp.float32).reshape(1, c)
    wpw = w_pw.reshape(c, cout).astype(x.dtype)
    bp = b_pw.astype(jnp.float32).reshape(1, cout)

    def kernel(x_hbm, w_ref, bd_ref, wpw_ref, bp_ref, out_hbm):
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
                tile = x_buf[slot]  # (rows_in, Wp, C), input dtype
                acc = jnp.broadcast_to(bd_ref[0, :], (bb, wo, c)).astype(jnp.float32)
                for di in range(3):
                    for dj in range(3):
                        # slice in the input dtype, convert per-tap: an
                        # up-front f32 copy of the whole tile would double
                        # the buffer's VMEM footprint
                        seg = jax.lax.slice(
                            tile,
                            (di, dj, 0),
                            (di + (bb - 1) * stride + 1, dj + (wo - 1) * stride + 1, c),
                            (stride, stride, 1),
                        ).astype(jnp.float32)  # (bb, Wo, C)
                        acc = acc + seg * w_ref[di * 3 + dj, :]
                mid = jnp.maximum(acc, 0.0).astype(y_buf.dtype).reshape(bb * wo, c)
                z = jnp.dot(mid, wpw_ref[:], preferred_element_type=jnp.float32)
                z = jnp.maximum(z + bp_ref[0, :], 0.0)

                # the slot's previous output DMA must land before overwrite
                @pl.when(b >= 2)
                def _drain_prev():
                    out_dma(slot, b - 2).wait()

                y_buf[slot] = z.astype(y_buf.dtype).reshape(bb, wo, cout)
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
            x_buf=pltpu.VMEM((2, rows_in, wp, c), x.dtype),
            y_buf=pltpu.VMEM((2, bb, wo, cout), x.dtype),
            in_sem=pltpu.SemaphoreType.DMA((2,)),
            out_sem=pltpu.SemaphoreType.DMA((2,)),
        )

    return pl.pallas_call(
        kernel,
        grid=(n,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec((9, c), lambda i: (0, 0)),
            pl.BlockSpec((1, c), lambda i: (0, 0)),
            pl.BlockSpec((c, cout), lambda i: (0, 0)),
            pl.BlockSpec((1, cout), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        out_shape=jax.ShapeDtypeStruct((n, ho, wo, cout), x.dtype),
        interpret=interpret,
    )(xp, w9, bd, wpw, bp)


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
