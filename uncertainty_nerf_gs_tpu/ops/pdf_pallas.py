"""Pallas TPU kernel for inverse-CDF sampling (the PDF resampler's core).

XLA lowers the (R, S, N) compare-reduce CDF inversion poorly on TPU
(~49 ms per fused ensemble render at 8192 rays — a quarter of the whole
forward — for ~1 ms of actual VPU math). This kernel keeps the natural
(rays, bins) layout — bins on lanes — and finds, per query column, the
bracketing (cdf, edge) pairs with masked LANE reductions:

    for j in queries:                      # static unroll, N <= ~128
        le  = cdf <= u[:, j]               # (BR, S') prefix mask per ray
        c0  = max(where(le, cdf, 0))       # last cdf <= u (lane reduce)
        e0  = max(where(le, edges, 0))     # its edge (edges sorted)
        c1  = min(where(le, 2, cdf))       # first cdf > u
        e1  = min(where(le, 2, edges))

Mosaic's masked lane reductions degrade ~30x once the lane extent exceeds
~192 (measured: 192 lanes 4.3 ms, 257 lanes 164 ms at these shapes), so
the wrapper splits the bin axis into <=128-bin kernel calls and merges the
per-chunk brackets in XLA (brackets over sorted chunks merge exactly by
max/min), then interpolates.

Gradients: the nerfacto training path never differentiates through the
sampler (weights are stop-gradient'ed, `models/nerfacto.py`), so the
wrapper stops gradients explicitly; the XLA fallback in `ops/sampling.py`
remains for CPU and for anyone needing a differentiable path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BLOCK_R = 256  # rays (sublanes) per grid step
_CHUNK_S = 128  # bins per kernel call (lane extent; > ~192 is a cliff)
_BIG = 2.0  # sentinel > any cdf/edge value (both live in [0, 1])


def _bracket_kernel(cdf_ref, edges_ref, u_ref, c0_ref, e0_ref, c1_ref, e1_ref):
    cdf = cdf_ref[:, :]  # (BR, S'), sorted along lanes
    edges = edges_ref[:, :]
    n = u_ref.shape[1]
    big = jnp.float32(_BIG)
    for j in range(n):  # static unroll over query columns
        uj = u_ref[:, j][:, None]  # (BR, 1)
        le = cdf <= uj
        c0_ref[:, j] = jnp.max(jnp.where(le, cdf, 0.0), axis=1)
        e0_ref[:, j] = jnp.max(jnp.where(le, edges, 0.0), axis=1)
        c1_ref[:, j] = jnp.min(jnp.where(le, big, cdf), axis=1)
        e1_ref[:, j] = jnp.min(jnp.where(le, big, edges), axis=1)


def _brackets(cdf: jax.Array, s_edges: jax.Array, u: jax.Array):
    """One kernel call over <=_CHUNK_S bins: four (R, N) bracket arrays."""
    rp, s1 = cdf.shape
    n = u.shape[1]
    spec_in = pl.BlockSpec((_BLOCK_R, s1), lambda i: (i, 0), memory_space=pltpu.VMEM)
    spec_u = pl.BlockSpec((_BLOCK_R, n), lambda i: (i, 0), memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((_BLOCK_R, n), lambda i: (i, 0), memory_space=pltpu.VMEM)
    shape = jax.ShapeDtypeStruct((rp, n), jnp.float32)
    return pl.pallas_call(
        _bracket_kernel,
        grid=(rp // _BLOCK_R,),
        in_specs=[spec_in, spec_in, spec_u],
        out_specs=(out_spec,) * 4,
        out_shape=(shape,) * 4,
    )(cdf, s_edges, u)


@functools.partial(jax.jit, static_argnames=())
def invert_cdf_tpu(cdf: jax.Array, s_edges: jax.Array, u: jax.Array) -> jax.Array:
    """Piecewise-linear inverse CDF on TPU.

    cdf/s_edges: (R, S+1) sorted along the last axis; u: (R, N) queries in
    [0, 1). Returns (R, N) interpolated edges. Not differentiable (inputs
    are stop-gradient'ed — see module docstring).
    """
    cdf = jax.lax.stop_gradient(cdf).astype(jnp.float32)
    s_edges = jax.lax.stop_gradient(s_edges).astype(jnp.float32)
    u = jax.lax.stop_gradient(u).astype(jnp.float32)

    r, s1 = cdf.shape
    n = u.shape[1]
    pad_r = (-r) % _BLOCK_R
    if pad_r:
        cdf = jnp.pad(cdf, ((0, pad_r), (0, 0)), constant_values=1.0)
        s_edges = jnp.pad(s_edges, ((0, pad_r), (0, 0)), constant_values=1.0)
        u = jnp.pad(u, ((0, pad_r), (0, 0)), constant_values=0.5)

    c0 = e0 = None
    c1 = e1 = None
    for lo in range(0, s1, _CHUNK_S):
        hi = min(lo + _CHUNK_S, s1)
        c0_c, e0_c, c1_c, e1_c = _brackets(
            cdf[:, lo:hi], s_edges[:, lo:hi], u
        )
        if c0 is None:
            c0, e0, c1, e1 = c0_c, e0_c, c1_c, e1_c
        else:
            # chunks are sorted slices: brackets merge exactly by max/min
            c0 = jnp.maximum(c0, c0_c)
            e0 = jnp.maximum(e0, e0_c)
            c1 = jnp.minimum(c1, c1_c)
            e1 = jnp.minimum(e1, e1_c)

    # u < 1 = cdf[-1], so c1 is always a real bin; guard degenerate rows.
    c1 = jnp.where(c1 >= _BIG, 1.0, c1)
    e1 = jnp.where(e1 >= _BIG, 1.0, e1)
    frac = jnp.where(c1 > c0, (u - c0) / jnp.maximum(c1 - c0, 1e-12), 0.0)
    return (e0 + frac * (e1 - e0))[:r]


# ---------------------------------------------------------------------------
# Fully fused PDF resampler: histogram padding -> normalize -> CDF (MXU
# triangular matmul) -> bracket -> interpolate, ONE pallas_call.
#
# The staged path above (XLA prefix-matmul cumsum + three bracket kernel
# calls + XLA merges) materializes (R, S+1) cdf/edges and four (R, N)
# bracket arrays in HBM between every stage; in-context that made the PDF
# chain ~185 ms of a 543 ms fused ensemble render (r3 ablation) vs ~70 ms
# standalone. Fusing the whole resampler keeps everything VMEM-resident.
# Reference semantics unchanged (nerfstudio PDFSampler: per-bin padding,
# eps re-normalization, piecewise-linear inversion).
# ---------------------------------------------------------------------------


def _interpret() -> bool:
    from uncertainty_nerf_gs_tpu.ops.backend import on_tpu

    return not on_tpu()


def _resample_kernel(w_ref, edges_ref, u_ref, out_ref, *, hist_pad, eps):
    w = w_ref[:, :] + hist_pad  # (BR, S)
    s = w.shape[1]
    # lane-chunked sum (Mosaic reduces cliff past ~192 lanes)
    wsum = None
    for lo in range(0, s, _CHUNK_S):
        part = jnp.sum(w[:, lo:min(lo + _CHUNK_S, s)], axis=1, keepdims=True)
        wsum = part if wsum is None else wsum + part
    padding = jnp.maximum(eps - wsum, 0.0)
    w = w + padding / s
    pdf = w / (wsum + padding)

    # inclusive prefix sum on the MXU: pdf @ upper-triangular ones
    ii = jax.lax.broadcasted_iota(jnp.int32, (s, s), 0)
    jj = jax.lax.broadcasted_iota(jnp.int32, (s, s), 1)
    ut = (ii <= jj).astype(jnp.float32)
    cdf_in = jax.lax.dot_general(
        pdf, ut, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    cdf_in = jnp.clip(cdf_in, 0.0, 1.0)

    # leading zero column + BIG sentinel pad to the edges' lane extent
    br = w.shape[0]
    sp = edges_ref.shape[1]
    cdf = jnp.concatenate(
        [
            jnp.zeros((br, 1), jnp.float32),
            cdf_in,
            jnp.full((br, sp - s - 1), _BIG, jnp.float32),
        ],
        axis=1,
    )
    edges = edges_ref[:, :]

    n = u_ref.shape[1]
    big = jnp.float32(_BIG)
    for j in range(n):  # static unroll over query columns
        uj = u_ref[:, j][:, None]  # (BR, 1)
        c0 = e0 = None
        c1 = e1 = None
        for lo in range(0, sp, _CHUNK_S):  # <=128-lane masked reduces
            cc = cdf[:, lo:lo + _CHUNK_S]
            ec = edges[:, lo:lo + _CHUNK_S]
            le = cc <= uj
            c0_c = jnp.max(jnp.where(le, cc, 0.0), axis=1)
            e0_c = jnp.max(jnp.where(le, ec, 0.0), axis=1)
            c1_c = jnp.min(jnp.where(le, big, cc), axis=1)
            e1_c = jnp.min(jnp.where(le, big, ec), axis=1)
            if c0 is None:
                c0, e0, c1, e1 = c0_c, e0_c, c1_c, e1_c
            else:  # sorted chunks: brackets merge exactly by max/min
                c0 = jnp.maximum(c0, c0_c)
                e0 = jnp.maximum(e0, e0_c)
                c1 = jnp.minimum(c1, c1_c)
                e1 = jnp.minimum(e1, e1_c)
        c1 = jnp.where(c1 >= big, 1.0, c1)
        e1 = jnp.where(e1 >= big, 1.0, e1)
        frac = jnp.where(
            c1 > c0, (uj[:, 0] - c0) / jnp.maximum(c1 - c0, 1e-12), 0.0
        )
        out_ref[:, j] = e0 + frac * (e1 - e0)


def resample_edges_tpu(
    weights: jax.Array,
    s_edges: jax.Array,
    u: jax.Array,
    histogram_padding: float = 0.01,
    eps: float = 1e-5,
) -> jax.Array:
    """Fused nerfstudio-semantics PDF resampling: (R, S) weights +
    (R, S+1) sorted normalized edges + (R, N) queries -> (R, N) new edges.
    Not differentiable (the nerfacto path stop-gradients sampler inputs)."""
    weights = jax.lax.stop_gradient(weights).astype(jnp.float32)
    s_edges = jax.lax.stop_gradient(s_edges).astype(jnp.float32)
    u = jax.lax.stop_gradient(u).astype(jnp.float32)

    r, s = weights.shape
    n = u.shape[1]
    sp = ((s + 1 + _CHUNK_S - 1) // _CHUNK_S) * _CHUNK_S
    s_edges = jnp.pad(
        s_edges, ((0, 0), (0, sp - s - 1)), constant_values=_BIG
    )
    pad_r = (-r) % _BLOCK_R
    if pad_r:
        weights = jnp.pad(weights, ((0, pad_r), (0, 0)), constant_values=1.0)
        s_edges = jnp.pad(s_edges, ((0, pad_r), (0, 0)), constant_values=_BIG)
        u = jnp.pad(u, ((0, pad_r), (0, 0)), constant_values=0.5)
    rp = r + pad_r

    kernel = functools.partial(
        _resample_kernel, hist_pad=float(histogram_padding), eps=float(eps)
    )
    out = pl.pallas_call(
        kernel,
        grid=(rp // _BLOCK_R,),
        in_specs=[
            pl.BlockSpec((_BLOCK_R, s), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((_BLOCK_R, sp), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((_BLOCK_R, n), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (_BLOCK_R, n), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((rp, n), jnp.float32),
        interpret=_interpret(),
    )(weights, s_edges, u)
    return out[:r]
