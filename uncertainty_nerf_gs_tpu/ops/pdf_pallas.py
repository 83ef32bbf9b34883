"""Fused Pallas TPU kernel for the PDF resampler (inverse-CDF sampling).

TPU-native replacement for the searchsorted at the core of nerfstudio's
``PDFSampler`` (consumed by the reference's proposal hierarchy,
`/root/reference/nerfuncertainty/models/laplace/laplace_model.py`): one
kernel fuses histogram padding -> normalization -> CDF (MXU triangular
matmul) -> bracket search -> piecewise-linear interpolation, so nothing
round-trips HBM between stages. Semantics match nerfstudio's PDFSampler
bit-for-bit-ish (per-bin padding, eps re-normalization, linear inversion);
the XLA fallback in `ops/sampling.py` is the differentiable reference.

Layout (v2): the first fused kernel kept bins on LANES and looped over
query columns — every query cost a lane-column extract of ``u``, a
lane-column write of the output, and 4 masked lane-reductions per 128-bin
chunk; measured 108 ms standalone at (32k rays, 256 bins -> 97 queries).
This version puts BINS ON SUBLANES and QUERIES ON LANES:

    z[r, s, j] = cdf[r, s] <= u[r, j]          one broadcast compare
    c0 = max_s cdf[r, s]     * z               4 sublane-axis reductions,
    e0 = max_s edge[r, s]    * z                 no column relayouts
    c1 = max_s cdf[r, s+1]   * z               (cdf sorted: the max over
    e1 = max_s edge[r, s+1]  * z                masked s of the SHIFTED
                                                array is exactly the
                                                bracket's right side)

All four brackets are max-reductions with ONE shared mask; sublane padding
wastes <=7 rows instead of the lane-chunked version's up-to-33% padded
compare chunk. Queries pad to 128 lanes.

Gradients: the nerfacto training path never differentiates through the
sampler (weights are stop-gradient'ed, `models/nerfacto.py`), and this
wrapper stops gradients explicitly.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_CHUNK_S = 128  # lane extent per partial sum (Mosaic reduce cliff past ~192)
_BIG = 2.0  # sentinel > any cdf/edge value (both live in [0, 1])


def _block_rays(sp: int, n_lanes: int) -> int:
    """Rays per grid step: largest multiple of 8 keeping the (BR, SP,
    n_lanes) f32 mask tensor near ~2 MB (a handful of same-shape
    intermediates stay live, so this bounds VMEM at <=~10 MB) — measured
    r3: 8 rays/step left stage-2 (96 bins) dominated by per-step overhead
    (45 ms for 4096 steps vs 6 ms for the 128-step lane-major kernel)."""
    budget = 3 << 20  # measured sweet spot: 256-bin stage -> 16 rays/step
    br = budget // (sp * n_lanes * 4)
    return int(max(8, min(64, (br // 8) * 8)))


def _interpret() -> bool:
    from uncertainty_nerf_gs_tpu.ops.backend import on_tpu

    return not on_tpu()


def _resample_kernel(w_ref, edges_ref, u_ref, out_ref, *, hist_pad, eps):
    w = w_ref[:, :] + hist_pad  # (BR, S)
    br, s = w.shape
    # lane-chunked sum (Mosaic reduce cliff past ~192 lanes)
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

    edges = edges_ref[:, :]  # (BR, S+1), sorted
    # cdf/edges plus their left-shifts, padded on sublanes to a multiple
    # of 8 with BIG (mask false there) / 1.0 (shift rows past the last
    # real bracket are never selected: u < 1 = cdf[-1]).
    sp = ((s + 1 + 7) // 8) * 8
    pad = sp - (s + 1)

    def to_sub(x, fill):
        x = x.reshape(br, s + 1, 1)
        if pad:
            x = jnp.concatenate(
                [x, jnp.full((br, pad, 1), fill, jnp.float32)], axis=1
            )
        return x  # (BR, SP, 1)

    zero = jnp.zeros((br, 1), jnp.float32)
    one = jnp.ones((br, 1), jnp.float32)
    cdf = to_sub(jnp.concatenate([zero, cdf_in], axis=1), _BIG)
    edg = to_sub(edges, _BIG)
    cdf_sh = to_sub(jnp.concatenate([cdf_in, one], axis=1), 1.0)
    edg_sh = to_sub(jnp.concatenate([edges[:, 1:], one], axis=1), 1.0)

    u = u_ref[:, :]  # (BR, N)
    z = (cdf <= u[:, None, :]).astype(jnp.float32)  # (BR, SP, N)

    c0 = jnp.max(cdf * z, axis=1)  # (BR, N): last cdf <= u (sorted)
    e0 = jnp.max(edg * z, axis=1)
    c1 = jnp.max(cdf_sh * z, axis=1)  # cdf[idx+1] — right bracket
    e1 = jnp.max(edg_sh * z, axis=1)

    frac = jnp.where(c1 > c0, (u - c0) / jnp.maximum(c1 - c0, 1e-12), 0.0)
    out_ref[:, :] = e0 + frac * (e1 - e0)


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
    np_ = ((n + _CHUNK_S - 1) // _CHUNK_S) * _CHUNK_S
    if np_ > n:
        u = jnp.pad(u, ((0, 0), (0, np_ - n)), constant_values=0.5)
    sp = ((s + 1 + 7) // 8) * 8  # kernel's sublane extent (see _resample_kernel)
    block_r = _block_rays(sp, np_)
    pad_r = (-r) % block_r
    if pad_r:
        weights = jnp.pad(weights, ((0, pad_r), (0, 0)), constant_values=1.0)
        s_edges = jnp.pad(s_edges, ((0, pad_r), (0, 0)), constant_values=1.0)
        u = jnp.pad(u, ((0, pad_r), (0, 0)), constant_values=0.5)
    rp = r + pad_r

    kernel = functools.partial(
        _resample_kernel, hist_pad=float(histogram_padding), eps=float(eps)
    )
    out = pl.pallas_call(
        kernel,
        grid=(rp // block_r,),
        # ~5 same-shape (BR, SP, N) intermediates stay live (mask + 4 masked
        # bracket products); at block budgets near 2-3 MB Mosaic's stack can
        # land a hair over the default 16 MB scoped-VMEM limit (observed:
        # 16.02-16.17 MB at (32, 256, 128)). v5e VMEM is 128 MB; raise the
        # scoped limit instead of shrinking blocks below the measured
        # overhead knee (8 rays/step was per-step-overhead dominated).
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 << 20),
        in_specs=[
            pl.BlockSpec((block_r, s), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (block_r, s + 1), lambda i: (i, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec((block_r, np_), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (block_r, np_), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((rp, np_), jnp.float32),
        interpret=_interpret(),
    )(weights, s_edges, u)
    return out[:r, :n]
