"""Pallas TPU kernel for the tile-compositing stage of the 3DGS rasterizer.

The gather/binning phase of `ops/rasterize.py` already produces, per tile,
a *contiguous* packed array of the first-K depth-sorted intersecting
Gaussians — exactly the layout a TPU kernel wants (sequential DMA, no
random access). This module fuses the per-tile compositing —

    alpha matrix (K, P) -> exclusive cumprod transmittance -> weights
    -> weights^T @ payload on the MXU -> (P, C) tile image + alpha

— into one `pallas_call` over the tile grid, with an analytic custom VJP
(the standard 3DGS backward: suffix-sum S_k = sum_{j>k} w_j g_j gives
dL/d alpha_k = T_k g_k - S_k / (1 - alpha_k)), replacing autodiff through
the cumprod. This is the TPU-native equivalent of gsplat's CUDA
``rasterize_gaussians`` forward/backward pair
(`/root/reference/nerfuncertainty/models/activesplatfacto/
activesplatfacto_model.py:260-356`), still with the arbitrary multi-channel
payload that collapses the reference's 4 launches into 1.

Packed row layout (D = 6 + C): [mu_x, mu_y, conic_a, conic_b, conic_c,
opacity, payload_0..C-1]. Dead slots have opacity 0. Runs interpreted on
CPU (tests) and compiled on TPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from uncertainty_nerf_gs_tpu.ops.rasterize import ALPHA_CLAMP, ALPHA_MIN, TILE

P = TILE * TILE  # pixels per tile


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _alphas(packed, px, py):
    """(K, P) alpha matrix from a packed tile block. packed: (K, D),
    px/py: (1, P) pixel-center coordinates."""
    mu_x = packed[:, 0:1]  # (K, 1)
    mu_y = packed[:, 1:2]
    ca = packed[:, 2:3]
    cb = packed[:, 3:4]
    cc = packed[:, 4:5]
    op = packed[:, 5:6]
    dx = px - mu_x  # (K, P)
    dy = py - mu_y
    sigma = 0.5 * (ca * dx * dx + cc * dy * dy) + cb * dx * dy
    alpha = jnp.minimum(ALPHA_CLAMP, op * jnp.exp(-sigma))
    return jnp.where((sigma >= 0.0) & (alpha >= ALPHA_MIN), alpha, 0.0)


def _cumsum0(x):
    """Inclusive prefix sum along axis 0 via a Hillis-Steele doubling scan.

    Mosaic lowers neither cumsum nor cumprod; log2(K) rounds of
    ``pltpu.roll`` + masked add do the job on the VPU (K is a power of two
    in practice; the loop is correct for any K)."""
    k = x.shape[0]
    idx = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0)
    s = 1
    while s < k:
        x = x + jnp.where(idx >= s, pltpu.roll(x, s, 0), 0.0)
        s *= 2
    return x


def _cumprod0(x):
    """Inclusive prefix product along axis 0 (multiplicative Hillis-Steele
    scan; matches cumprod to fp32 rounding, unlike an exp/log-sum detour)."""
    k = x.shape[0]
    idx = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0)
    s = 1
    while s < k:
        x = x * jnp.where(idx >= s, pltpu.roll(x, s, 0), 1.0)
        s *= 2
    return x


def _weights(alpha):
    """Front-to-back blend weights w_k = alpha_k * prod_{j<k}(1-alpha_j)."""
    one_minus = jnp.maximum(1.0 - alpha, 1.0 - ALPHA_CLAMP)
    incl = _cumprod0(one_minus)
    trans_excl = incl / one_minus  # exclusive prefix product (factors > 0)
    return alpha * trans_excl, trans_excl


# tiles composited per grid step: amortizes Mosaic grid-step overhead
# (1200 single-tile steps measured ~26 us/step flat)
_TILES_PER_STEP = 8


# The G tiles of a grid step are walked with lax.fori_loop, NOT a static
# Python unroll: unrolled tile bodies keep every tile's (K, P)-sized
# intermediates (~10 of them) live simultaneously in Mosaic's scoped-vmem
# stack — 8 x 512 x 256 x 4B x ~10 ~ 40 MB, past the 16 MB limit at the
# bench shape (the r3 TPU OOM in the backward). The loop body reuses one
# tile's buffers; the grid-step amortization (~26 us/step flat) is kept.
# Even one tile's backward body peaks ~16.6 MB (the Hillis-Steele scans
# hold log2(K) live (K, P) rounds), so the scoped-vmem limit is raised
# from Mosaic's 16 MB default — v5e VMEM is 128 MB and the block buffers
# are <1 MB, so 64 MB of kernel stack is safely available.
_VMEM_LIMIT = 64 * 1024 * 1024


def _compiler_params():
    return pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT)


def _fwd_kernel(packed_ref, px_ref, py_ref, img_ref, alpha_ref):
    def body(g, carry):
        packed = packed_ref[pl.ds(g, 1)][0]  # (K, D)
        px = px_ref[pl.ds(g, 1)][0]  # (1, P)
        py = py_ref[pl.ds(g, 1)][0]
        alpha = _alphas(packed, px, py)
        w, _ = _weights(alpha)
        pv = packed[:, 6:]  # (K, C)
        img_ref[pl.ds(g, 1)] = jax.lax.dot_general(
            w, pv, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )[None]  # (1, P, C)
        # alpha laid out (T, 1, P): TPU blocks need legal trailing dims
        alpha_ref[pl.ds(g, 1)] = jnp.sum(w, axis=0)[None, None]
        return carry

    jax.lax.fori_loop(0, packed_ref.shape[0], body, 0)


def _bwd_kernel(packed_ref, px_ref, py_ref, g_img_ref, g_alpha_ref, g_packed_ref):
    def body(g, carry):
        _bwd_tile(packed_ref, px_ref, py_ref, g_img_ref, g_alpha_ref,
                  g_packed_ref, g)
        return carry

    jax.lax.fori_loop(0, packed_ref.shape[0], body, 0)


def _bwd_tile(packed_ref, px_ref, py_ref, g_img_ref, g_alpha_ref,
              g_packed_ref, g):
    packed = packed_ref[pl.ds(g, 1)][0]
    px = px_ref[pl.ds(g, 1)][0]  # (1, P)
    py = py_ref[pl.ds(g, 1)][0]
    g_img = g_img_ref[pl.ds(g, 1)][0]  # (P, C)
    g_alpha_out = g_alpha_ref[pl.ds(g, 1)][0, 0:1]  # (1, P)
    pv = packed[:, 6:]

    alpha = _alphas(packed, px, py)
    w, trans_excl = _weights(alpha)

    # dL/dw_kp = pv_k . g_img_p + g_alpha_p
    g_w = (
        jax.lax.dot_general(
            pv, g_img, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        + g_alpha_out
    )  # (K, P)
    # dL/d pv = w @ g_img
    g_pv = jax.lax.dot_general(
        w, g_img, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )  # (K, C)

    # dL/d alpha_k = T_k g_w_k - S_k / (1 - alpha_k),  S_k = sum_{j>k} w_j g_w_j
    wg = w * g_w
    # exclusive suffix sum as total - inclusive prefix (no reverse-gather,
    # which Mosaic can't lower)
    suffix = jnp.sum(wg, axis=0, keepdims=True) - _cumsum0(wg)
    one_minus = jnp.maximum(1.0 - alpha, 1.0 - ALPHA_CLAMP)
    g_a = trans_excl * g_w - suffix / one_minus
    # clamp & mask gates: alpha = min(0.999, op*exp(-sigma)) where live
    mu_x = packed[:, 0:1]
    mu_y = packed[:, 1:2]
    ca = packed[:, 2:3]
    cb = packed[:, 3:4]
    cc = packed[:, 4:5]
    op = packed[:, 5:6]
    dx = px - mu_x
    dy = py - mu_y
    sigma = 0.5 * (ca * dx * dx + cc * dy * dy) + cb * dx * dy
    raw = op * jnp.exp(-sigma)
    live = (sigma >= 0.0) & (raw >= ALPHA_MIN) & (raw < ALPHA_CLAMP)
    g_a = jnp.where(live, g_a, 0.0)

    # alpha = op * exp(-sigma)
    g_op = jnp.sum(g_a * jnp.exp(-sigma), axis=1)  # (K,)
    g_sigma = -g_a * raw  # (K, P)
    g_ca = 0.5 * jnp.sum(g_sigma * dx * dx, axis=1)
    g_cc = 0.5 * jnp.sum(g_sigma * dy * dy, axis=1)
    g_cb = jnp.sum(g_sigma * dx * dy, axis=1)
    # sigma wrt mu: d sigma/d mu_x = -(ca dx + cb dy); d/d mu_y = -(cc dy + cb dx)
    g_mux = jnp.sum(g_sigma * -(ca * dx + cb * dy), axis=1)
    g_muy = jnp.sum(g_sigma * -(cc * dy + cb * dx), axis=1)

    g_packed_ref[pl.ds(g, 1)] = jnp.concatenate(
        [
            g_mux[:, None], g_muy[:, None], g_ca[:, None], g_cb[:, None],
            g_cc[:, None], g_op[:, None], g_pv,
        ],
        axis=1,
    )[None]


def _pad_tiles(arrs, t):
    pad = (-t) % _TILES_PER_STEP
    if pad == 0:
        return arrs, t
    return [
        jnp.pad(a, ((0, pad),) + ((0, 0),) * (a.ndim - 1)) for a in arrs
    ], t + pad


def _fwd_call(packed: jax.Array, px: jax.Array, py: jax.Array):
    t0, k, d = packed.shape
    c = d - 6
    (packed, px, py), t = _pad_tiles([packed, px, py], t0)
    G = _TILES_PER_STEP
    img, alpha = pl.pallas_call(
        _fwd_kernel,
        grid=(t // G,),
        in_specs=[
            pl.BlockSpec((G, k, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((G, 1, P), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((G, 1, P), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((G, P, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((G, 1, P), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((t, P, c), jnp.float32),
            jax.ShapeDtypeStruct((t, 1, P), jnp.float32),
        ],
        interpret=_interpret(),
        compiler_params=None if _interpret() else _compiler_params(),
    )(packed, px, py)
    return img[:t0], alpha[:t0]


def _bwd_call(packed, px, py, g_img, g_alpha):
    t0, k, d = packed.shape
    (packed, px, py, g_img, g_alpha), t = _pad_tiles(
        [packed, px, py, g_img, g_alpha], t0
    )
    G = _TILES_PER_STEP
    return pl.pallas_call(
        _bwd_kernel,
        grid=(t // G,),
        in_specs=[
            pl.BlockSpec((G, k, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((G, 1, P), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((G, 1, P), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((G, P, d - 6), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((G, 1, P), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((G, k, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[jax.ShapeDtypeStruct((t, k, d), jnp.float32)],
        interpret=_interpret(),
        compiler_params=None if _interpret() else _compiler_params(),
    )(packed, px, py, g_img, g_alpha)[0][:t0]


def _split_pix(pix):
    # (T, P, 2) -> two (T, 1, P) planes (kernel-legal layouts, no gathers)
    return (
        jnp.swapaxes(pix[:, :, 0:1], 1, 2),
        jnp.swapaxes(pix[:, :, 1:2], 1, 2),
    )


@jax.custom_vjp
def composite_tiles(packed: jax.Array, pix: jax.Array):
    """Composite packed per-tile Gaussians.

    Args:
      packed: (T, K, 6+C) per-tile depth-sorted rows (see module docstring).
      pix: (T, P, 2) pixel-center coordinates per tile.

    Returns:
      (tile_images (T, P, C), tile_alphas (T, P)).
    """
    px, py = _split_pix(pix)
    img, alpha = _fwd_call(packed, px, py)
    return img, alpha[:, 0, :]


def _composite_fwd(packed, pix):
    px, py = _split_pix(pix)
    img, alpha = _fwd_call(packed, px, py)
    return (img, alpha[:, 0, :]), (packed, px, py)


def _composite_bwd(res, cts):
    packed, px, py = res
    g_img, g_alpha = cts
    g_packed = _bwd_call(packed, px, py, g_img, g_alpha[:, None, :])
    return g_packed, None


composite_tiles.defvjp(_composite_fwd, _composite_bwd)
