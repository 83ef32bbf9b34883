"""Prefix sums that map onto the MXU.

XLA lowers a minor-(lane-)axis ``jnp.cumsum`` on TPU as a sequential shift
chain with a lane relayout per step — measured here as the dominant cost of
both the PDF resampler (32k x 256 bins) and the splat rasterizer's
selection phase (per-row scans over 65k Gaussians). A prefix sum is a
multiply by an upper-triangular ones matrix, so a blocked decomposition
runs entirely on the MXU:

    x.reshape(..., B, 128) @ triu(128, 128)   # within-block prefixes
    + exclusive prefix of the block sums      # recurse on (..., B)

Recursion terminates when the axis fits one 128-wide block. f32 triangular
matmuls at HIGHEST precision are exact for sums of up to ~2^24-magnitude
integers, so the boolean/int32 counting scans in the rasterizer cast
through f32 safely (counts there are <= capacity <= 2^17).

`/root/reference` counterpart: none — torch's cumsum is a CUDA primitive;
this is a TPU-specific lowering concern.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

_BLOCK = 128


@functools.cache
def _tri(n: int):
    # numpy on purpose: caching a jnp array created inside a jit trace
    # would leak the tracer into later traces; a host constant is safe to
    # memoize and becomes an XLA constant per trace.
    return np.triu(np.ones((n, n), np.float32))


def _matmul_prefix(x: jax.Array) -> jax.Array:
    """Inclusive prefix along the last axis (<= _BLOCK wide) via one matmul."""
    return jax.lax.dot_general(
        x, _tri(x.shape[-1]),
        (((x.ndim - 1,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )


def cumsum_lanes_f32(x: jax.Array) -> jax.Array:
    """Inclusive cumsum along the last axis of an f32 array, MXU-blocked.

    Handles any length (pads to a multiple of 128 internally). Exact for
    integer-valued inputs with |sum| < 2^24.
    """
    n = x.shape[-1]
    if n <= _BLOCK:
        return _matmul_prefix(x)
    pad = (-n) % _BLOCK
    xp = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, pad)]) if pad else x
    blocks = xp.reshape(x.shape[:-1] + (-1, _BLOCK))
    within = _matmul_prefix(blocks)  # (..., B, 128)
    totals = within[..., -1]  # (..., B)
    offsets = cumsum_lanes_f32(totals) - totals  # exclusive block prefix
    out = within + offsets[..., None]
    return out.reshape(xp.shape)[..., :n]


def cumsum_lanes(x: jax.Array) -> jax.Array:
    """Lane-axis cumsum with the fast path on TPU-like backends.

    Integer inputs round-trip through f32 (exact below 2^24 — asserted
    nowhere, callers guarantee it: rasterizer counts are <= table sizes).
    """
    from uncertainty_nerf_gs_tpu.ops.backend import on_tpu

    if not on_tpu() or x.shape[-1] < 16:
        return jnp.cumsum(x, axis=-1)
    if jnp.issubdtype(x.dtype, jnp.integer) or x.dtype == jnp.bool_:
        return cumsum_lanes_f32(x.astype(jnp.float32)).astype(
            x.dtype if x.dtype != jnp.bool_ else jnp.int32
        )
    if x.dtype == jnp.float32:
        return cumsum_lanes_f32(x)
    if x.dtype in (jnp.bfloat16, jnp.float16):
        # mixed-precision callers (render_weights under bf16 AMP parity
        # mode): accumulate in f32 on the MXU, hand back the input dtype —
        # strictly more accurate than a sequential low-precision cumsum.
        return cumsum_lanes_f32(x.astype(jnp.float32)).astype(x.dtype)
    return jnp.cumsum(x, axis=-1)
