"""Image-quality metrics: PSNR, SSIM, LPIPS (pure JAX).

The reference consumes these from torchmetrics via the nerfstudio models
(`/root/reference/nerfuncertainty/scripts/eval_uncertainty.py:679-689`;
masked variants defined in `/root/reference/nerfuncertainty/metrics/
image_metrics.py`). Here they are implemented natively:

  * ``psnr`` — peak signal-to-noise ratio, data range 1.0.
  * ``ssim`` — structural similarity, Gaussian 11x11 window sigma=1.5,
    k1=0.01, k2=0.03, valid padding (torchmetrics-compatible defaults).
  * ``lpips`` — learned perceptual distance. The canonical AlexNet weights
    cannot be bundled; `uncertainty_nerf_gs_tpu.ops.lpips` evaluates the
    LPIPS network with loadable weights or a fixed-seed random-feature
    fallback (random conv features are a documented perceptual-distance
    proxy). Use :func:`lpips` for the default path.

All functions accept (H, W, C) float images in [0, 1] (batched variants via
``jax.vmap``) and are jittable with static shapes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@jax.jit
def psnr(pred: jax.Array, target: jax.Array, data_range: float = 1.0) -> jax.Array:
    """PSNR over all pixels/channels."""
    mse = jnp.mean((pred.astype(jnp.float32) - target.astype(jnp.float32)) ** 2)
    return 10.0 * jnp.log10(data_range**2 / mse)


def _gaussian_window(kernel_size: int, sigma: float) -> jax.Array:
    half = (kernel_size - 1) / 2.0
    coords = jnp.arange(kernel_size, dtype=jnp.float32) - half
    g = jnp.exp(-(coords**2) / (2.0 * sigma**2))
    return g / jnp.sum(g)


def _filter2d_separable(img: jax.Array, window: jax.Array) -> jax.Array:
    """Valid-padding separable filter over H and W of an (H, W, C) image."""
    k = window.shape[0]
    # (H, W, C) -> (C, 1, H, W) for depthwise-style conv per channel.
    x = img.transpose(2, 0, 1)[:, None, :, :]
    wh = window.reshape(1, 1, k, 1)
    ww = window.reshape(1, 1, 1, k)
    dn = jax.lax.conv_dimension_numbers(x.shape, wh.shape, ("NCHW", "OIHW", "NCHW"))
    x = jax.lax.conv_general_dilated(x, wh, (1, 1), "VALID", dimension_numbers=dn)
    x = jax.lax.conv_general_dilated(x, ww, (1, 1), "VALID", dimension_numbers=dn)
    return x[:, 0, :, :].transpose(1, 2, 0)


@functools.partial(jax.jit, static_argnames=("kernel_size",))
def ssim(
    pred: jax.Array,
    target: jax.Array,
    data_range: float = 1.0,
    kernel_size: int = 11,
    sigma: float = 1.5,
    k1: float = 0.01,
    k2: float = 0.03,
) -> jax.Array:
    """Mean SSIM between two (H, W, C) images."""
    pred = pred.astype(jnp.float32)
    target = target.astype(jnp.float32)
    window = _gaussian_window(kernel_size, sigma)
    c1 = (k1 * data_range) ** 2
    c2 = (k2 * data_range) ** 2

    mu_p = _filter2d_separable(pred, window)
    mu_t = _filter2d_separable(target, window)
    mu_pp = mu_p * mu_p
    mu_tt = mu_t * mu_t
    mu_pt = mu_p * mu_t

    # clamp variances at 0: E[x^2]-mu^2 can go slightly negative in f32 on
    # near-constant windows, flipping the denominator sign and producing
    # SSIM values far outside [-1, 1]
    sigma_pp = jnp.maximum(_filter2d_separable(pred * pred, window) - mu_pp, 0.0)
    sigma_tt = jnp.maximum(_filter2d_separable(target * target, window) - mu_tt, 0.0)
    sigma_pt = _filter2d_separable(pred * target, window) - mu_pt

    ssim_map = ((2.0 * mu_pt + c1) * (2.0 * sigma_pt + c2)) / (
        (mu_pp + mu_tt + c1) * (sigma_pp + sigma_tt + c2)
    )
    return jnp.mean(ssim_map)


def lpips(pred: jax.Array, target: jax.Array, params=None) -> jax.Array:
    """Perceptual distance between (H, W, C) images; see ops.lpips."""
    from uncertainty_nerf_gs_tpu.ops import lpips as _lpips_mod

    return _lpips_mod.lpips(pred, target, params=params)


# --- masked variants (reference `nerfuncertainty/metrics/image_metrics.py`
# defines masked PSNR/SSIM/LPIPS modules; import commented out of
# `metrics/__init__.py:3` upstream but part of the component inventory) ----


@jax.jit
def masked_psnr(
    pred: jax.Array, target: jax.Array, mask: jax.Array, data_range: float = 1.0
) -> jax.Array:
    """PSNR over pixels where mask (H, W) is true."""
    m = mask[..., None].astype(jnp.float32)
    se = ((pred - target) ** 2) * m
    mse = jnp.sum(se) / jnp.maximum(jnp.sum(m) * pred.shape[-1] / m.shape[-1], 1.0)
    return 10.0 * jnp.log10(data_range**2 / mse)


@functools.partial(jax.jit, static_argnames=("kernel_size",))
def masked_ssim(
    pred: jax.Array,
    target: jax.Array,
    mask: jax.Array,
    data_range: float = 1.0,
    kernel_size: int = 11,
) -> jax.Array:
    """Mean SSIM over windows whose center pixel is inside the mask."""
    pred = pred.astype(jnp.float32)
    target = target.astype(jnp.float32)
    window = _gaussian_window(kernel_size, 1.5)
    c1 = (0.01 * data_range) ** 2
    c2 = (0.03 * data_range) ** 2
    mu_p = _filter2d_separable(pred, window)
    mu_t = _filter2d_separable(target, window)
    sigma_pp = _filter2d_separable(pred * pred, window) - mu_p * mu_p
    sigma_tt = _filter2d_separable(target * target, window) - mu_t * mu_t
    sigma_pt = _filter2d_separable(pred * target, window) - mu_p * mu_t
    ssim_map = ((2.0 * mu_p * mu_t + c1) * (2.0 * sigma_pt + c2)) / (
        (mu_p**2 + mu_t**2 + c1) * (sigma_pp + sigma_tt + c2)
    )
    half = (kernel_size - 1) // 2
    m = mask[half:-half, half:-half, None].astype(jnp.float32)
    return jnp.sum(ssim_map * m) / jnp.maximum(jnp.sum(m) * ssim_map.shape[-1] / m.shape[-1], 1.0)


def masked_lpips(
    pred: jax.Array,
    target: jax.Array,
    mask: jax.Array | None = None,
    params=None,
) -> jax.Array:
    """Masked LPIPS via the spatial-LPIPS hack (reference
    `nerfuncertainty/metrics/image_metrics.py:26-54,149-182`): the LPIPS
    net runs in spatial mode (per-layer weighted diff maps upsampled to
    input resolution and summed), then the per-pixel map is averaged over
    the mask — ``sum(map * mask) / sum(mask)`` — or over all pixels when
    ``mask`` is None. pred/target: (H, W, 3) in [0, 1]; mask: (H, W)."""
    from uncertainty_nerf_gs_tpu.ops import lpips as _lpips_mod

    lmap = _lpips_mod.lpips_spatial(pred, target, params=params)
    if mask is None:
        return jnp.mean(lmap)
    m = mask.astype(jnp.float32)
    return jnp.sum(lmap * m) / jnp.maximum(jnp.sum(m), 1.0)
