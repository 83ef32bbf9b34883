"""LPIPS-style learned perceptual distance in pure JAX.

The reference uses torchmetrics' LPIPS (AlexNet backbone + linear
calibration; consumed at `/root/reference/nerfuncertainty/scripts/
eval_uncertainty.py:685` through the nerfstudio model's ``self.lpips``).
Bundling the pretrained AlexNet weights is not possible offline, so this
module provides:

  * the LPIPS computation graph (5 conv stages, unit-normalized feature
    diffs, per-layer 1x1 linear weighting, spatial mean) with
    ``load_params(path)`` to plug in converted official weights
    (a ``.npz`` of the torch state dict);
  * a deterministic fixed-seed random-feature fallback — random conv
    features are a known perceptual-distance proxy (Amir & Weiss, 2021);
    scores are comparable within a run but are NOT the official LPIPS scale.

Images are (H, W, 3) in [0, 1]; they are shifted/scaled with the official
LPIPS normalization before feature extraction.
"""

from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

# AlexNet-feature geometry: (out_ch, kernel, stride, pad) per conv stage.
_ALEX_STAGES = (
    (64, 11, 4, 2),
    (192, 5, 1, 2),
    (384, 3, 1, 1),
    (256, 3, 1, 1),
    (256, 3, 1, 1),
)
# Max-pool (kernel 3, stride 2) after stages 0 and 1.
_POOL_AFTER = (0, 1)

_SHIFT = np.array([-0.030, -0.088, -0.188], dtype=np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], dtype=np.float32)


def init_random_params(seed: int = 0) -> dict[str, Any]:
    """Fixed-seed random backbone + uniform linear heads (fallback mode)."""
    rng = np.random.default_rng(seed)
    params: dict[str, Any] = {"convs": [], "lins": []}
    in_ch = 3
    for out_ch, k, _, _ in _ALEX_STAGES:
        fan_in = in_ch * k * k
        w = rng.normal(0.0, np.sqrt(2.0 / fan_in), (out_ch, in_ch, k, k))
        params["convs"].append(
            {"w": jnp.asarray(w, jnp.float32), "b": jnp.zeros((out_ch,), jnp.float32)}
        )
        params["lins"].append(jnp.full((out_ch,), 1.0 / out_ch, jnp.float32))
        in_ch = out_ch
    return params


def load_params(path: str) -> dict[str, Any]:
    """Load converted LPIPS weights from an ``.npz`` file.

    Expected keys: ``conv{i}_w`` (out,in,kh,kw), ``conv{i}_b`` (out,), and
    ``lin{i}`` (out,) for i in 0..4.
    """
    data = np.load(path)
    params: dict[str, Any] = {"convs": [], "lins": []}
    for i in range(len(_ALEX_STAGES)):
        params["convs"].append(
            {
                "w": jnp.asarray(data[f"conv{i}_w"], jnp.float32),
                "b": jnp.asarray(data[f"conv{i}_b"], jnp.float32),
            }
        )
        params["lins"].append(jnp.asarray(data[f"lin{i}"], jnp.float32))
    return params


_DEFAULT_PARAMS: dict[str, Any] | None = None


def _default_params() -> dict[str, Any]:
    global _DEFAULT_PARAMS
    if _DEFAULT_PARAMS is None:
        _DEFAULT_PARAMS = init_random_params()
    return _DEFAULT_PARAMS


def _conv(x: jax.Array, w: jax.Array, b: jax.Array, stride: int, pad: int) -> jax.Array:
    dn = jax.lax.conv_dimension_numbers(x.shape, w.shape, ("NCHW", "OIHW", "NCHW"))
    y = jax.lax.conv_general_dilated(
        x, w, (stride, stride), [(pad, pad), (pad, pad)], dimension_numbers=dn
    )
    return y + b[None, :, None, None]


def _maxpool(x: jax.Array) -> jax.Array:
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 1, 3, 3), (1, 1, 2, 2), "VALID"
    )


def _features(params, x: jax.Array) -> list[jax.Array]:
    feats = []
    for i, (conv, (_, _, stride, pad)) in enumerate(zip(params["convs"], _ALEX_STAGES)):
        x = _conv(x, conv["w"], conv["b"], stride, pad)
        x = jax.nn.relu(x)
        feats.append(x)
        if i in _POOL_AFTER:
            x = _maxpool(x)
    return feats


def _unit_normalize(x: jax.Array, eps: float = 1e-10) -> jax.Array:
    norm = jnp.sqrt(jnp.sum(x * x, axis=1, keepdims=True))
    return x / (norm + eps)


_MIN_SIZE = 64  # below this, AlexNet's stride/pool chain collapses a
# spatial dim to zero (empty mean -> NaN); tiny inputs are bilinearly
# upsampled first (torchmetrics' LPIPS likewise requires larger images).


@functools.partial(jax.jit, static_argnames=())
def _lpips_impl(params, img0: jax.Array, img1: jax.Array) -> jax.Array:
    # (H, W, 3) in [0,1] -> normalized (1, 3, H, W)
    def prep(img):
        h, w = img.shape[:2]
        if min(h, w) < _MIN_SIZE:
            scale = -(-_MIN_SIZE // min(h, w))  # integer upscale factor
            img = jax.image.resize(
                img, (h * scale, w * scale, 3), method="bilinear"
            )
        img = img.astype(jnp.float32) * 2.0 - 1.0
        img = (img - jnp.asarray(_SHIFT)) / jnp.asarray(_SCALE)
        return img.transpose(2, 0, 1)[None]

    f0 = _features(params, prep(img0))
    f1 = _features(params, prep(img1))
    total = jnp.float32(0.0)
    for a, b, lin in zip(f0, f1, params["lins"]):
        diff = (_unit_normalize(a) - _unit_normalize(b)) ** 2
        weighted = jnp.einsum("nchw,c->nhw", diff, lin)
        total = total + jnp.mean(weighted)
    return total


def lpips(img0: jax.Array, img1: jax.Array, params=None) -> jax.Array:
    """LPIPS distance between two (H, W, 3) images in [0, 1]."""
    if params is None:
        params = _default_params()
    return _lpips_impl(params, img0, img1)


@jax.jit
def _lpips_spatial_impl(params, img0: jax.Array, img1: jax.Array) -> jax.Array:
    # spatial=True semantics of the LPIPS reference implementation (used by
    # the reference's masked-LPIPS module, `/root/reference/nerfuncertainty/
    # metrics/image_metrics.py:26-54`): each layer's 1x1-weighted squared
    # feature diff is bilinearly upsampled to the INPUT resolution
    # (align_corners=False) and the layer maps are summed — no spatial mean.
    h, w = img0.shape[:2]

    def prep(img):
        hh, ww = img.shape[:2]
        if min(hh, ww) < _MIN_SIZE:
            scale = -(-_MIN_SIZE // min(hh, ww))
            img = jax.image.resize(
                img, (hh * scale, ww * scale, 3), method="bilinear"
            )
        img = img.astype(jnp.float32) * 2.0 - 1.0
        img = (img - jnp.asarray(_SHIFT)) / jnp.asarray(_SCALE)
        return img.transpose(2, 0, 1)[None]

    f0 = _features(params, prep(img0))
    f1 = _features(params, prep(img1))
    total = jnp.zeros((h, w), jnp.float32)
    for a, b, lin in zip(f0, f1, params["lins"]):
        diff = (_unit_normalize(a) - _unit_normalize(b)) ** 2
        weighted = jnp.einsum("nchw,c->hw", diff, lin)
        total = total + jax.image.resize(weighted, (h, w), method="bilinear")
    return total


def lpips_spatial(img0: jax.Array, img1: jax.Array, params=None) -> jax.Array:
    """Per-pixel LPIPS map, (H, W): the reference masked-LPIPS substrate."""
    if params is None:
        params = _default_params()
    return _lpips_spatial_impl(params, img0, img1)
