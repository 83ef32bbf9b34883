"""Uncertainty and image-quality metrics (pure JAX, shape-static, jittable)."""

from uncertainty_nerf_gs_tpu.metrics.ause import ause
from uncertainty_nerf_gs_tpu.metrics.auce import auce
from uncertainty_nerf_gs_tpu.metrics.nll import gaussian_nll
from uncertainty_nerf_gs_tpu.metrics.image_metrics import psnr, ssim

__all__ = ["ause", "auce", "gaussian_nll", "psnr", "ssim"]
