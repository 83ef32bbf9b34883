"""Cameras, ray generation, and SE(3)/SO(3) utilities."""

from uncertainty_nerf_gs_tpu.cameras.cameras import Cameras, generate_rays
from uncertainty_nerf_gs_tpu.cameras.lie import exp_map_SE3, exp_map_SO3xR3

__all__ = ["Cameras", "generate_rays", "exp_map_SE3", "exp_map_SO3xR3"]
