"""Analytic synthetic scenes for tests and benchmarks.

No datasets ship with this environment, so correctness tests (overfit to
PSNR targets), dataparser round-trips and benches run on a procedurally
generated Blender-style scene: colored soft spheres inside the unit box,
volume-rendered densely against the analytic density/color (the "ground
truth renderer" role the Blender synthetic set plays for the reference).

`write_blender_dataset` materializes the scene as a nerfstudio/Blender
`transforms_train.json` + PNG tree so the dataparsers (SURVEY §2.2) can be
tested end-to-end without external downloads.
"""

from __future__ import annotations

import functools
import json
import math
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from uncertainty_nerf_gs_tpu.cameras.cameras import Cameras, generate_rays, pixel_grid
from uncertainty_nerf_gs_tpu.ops.raymarch import (
    render_accumulation,
    render_expected_depth,
    render_rgb,
    render_weights,
)
from uncertainty_nerf_gs_tpu.ops.sampling import RayBundle, sample_uniform, spacing_uniform, spacing_uniform_inv

# scene: three colored soft spheres
_SPHERES = np.array(
    [  # cx, cy, cz, radius
        [0.0, 0.0, 0.0, 0.35],
        [0.45, 0.2, -0.1, 0.22],
        [-0.4, -0.25, 0.15, 0.18],
    ],
    dtype=np.float32,
)
_COLORS = np.array(
    [[0.9, 0.25, 0.2], [0.2, 0.7, 0.9], [0.95, 0.85, 0.2]], dtype=np.float32
)
_SHARPNESS = 40.0
_DENSITY = 60.0


def scene_density(p: jax.Array) -> jax.Array:
    """Analytic density at points (..., 3)."""
    centers = jnp.asarray(_SPHERES[:, :3])
    radii = jnp.asarray(_SPHERES[:, 3])
    d = jnp.linalg.norm(p[..., None, :] - centers, axis=-1)  # (..., K)
    occ = jax.nn.sigmoid((radii - d) * _SHARPNESS)
    return _DENSITY * jnp.max(occ, axis=-1)


def scene_rgb(p: jax.Array) -> jax.Array:
    """Analytic color: nearest sphere's color with radial shading."""
    centers = jnp.asarray(_SPHERES[:, :3])
    radii = jnp.asarray(_SPHERES[:, 3])
    colors = jnp.asarray(_COLORS)
    d = jnp.linalg.norm(p[..., None, :] - centers, axis=-1) / radii
    nearest = jnp.argmin(d, axis=-1)
    base = colors[nearest]
    shade = 0.6 + 0.4 * jnp.clip(1.0 - jnp.min(d, axis=-1), 0.0, 1.0)
    return jnp.clip(base * shade[..., None], 0.0, 1.0)


def hemisphere_cameras(
    num_cameras: int,
    height: int = 64,
    width: int = 64,
    radius: float = 2.2,
    full_sphere_x: bool = False,
    focal_mult: float = 1.2,
    seed: int = 0,
) -> Cameras:
    """Look-at cameras on a (hemi)sphere around the origin (Blender-style)."""
    rng = np.random.default_rng(seed)
    golden = math.pi * (3.0 - math.sqrt(5.0))
    c2ws = []
    for i in range(num_cameras):
        # evenly spread on the upper hemisphere via golden spiral
        z = (i + 0.5) / num_cameras  # (0, 1]
        elev = 0.15 + 0.75 * z * math.pi / 2
        azim = golden * i + rng.uniform(0, 0.05)
        x = math.cos(azim) * math.cos(elev)
        y = math.sin(azim) * math.cos(elev)
        zz = math.sin(elev)
        eye = np.array([x, y, zz]) * radius
        if full_sphere_x and i % 2 == 1:
            eye[0] = -abs(eye[0])
        # OpenGL look-at: camera -z points to origin
        forward = -eye / np.linalg.norm(eye)
        up = np.array([0.0, 0.0, 1.0])
        right = np.cross(forward, up)
        right /= np.linalg.norm(right)
        true_up = np.cross(right, forward)
        rot = np.stack([right, true_up, -forward], axis=-1)  # columns x,y,z
        c2ws.append(np.concatenate([rot, eye[:, None]], axis=-1))
    c2ws = np.stack(c2ws).astype(np.float32)
    focal = focal_mult * max(height, width)
    n = num_cameras
    return Cameras(
        camera_to_worlds=jnp.asarray(c2ws),
        fx=jnp.full((n,), focal, jnp.float32),
        fy=jnp.full((n,), focal, jnp.float32),
        cx=jnp.full((n,), width / 2.0, jnp.float32),
        cy=jnp.full((n,), height / 2.0, jnp.float32),
        width=width,
        height=height,
    )


@functools.partial(
    jax.jit, static_argnames=("num_samples", "white_background", "height", "width")
)
def _render_gt(
    cameras: Cameras,
    camera_idx: jax.Array,
    num_samples: int,
    near: float,
    far: float,
    white_background: bool,
    height: int,
    width: int,
):
    px, py = pixel_grid(height, width)
    idx = jnp.full((height * width,), camera_idx, jnp.int32)
    rb = generate_rays(cameras, idx, px, py)
    rb = rb._replace(
        nears=jnp.full_like(rb.nears, near), fars=jnp.full_like(rb.fars, far)
    )
    rs = sample_uniform(
        rb, num_samples, spacing_fn=spacing_uniform, spacing_fn_inv=spacing_uniform_inv
    )
    pos = rs.positions
    weights = render_weights(scene_density(pos), rs.deltas)
    bg = jnp.ones(3) if white_background else jnp.zeros(3)
    rgb = render_rgb(weights, scene_rgb(pos), bg)
    depth = render_expected_depth(weights, rs.midpoints)
    acc = render_accumulation(weights)
    return rgb, depth, acc


def render_ground_truth(
    cameras: Cameras,
    camera_idx: int,
    num_samples: int = 256,
    near: float = 0.5,
    far: float = 4.5,
    white_background: bool = True,
):
    """Dense analytic volume render -> (H, W, 3) rgb, (H, W) depth, acc."""
    h, w = cameras.height, cameras.width
    rgb, depth, acc = _render_gt(
        cameras,
        jnp.int32(camera_idx),
        num_samples,
        near,
        far,
        white_background,
        h,
        w,
    )
    return (
        np.asarray(rgb).reshape(h, w, 3),
        np.asarray(depth).reshape(h, w),
        np.asarray(acc).reshape(h, w),
    )


def make_dataset(
    num_cameras: int = 10, height: int = 64, width: int = 64, **kwargs
) -> tuple[Cameras, np.ndarray, np.ndarray]:
    """Cameras + stacked GT images (N, H, W, 3) + depths (N, H, W)."""
    cameras = hemisphere_cameras(num_cameras, height, width, **kwargs)
    images, depths = [], []
    for i in range(num_cameras):
        rgb, depth, _ = render_ground_truth(cameras, i)
        images.append(rgb)
        depths.append(depth)
    return cameras, np.stack(images), np.stack(depths)


def write_blender_dataset(
    root: Path | str,
    num_train: int = 8,
    num_test: int = 4,
    height: int = 64,
    width: int = 64,
    write_depth: bool = True,
) -> Path:
    """Write the scene as a Blender-synthetic dataset tree.

    Layout matches what the blender dataparsers expect:
    ``transforms_{split}.json`` with ``camera_angle_x`` and per-frame
    ``file_path`` (no extension) + ``transform_matrix`` (4x4 OpenGL c2w),
    images under ``<split>/r_{i}.png``, optional test-split depth
    ``r_{i}_depth_0001.png``.
    """
    from PIL import Image

    root = Path(root)
    total = num_train + num_test
    cameras, images, depths = make_dataset(total, height, width)
    focal = float(cameras.fx[0])
    camera_angle_x = 2.0 * math.atan(width / (2.0 * focal))

    splits = {"train": range(num_train), "test": range(num_train, total)}
    splits["val"] = splits["test"]
    for split, idxs in splits.items():
        (root / split).mkdir(parents=True, exist_ok=True)
        frames = []
        for j, i in enumerate(idxs):
            name = f"r_{j}"
            img = (images[i] * 255).astype(np.uint8)
            Image.fromarray(img).save(root / split / f"{name}.png")
            if write_depth and split == "test":
                d = depths[i]
                dn = (np.clip(d / d.max(), 0, 1) * 255).astype(np.uint8)
                Image.fromarray(dn).save(root / split / f"{name}_depth_0001.png")
            c2w = np.asarray(cameras.camera_to_worlds[i])
            mat = np.concatenate([c2w, np.array([[0.0, 0.0, 0.0, 1.0]])], axis=0)
            frames.append(
                {
                    "file_path": f"./{split}/{name}",
                    "transform_matrix": mat.tolist(),
                }
            )
        with open(root / f"transforms_{split}.json", "w") as f:
            json.dump({"camera_angle_x": camera_angle_x, "frames": frames}, f, indent=1)
    return root


# The COLMAP->nerfstudio axis permutation ns-process-data records as
# `applied_transform` (an involution: A @ A == I).
_APPLIED_TRANSFORM = np.array(
    [[0.0, 1.0, 0.0, 0.0], [1.0, 0.0, 0.0, 0.0], [0.0, 0.0, -1.0, 0.0]],
    dtype=np.float64,
)


def write_nerfstudio_dataset(
    root: Path | str,
    num_frames: int = 10,
    height: int = 24,
    width: int = 24,
    k1: float = 1e-3,
    p1: float = 2e-4,
    num_points: int = 240,
    seed: int = 0,
    applied_transform: bool = True,
) -> Path:
    """Write the scene as a COLMAP-processed nerfstudio capture tree.

    Exercises the real-capture surface of `parse_nerfstudio`
    (`data/dataparsers.py`) that the Blender trees never touch — the
    layout `ns-process-data` emits and the reference consumes through
    `nerfstudio_dataparser` (`robustnerf_dataparser.py:98-158,379-386`):

    * one ``transforms.json`` with GLOBAL ``cx/cy/w/h`` + OPENCV
      distortion (``k1``/``p1``) and PER-FRAME ``fl_x``/``fl_y``
      overrides (per-frame intrinsics fall back to globals per key);
    * images under ``images/frame_XXXXX.png`` (extension kept, unlike
      Blender's extensionless ``file_path``);
    * an ``applied_transform`` (the COLMAP axis permutation) plus a
      ``binary_little_endian`` ``sparse_pc.ply`` of SfM seed points
      stored in the PRE-applied (COLMAP) frame, so parsing must chain
      applied_transform into the orientation transform to land them in
      the oriented/scaled world.

    GT images are rendered THROUGH the distortion model (generate_rays
    undistorts), so train/eval on this tree is self-consistent. The
    world-space seed points are saved as ``points_world.npy`` beside the
    tree for transform-chaining oracle tests.
    """
    from PIL import Image

    root = Path(root)
    (root / "images").mkdir(parents=True, exist_ok=True)
    base = hemisphere_cameras(num_frames, height, width)
    # per-frame focal spread (COLMAP per-image intrinsics); distortion on
    focal = float(base.fx[0])
    fx = focal * (1.0 + 0.04 * np.arange(num_frames) / max(num_frames - 1, 1))
    dist = np.tile(
        np.array([[k1, 0.0, 0.0, 0.0, p1, 0.0]], np.float32), (num_frames, 1)
    )
    cams = base.replace(
        fx=jnp.asarray(fx, jnp.float32),
        fy=jnp.asarray(fx, jnp.float32),
        distortion_params=jnp.asarray(dist),
    )

    frames = []
    for i in range(num_frames):
        rgb, _, _ = render_ground_truth(cams, i)
        name = f"images/frame_{i:05d}.png"
        Image.fromarray((rgb * 255).astype(np.uint8)).save(root / name)
        c2w = np.asarray(cams.camera_to_worlds[i], np.float64)
        mat = np.concatenate([c2w, [[0.0, 0.0, 0.0, 1.0]]], axis=0)
        frames.append({
            "file_path": name,
            "transform_matrix": mat.tolist(),
            "fl_x": float(fx[i]),
            "fl_y": float(fx[i]),
        })

    # SfM seed points on the analytic sphere surfaces (world frame),
    # stored in the PLY pre-applied: p_ply = A @ p_world (A involution)
    rng = np.random.default_rng(seed)
    per = num_points // len(_SPHERES)
    pts_w, cols = [], []
    for (cx_, cy_, cz_, r), col in zip(_SPHERES, _COLORS):
        n = rng.normal(size=(per, 3))
        n /= np.linalg.norm(n, axis=-1, keepdims=True)
        pts_w.append(np.array([cx_, cy_, cz_]) + r * n)
        cols.append(np.tile((col * 255).astype(np.uint8), (per, 1)))
    pts_w = np.concatenate(pts_w).astype(np.float64)
    cols = np.concatenate(cols)
    np.save(root / "points_world.npy", pts_w.astype(np.float32))
    if applied_transform:
        a_h = np.concatenate(
            [_APPLIED_TRANSFORM, [[0.0, 0.0, 0.0, 1.0]]], axis=0
        )
        pts_ply = (np.linalg.inv(a_h)[:3, :3] @ pts_w.T).T.astype(np.float32)
    else:  # no applied_transform recorded: PLY already in world frame
        pts_ply = pts_w.astype(np.float32)
    dt = np.dtype([("x", "<f4"), ("y", "<f4"), ("z", "<f4"),
                   ("red", "u1"), ("green", "u1"), ("blue", "u1")])
    rec = np.empty(len(pts_ply), dtype=dt)
    rec["x"], rec["y"], rec["z"] = pts_ply.T
    rec["red"], rec["green"], rec["blue"] = cols.T
    header = (
        "ply\nformat binary_little_endian 1.0\n"
        f"element vertex {len(rec)}\n"
        "property float x\nproperty float y\nproperty float z\n"
        "property uchar red\nproperty uchar green\nproperty uchar blue\n"
        "end_header\n"
    )
    with open(root / "sparse_pc.ply", "wb") as f:
        f.write(header.encode("ascii"))
        f.write(rec.tobytes())

    meta = {
        "camera_model": "OPENCV",
        "cx": width / 2.0,
        "cy": height / 2.0,
        "w": width,
        "h": height,
        "k1": k1,
        "k2": 0.0,
        "p1": p1,
        "p2": 0.0,
        "ply_file_path": "sparse_pc.ply",
        "frames": frames,
    }
    if applied_transform:
        meta["applied_transform"] = _APPLIED_TRANSFORM.tolist()
    with open(root / "transforms.json", "w") as f:
        json.dump(meta, f, indent=1)
    return root
