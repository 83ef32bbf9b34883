"""`ut-render`: render a camera trajectory from a trained run.

Covers the `ns-render`-shaped capability reference users get from
nerfstudio (camera-path / interpolated / orbit video export — SURVEY §1 L7;
VERDICT r1 "render/trajectory export"). Renders RGB (+ depth and, for
uncertainty methods, std maps) along a generated path and writes PNG frames
plus an animated GIF (no ffmpeg on this image).

Trajectories:
  * ``orbit``        — circle at the mean camera radius/height, looking at
                       the scene center;
  * ``interpolate``  — smooth interpolation through the run's eval cameras.

Usage:
    ut-render --load-config outputs/run1 --output-dir renders/ \
        --traj orbit --num-frames 60
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path

import jax.numpy as jnp
import numpy as np

from uncertainty_nerf_gs_tpu.cameras.cameras import Cameras
from uncertainty_nerf_gs_tpu.utils.images import colorize as _colorize
from uncertainty_nerf_gs_tpu.utils.images import to_u8 as _to_u8


def _look_at(origin: np.ndarray, target: np.ndarray, up=(0.0, 0.0, 1.0)):
    """OpenGL c2w (3, 4): camera at origin looking at target."""
    forward = target - origin
    forward = forward / np.linalg.norm(forward)
    right = np.cross(forward, np.asarray(up, np.float64))
    nr = np.linalg.norm(right)
    if nr < 1e-8:  # looking along up: pick another basis
        right = np.cross(forward, np.array([0.0, 1.0, 0.0]))
        nr = np.linalg.norm(right)
    right = right / nr
    true_up = np.cross(right, forward)
    c2w = np.zeros((3, 4), np.float32)
    c2w[:, 0], c2w[:, 1], c2w[:, 2], c2w[:, 3] = right, true_up, -forward, origin
    return c2w


def orbit_path(cameras: Cameras, num_frames: int) -> np.ndarray:
    """(F, 3, 4) orbit at the mean camera radius + height around z."""
    pos = np.asarray(cameras.camera_to_worlds[:, :3, 3])
    center = pos.mean(0)
    radius = float(np.linalg.norm((pos - center)[:, :2], axis=1).mean())
    height = float(pos[:, 2].mean())
    frames = []
    for t in np.linspace(0, 2 * np.pi, num_frames, endpoint=False):
        origin = center + np.array(
            [radius * np.cos(t), radius * np.sin(t), height - center[2]]
        )
        frames.append(_look_at(origin, center))
    return np.stack(frames)


def interpolate_path(cameras: Cameras, num_frames: int) -> np.ndarray:
    """(F, 3, 4) positions interpolated through the camera ring, always
    looking at the scene center (smooth and robust without slerp)."""
    pos = np.asarray(cameras.camera_to_worlds[:, :3, 3])
    center = pos.mean(0)
    n = len(pos)
    ts = np.linspace(0, n, num_frames, endpoint=False)
    frames = []
    for t in ts:
        i0, frac = int(t) % n, t - int(t)
        i1 = (i0 + 1) % n
        origin = (1 - frac) * pos[i0] + frac * pos[i1]
        frames.append(_look_at(origin, center))
    return np.stack(frames)




def main(argv: list[str] | None = None) -> Path:
    ap = argparse.ArgumentParser(description="render a camera trajectory")
    ap.add_argument("--load-config", required=True, help="trained run dir")
    ap.add_argument("--output-dir", default="renders")
    ap.add_argument("--traj", default="orbit", choices=["orbit", "interpolate"])
    ap.add_argument("--num-frames", type=int, default=30)
    ap.add_argument("--fps", type=int, default=10)
    ap.add_argument("--outputs", nargs="+", default=["rgb"],
                    help="channels to export: rgb, depth, rgb_std, depth_std")
    args = ap.parse_args(argv)

    from uncertainty_nerf_gs_tpu.scripts.eval_uncertainty import (
        _eval_cameras_and_images,
        _load_run,
        build_render_fn,
    )

    run_dir = Path(args.load_config)
    trainer, spec, run_cfg, _ = _load_run(run_dir)
    eval_outputs, _ = _eval_cameras_and_images(run_cfg)
    base_cams = eval_outputs.cameras

    path_fn = orbit_path if args.traj == "orbit" else interpolate_path
    c2ws = path_fn(base_cams, args.num_frames)
    path_cams = Cameras(
        camera_to_worlds=jnp.asarray(c2ws),
        fx=jnp.full((len(c2ws),), float(base_cams.fx[0])),
        fy=jnp.full((len(c2ws),), float(base_cams.fy[0])),
        cx=jnp.full((len(c2ws),), float(base_cams.cx[0])),
        cy=jnp.full((len(c2ws),), float(base_cams.cy[0])),
        width=base_cams.width,
        height=base_cams.height,
        camera_type=base_cams.camera_type,
    )
    render_fn = build_render_fn(trainer, spec, path_cams, run_dir)

    out_dir = Path(args.output_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    from PIL import Image

    frames_by_key: dict[str, list] = {k: [] for k in args.outputs}
    for i in range(len(c2ws)):
        outs = render_fn(i)
        for k in args.outputs:
            if k not in outs:
                continue
            arr = np.asarray(outs[k])
            img = _to_u8(arr) if k == "rgb" else _colorize(arr)
            Image.fromarray(img).save(out_dir / f"{k}_{i:04d}.png")
            frames_by_key[k].append(img)
        print(f"frame {i + 1}/{len(c2ws)}", flush=True)

    for k, frames in frames_by_key.items():
        if not frames:
            continue
        gif = [Image.fromarray(f) for f in frames]
        gif[0].save(
            out_dir / f"{k}.gif", save_all=True, append_images=gif[1:],
            duration=int(1000 / args.fps), loop=0,
        )
    with open(out_dir / "trajectory.json", "w") as f:
        json.dump({"traj": args.traj, "num_frames": args.num_frames,
                   "c2ws": c2ws.tolist()}, f)
    print(f"wrote {out_dir}")
    return out_dir


if __name__ == "__main__":
    main()
