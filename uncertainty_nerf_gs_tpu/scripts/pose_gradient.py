"""Camera-pose sensitivity maps: per-pixel gradients of the render wrt a
6-DoF pose perturbation.

Rebuild of `/root/reference/nerfuncertainty/scripts/
estimate_gradient_pose_6dof.py`: the reference builds a 6-DoF perturbation
vector (`:22-39`), composes `exp_map_SE3` with the camera-to-world
(`:118-126`), then re-renders in 256-ray chunks calling
`torch.autograd.grad(pred_rgb_j.mean(-1), c2w_perturbed)` once per pixel
(`:153-190`) — an O(pixels) backward loop.

TPU-native: the pose tangent is a (6,) input and the per-pixel Jacobian of
the whole chunk is ONE `jax.jacrev` through the ray generation + render
(`SURVEY §7 stage 7`): jacobian shape (chunk, 3, 6) per launch, no Python
loop over pixels.
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from uncertainty_nerf_gs_tpu.cameras.cameras import Cameras, generate_rays, pixel_grid
from uncertainty_nerf_gs_tpu.cameras.lie import exp_map_SE3, compose_poses


def get_perturbed_6dof_pose(
    magnitude_trans: float = 0.0,
    magnitude_rot: float = 0.0,
    direction: int = 0,
) -> np.ndarray:
    """(6,) tangent [tx ty tz | rx ry rz] with one active component
    (`estimate_gradient_pose_6dof.py:22-39` semantics)."""
    v = np.zeros(6, np.float32)
    if direction < 3:
        v[direction] = magnitude_trans
    else:
        v[direction] = magnitude_rot
    return v


def pose_jacobian_render(
    model_apply,
    cameras: Cameras,
    camera_idx: int,
    tangent: jnp.ndarray,
    chunk: int = 256,
) -> dict[str, np.ndarray]:
    """Per-pixel (3, 6) pose Jacobians + the perturbed render.

    model_apply(ray_bundle) -> outputs dict with "rgb" (R, 3).
    """
    h, w = cameras.height, cameras.width
    px, py = pixel_grid(h, w)
    total = h * w
    pad = (-total) % chunk
    px = jnp.concatenate([px, jnp.zeros((pad,))])
    py = jnp.concatenate([py, jnp.zeros((pad,))])
    idx = jnp.full((total + pad,), camera_idx, jnp.int32)

    def render_rgb(tan, px_c, py_c, idx_c):
        delta = exp_map_SE3(tan[None])[0]
        c2w = compose_poses(
            delta[None], cameras.camera_to_worlds[camera_idx][None]
        )[0]
        cams = cameras.replace(
            camera_to_worlds=jnp.where(
                (jnp.arange(len(cameras)) == camera_idx)[:, None, None],
                c2w[None],
                cameras.camera_to_worlds,
            )
        )
        rb = generate_rays(cams, idx_c, px_c, py_c)
        return model_apply(rb)["rgb"]

    jac_fn = jax.jit(jax.jacrev(render_rgb, argnums=0))
    render_fn = jax.jit(render_rgb)

    jacs, rgbs = [], []
    for s in range(0, total + pad, chunk):
        sl = slice(s, s + chunk)
        jacs.append(np.asarray(jac_fn(tangent, px[sl], py[sl], idx[sl])))
        rgbs.append(np.asarray(render_fn(tangent, px[sl], py[sl], idx[sl])))
    jac = np.concatenate(jacs, 0)[:total].reshape(h, w, 3, 6)
    rgb = np.concatenate(rgbs, 0)[:total].reshape(h, w, 3)
    # sensitivity magnitude per pixel: ||d mean_rgb / d tangent||
    sens = np.linalg.norm(jac.mean(axis=2), axis=-1)
    return {"jacobian": jac, "rgb": rgb, "sensitivity": sens}


def main(argv: list[str] | None = None) -> None:
    ap = argparse.ArgumentParser(description="pose-gradient sensitivity maps")
    ap.add_argument("--load-config", required=True, help="trained run dir")
    ap.add_argument("--output-dir", default="pose_grads")
    ap.add_argument("--camera-idx", type=int, default=0)
    ap.add_argument("--magnitude-trans", type=float, default=0.0)
    ap.add_argument("--magnitude-rot", type=float, default=0.0)
    ap.add_argument("--direction", type=int, default=0, choices=range(6))
    ap.add_argument("--chunk", type=int, default=256)
    args = ap.parse_args(argv)

    from uncertainty_nerf_gs_tpu.scripts.eval_uncertainty import (
        _eval_cameras_and_images,
        _load_run,
    )

    trainer, spec, run_cfg, _ = _load_run(Path(args.load_config))
    eval_outputs, _ = _eval_cameras_and_images(run_cfg)
    params = {
        k: v for k, v in trainer.state.params.items() if k != "camera_opt"
    }

    def model_apply(rb):
        return trainer.model.apply({"params": params}, rb, train=False)

    tangent = jnp.asarray(
        get_perturbed_6dof_pose(
            args.magnitude_trans, args.magnitude_rot, args.direction
        )
    )
    out = pose_jacobian_render(
        model_apply, eval_outputs.cameras, args.camera_idx, tangent, args.chunk
    )
    out_dir = Path(args.output_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    np.save(out_dir / f"jacobian_{args.camera_idx}.npy", out["jacobian"])
    np.save(out_dir / f"sensitivity_{args.camera_idx}.npy", out["sensitivity"])
    from PIL import Image

    Image.fromarray(
        (np.clip(out["rgb"], 0, 1) * 255).astype(np.uint8)
    ).save(out_dir / f"render_{args.camera_idx}.png")
    s = out["sensitivity"]
    Image.fromarray(
        (np.clip(s / max(s.max(), 1e-9), 0, 1) * 255).astype(np.uint8)
    ).save(out_dir / f"sensitivity_{args.camera_idx}.png")
    with open(out_dir / "intrinsics.json", "w") as f:
        json.dump(
            {
                "fx": float(eval_outputs.cameras.fx[args.camera_idx]),
                "fy": float(eval_outputs.cameras.fy[args.camera_idx]),
                "cx": float(eval_outputs.cameras.cx[args.camera_idx]),
                "cy": float(eval_outputs.cameras.cy[args.camera_idx]),
            },
            f,
        )
    print(f"pose-gradient maps written to {out_dir}")


if __name__ == "__main__":
    main()
