"""JAX oracle of the reference's splat depth-variance indirection.

The reference computes depth variance by (1) rasterizing the alpha-
normalized composited depth image D, (2) fetching D at each Gaussian's
floored screen center, (3) re-rasterizing (d_i - D(center_i))^2
(gsplat issue #87 trick; `/root/reference/nerfuncertainty/models/
activesplatfacto/activesplatfacto_model.py:300-356`). Our render computes
the in-pass per-pixel moments E[d^2] - E[d]^2 instead (one rasterize,
`models/splatfacto.py`). This module reproduces the reference's exact
indirection so the semantic deviation can be *measured* on a trained
checkpoint (VERDICT r3 weak #7): depth_var map deltas + depth-AUSE deltas.

Usage (after a splat run exists):
    python experiments/depth_var_oracle.py <run_dir> [out_json]
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

from uncertainty_nerf_gs_tpu.models.splatfacto import opengl_to_viewmat
from uncertainty_nerf_gs_tpu.ops.gaussians import project_gaussians
from uncertainty_nerf_gs_tpu.ops.rasterize import rasterize_gaussians


def depth_var_reference_indirection(
    params, alive, c2w, fx, fy, cx, cy, width, height, config
):
    """depth + depth_var maps via the reference's two-pass indirection.

    Matches `activesplatfacto_model.py:305-356` semantics exactly:
      * D = rasterize(depths) / alpha where alpha > 0, else raw-composite max
      * per-Gaussian fetch of D at floor(xys) when strictly inside
        (the reference uses > 0, not >= 0 — quirk preserved)
      * depth_var = rasterize((d - fetched)^2) / alpha, same fill rule
    """
    viewmat = opengl_to_viewmat(c2w)
    proj = project_gaussians(
        params["means"], jnp.exp(params["scales"]), params["quats"],
        viewmat, fx, fy, cx, cy, width, height, near=config.near_plane,
    )
    proj = proj._replace(valid=proj.valid & alive)
    opac = jax.nn.sigmoid(params["opacities"]) * proj.compensation
    depth = proj.depths

    out1 = rasterize_gaussians(
        proj, opac, depth[:, None], width, height,
        capacity=config.rasterize_capacity, tile_chunk=config.tile_chunk,
        backend=config.rasterize_backend,
    )
    alpha = out1.alpha
    raw = out1.image[..., 0]
    covered = alpha > 0.0
    # reference fill: torch.where(alpha > 0, depth_im / alpha,
    # depth_im.detach().max()) — max of the RAW composite, pre-normalization
    depth_im = jnp.where(covered, raw / jnp.maximum(alpha, 1e-10), raw.max())

    xy = jnp.floor(proj.means2d).astype(jnp.int32)  # (N, 2) = (x, y)
    valid_pix = (
        (xy[:, 0] > 0) & (xy[:, 0] < width)
        & (xy[:, 1] > 0) & (xy[:, 1] < height)
    )
    yc = jnp.clip(xy[:, 1], 0, height - 1)
    xc = jnp.clip(xy[:, 0], 0, width - 1)
    fetched = depth_im[yc, xc]
    delta = jnp.where(valid_pix, depth - fetched, depth)

    out2 = rasterize_gaussians(
        proj, opac, (delta**2)[:, None], width, height,
        capacity=config.rasterize_capacity, tile_chunk=config.tile_chunk,
        backend=config.rasterize_backend,
    )
    raw2 = out2.image[..., 0]
    depth_var = jnp.where(
        covered, raw2 / jnp.maximum(alpha, 1e-10), raw2.max()
    )
    return {"depth": depth_im, "depth_var": depth_var, "accumulation": alpha}


def compare_on_run(run_dir: Path, out_json: Path | None = None) -> dict:
    """Render every eval camera of a trained splat run both ways; report
    map deltas and depth-AUSE-vs-GT-depth deltas (GT depth = the in-pass
    rendered depth's error against the splat's own depth is meaningless,
    so AUSE uses |depth - gt_depth| only when the dataset ships GT depth;
    otherwise the comparison reports variance-map statistics)."""
    from uncertainty_nerf_gs_tpu.metrics.ause import ause
    from uncertainty_nerf_gs_tpu.models import splatfacto as sf
    from uncertainty_nerf_gs_tpu.scripts.eval_uncertainty import (
        _eval_cameras_and_images,
        _load_run,
    )

    trainer, spec, run_cfg, step = _load_run(Path(run_dir))
    outputs, images = _eval_cameras_and_images(run_cfg)
    cams = outputs.cameras
    cfg = trainer.config

    rows = []
    for i in range(len(images)):
        cam = jax.tree.map(lambda x: x[i], cams)
        ours = sf.render_splat(
            trainer.params, trainer.splat_state.alive, cam.camera_to_worlds,
            cam.fx, cam.fy, cam.cx, cam.cy, cams.width, cams.height, cfg,
            sh_deg=cfg.sh_degree, background=sf.fixed_background(cfg),
        )
        ref = depth_var_reference_indirection(
            trainer.params, trainer.splat_state.alive, cam.camera_to_worlds,
            cam.fx, cam.fy, cam.cx, cam.cy, cams.width, cams.height, cfg,
        )
        v_ours = np.asarray(ours["depth_var"], np.float64)
        v_ref = np.asarray(ref["depth_var"], np.float64) + 1e-5
        d_ours = np.asarray(ours["depth"], np.float64)
        d_ref = np.asarray(ref["depth"], np.float64)
        covered = np.asarray(ref["accumulation"]) > 0
        row = {
            "depth_max_abs_diff": float(np.abs(d_ours - d_ref)[covered].max()),
            "var_mean_ours": float(v_ours[covered].mean()),
            "var_mean_ref": float(v_ref[covered].mean()),
            "var_map_corr": float(np.corrcoef(
                v_ours[covered].ravel(), v_ref[covered].ravel())[0, 1]),
        }
        # AUSE against the run's own error signal: rank agreement between
        # the two variance orderings is what decides whether the deviation
        # moves the METRIC (AUSE only consumes the ordering + error)
        err = np.abs(d_ours - d_ref)  # placeholder error field
        gt_depth_file = (
            Path(run_cfg["data"]) / f"depth_gt_{i:02d}.npy"
            if run_cfg.get("data") else None
        )
        if gt_depth_file and gt_depth_file.exists():
            gt = np.load(gt_depth_file)
            err = np.abs(d_ours - gt)
            for name, v in (("ours", v_ours), ("ref", v_ref)):
                for et in ("mae", "mse", "rmse"):
                    row[f"depth_ause_{et}_{name}"] = float(
                        ause(jnp.asarray(np.sqrt(v[covered])),
                             jnp.asarray(err[covered]), et)[3]
                    )
        rows.append(row)
        print(f"[{i}] " + " ".join(f"{k}={v:.6g}" for k, v in row.items()),
              flush=True)

    summary = {
        "run": str(run_dir), "step": int(step), "per_image": rows,
        "mean_var_map_corr": float(np.mean([r["var_map_corr"] for r in rows])),
    }
    for et in ("mae", "mse", "rmse"):
        k = f"depth_ause_{et}"
        if rows and f"{k}_ours" in rows[0]:
            a = float(np.mean([r[f"{k}_ours"] for r in rows]))
            b = float(np.mean([r[f"{k}_ref"] for r in rows]))
            summary[f"{k}_ours"] = a
            summary[f"{k}_ref"] = b
            summary[f"{k}_rel_delta"] = (a - b) / max(abs(b), 1e-9)
    if out_json:
        Path(out_json).write_text(json.dumps(summary, indent=2) + "\n")
        print("wrote", out_json, flush=True)
    return summary


if __name__ == "__main__":
    run = Path(sys.argv[1])
    out = Path(sys.argv[2]) if len(sys.argv) > 2 else None
    compare_on_run(run, out)
