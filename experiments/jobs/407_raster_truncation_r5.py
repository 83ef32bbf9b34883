"""Quantify capacity/row-capacity truncation cost (VERDICT r4 weak #3 /
next #2b): the bench anchor runs at capacity=384 with reported per-tile
overflow 8859, but `overflow` counts drops at BOTH cull levels — the
per-ROW candidate buffer (row_cap = max(4*cap, 1024) = 1536) AND the
per-tile buffer. The r5 profile's pack stats (counts_max 284 < 384) say
the per-TILE buffer never saturates at the bench shape; the 8859 is
row-level drops. Nobody has measured what that truncation costs in image
terms, nor what capacity renders overflow-free.

This job, on the exact bench scene (init_gaussians seed 0, 65k random,
640x480) and on the trained 16k active-splatfacto checkpoint:
  1. renders an overflow-free reference (capacity up, row_capacity=n),
     escalating until reported overflow == 0;
  2. renders each candidate config and reports PSNR vs the overflow-free
     render, reported overflow, and fwd timing;
  3. reports the TRUE per-tile intersection max (counts_max at full rows)
     = the minimal overflow-free capacity.

Writes /root/repo/evidence/raster_truncation_r5.json progressively.
"""

import sys as _sys
for _k in [k for k in _sys.modules if k.startswith("uncertainty_nerf_gs_tpu")]:
    del _sys.modules[_k]

import dataclasses
import json
import time
from pathlib import Path

import sys
sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from uncertainty_nerf_gs_tpu.models.splatfacto import (
    SplatfactoConfig, init_gaussians, render_splat,
)

OUT = Path("/root/repo/evidence/raster_truncation_r5.json")
results: dict = {"_meta": {
    "note": "PSNR is vs the overflow-free render of the same scene; "
            "overflow counts drops at BOTH cull levels (row + tile)",
}}


def save():
    OUT.write_text(json.dumps(results, indent=2) + "\n")


def psnr(a, b):
    mse = float(np.mean((np.asarray(a, np.float64) - np.asarray(b, np.float64)) ** 2))
    return 99.0 if mse < 1e-12 else float(10.0 * np.log10(1.0 / mse))


# ---- part 1: bench scene -------------------------------------------------
BASE = SplatfactoConfig(capacity=1 << 16, num_random=65_000, random_scale=1.5)
params, state = init_gaussians(jax.random.PRNGKey(0), BASE)
c2w = jnp.asarray([[1.0, 0, 0, 0], [0, 1.0, 0, 0], [0, 0, 1.0, 4.0]], jnp.float32)
W, H = 640, 480


def render(cap, row_cap, backend="auto"):
    cfg = dataclasses.replace(
        BASE, rasterize_capacity=cap, rasterize_row_capacity=row_cap,
        rasterize_backend=backend,
    )

    @jax.jit
    def f(p):
        out = render_splat(p, state.alive, c2w, 500.0, 500.0, W / 2, H / 2,
                           W, H, cfg)
        return out["rgb"], out["depth"], out["raster_overflow"]

    rgb, depth, ov = f(params)
    rgb = np.asarray(rgb)
    t0 = time.perf_counter()
    rgb2, _, _ = f(params)
    np.asarray(rgb2)
    dt = (time.perf_counter() - t0) * 1e3
    return rgb, np.asarray(depth), int(ov), dt


# overflow-free reference: escalate capacity at full rows
ref_rgb = ref_depth = None
for cap in (2048, 4096, 8192):
    try:
        rgb, depth, ov, dt = render(cap, 65_536)
        results[f"ref_cap{cap}_fullrows"] = {"overflow": ov, "fwd_ms": round(dt, 2)}
        save()
        print(f"cap{cap} fullrows: overflow={ov} fwd={dt:.1f}ms", flush=True)
        if ov == 0:
            ref_rgb, ref_depth = rgb, depth
            results["_meta"]["overflow_free_capacity"] = cap
            break
    except Exception as e:
        results[f"ref_cap{cap}_fullrows"] = f"ERROR: {e}"[:200]
        save()
assert ref_rgb is not None, "no overflow-free reference achieved"

# true per-tile intersection max (minimal overflow-free capacity)
try:
    from uncertainty_nerf_gs_tpu.models.splatfacto import opengl_to_viewmat
    from uncertainty_nerf_gs_tpu.ops.gaussians import project_gaussians
    from uncertainty_nerf_gs_tpu.ops.rasterize import select_and_pack

    @jax.jit
    def _counts():
        proj = project_gaussians(
            params["means"], jnp.exp(params["scales"]), params["quats"],
            opengl_to_viewmat(c2w), 500.0, 500.0, W / 2, H / 2, W, H,
            near=BASE.near_plane,
        )
        proj = proj._replace(valid=proj.valid & state.alive)
        opac = jax.nn.sigmoid(params["opacities"]) * proj.compensation
        sp = select_and_pack(
            proj, opac, jnp.zeros((proj.means2d.shape[0], 1)), W, H,
            capacity=2048, row_capacity=65_536)
        return sp.counts

    sp_counts = _counts()
    results["true_counts_max"] = int(jnp.max(sp_counts))
    results["true_counts_mean"] = round(float(jnp.mean(sp_counts)), 1)
    save()
except Exception as e:
    results["true_counts_max"] = f"ERROR: {e}"[:200]
    save()

for name, cap, row in [
    ("bench_cap384_row1536", 384, None),
    ("cap512_row2048", 512, None),
    ("cap384_row8192", 384, 8192),
    ("cap512_row65536", 512, 65_536),
    ("cap1024_row65536", 1024, 65_536),
]:
    try:
        rgb, depth, ov, dt = render(cap, row)
        cov = ref_depth < np.max(ref_depth) - 1e-6
        results[name] = {
            "overflow": ov,
            "fwd_ms": round(dt, 2),
            "psnr_vs_overflow_free": round(psnr(rgb, ref_rgb), 2),
            "depth_mae_covered": round(
                float(np.abs(depth - ref_depth)[cov].mean()), 5),
        }
        print(name, results[name], flush=True)
    except Exception as e:
        results[name] = f"ERROR: {e}"[:200]
    save()

# ---- part 2: trained 16k splat checkpoint --------------------------------
try:
    from uncertainty_nerf_gs_tpu.scripts.eval_uncertainty import (
        _eval_cameras_and_images, _load_run,
    )
    from uncertainty_nerf_gs_tpu.models import splatfacto as sf

    run = Path("/root/repo/.soak/r3/soak_active-splatfacto")
    trainer, spec, run_cfg, step = _load_run(run)
    outputs, images = _eval_cameras_and_images(run_cfg)
    cams = outputs.cameras
    cam = jax.tree.map(lambda x: x[0], cams)
    tcfg = trainer.config

    def trained_render(cap, row):
        cfg = dataclasses.replace(
            tcfg, rasterize_capacity=cap, rasterize_row_capacity=row)
        out = jax.jit(lambda p: sf.render_splat(
            p, trainer.splat_state.alive, cam.camera_to_worlds, cam.fx,
            cam.fy, cam.cx, cam.cy, cams.width, cams.height, cfg,
            sh_deg=cfg.sh_degree, background=sf.fixed_background(cfg),
        ))(trainer.params)
        return (np.asarray(out["rgb"]), np.asarray(out["depth"]),
                int(out["raster_overflow"]))

    t_ref = None
    for cap in (2048, 4096):
        rgb, depth, ov = trained_render(cap, 65_536)
        results[f"trained16k_ref_cap{cap}"] = {"overflow": ov}
        save()
        if ov == 0:
            t_ref = (rgb, depth)
            break
    if t_ref is not None:
        for name, cap, row in [("trained16k_cap384", 384, None),
                               ("trained16k_cap512_default", 512, None)]:
            rgb, depth, ov = trained_render(cap, row)
            results[name] = {
                "overflow": ov,
                "psnr_vs_overflow_free": round(psnr(rgb, t_ref[0]), 2),
            }
            print(name, results[name], flush=True)
            save()
    else:
        results["trained16k"] = "no overflow-free capacity <= 4096"
        save()
except Exception as e:
    import traceback; traceback.print_exc()
    results["trained16k"] = f"ERROR: {e}"[:300]
    save()

print("JOB_407_DONE", flush=True)
