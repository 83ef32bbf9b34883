"""A/B the one-hot MXU matmul tile compaction vs the scatter+gather pack
(VERDICT r5 #2c — attack the dominant stage).

The r5 profile (job 402) split the 42.5 ms pallas fwd+bwd into
select 26.2 / pack-gather 6.5 / composite 12.8; the scatter compaction
dominates. `pack_via="matmul"` (ops/rasterize.py::pack_fn) emits packed
tile rows directly as a one-hot (capacity, row_cap) matmul — exact
(tests/test_splat.py::test_select_and_pack_matmul_matches_gather), no
index buffers, backward = transposed matmul + a 30k-row scatter-add
instead of a 467k-row one.

Also measures matmul-pack at raised row capacities (the truncation fix
candidate — job 407 quantifies what row_cap 1536 truncation costs) and
the bench-shape anchor with each pack_via.

Writes evidence/raster_pack_ab_r5.json progressively; the winner becomes
the production default (SplatfactoConfig.rasterize_pack_via + bench.py).
"""

import sys as _sys
for _k in [k for k in _sys.modules if k.startswith("uncertainty_nerf_gs_tpu")]:
    del _sys.modules[_k]

import dataclasses
import json
import time
import traceback
from pathlib import Path

import sys
sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from uncertainty_nerf_gs_tpu.models.splatfacto import (
    SplatfactoConfig, init_gaussians, render_splat, opengl_to_viewmat,
)
from uncertainty_nerf_gs_tpu.ops.gaussians import project_gaussians
from uncertainty_nerf_gs_tpu.ops import sh as sh_ops
from uncertainty_nerf_gs_tpu.ops.rasterize import select_and_pack
from uncertainty_nerf_gs_tpu.ops.rasterize_pallas import composite_tiles

OUT = Path("/root/repo/evidence/raster_pack_ab_r5.json")
results: dict = {"_meta": {
    "shape": "65k gaussians, 640x480, capacity 384, tile_chunk 64, C=5",
}}
ITERS = 5


def bench(run, tag):
    try:
        for i in range(4):
            float(jnp.sum(run(i)))
        t0 = time.perf_counter()
        outs = [run(4 + i) for i in range(ITERS)]
        s = float(jnp.sum(jnp.stack([o.sum() for o in outs])))
        dt = (time.perf_counter() - t0) / ITERS
        assert np.isfinite(s), f"{tag}: non-finite checksum"
        results[tag] = round(dt * 1e3, 2)
        print(f"{tag:40s}: {dt*1e3:8.2f} ms", flush=True)
    except Exception as e:
        results[tag] = f"ERROR: {type(e).__name__}: {e}"[:300]
        print(f"{tag}: FAILED {e}", flush=True)
        traceback.print_exc()
    OUT.write_text(json.dumps(results, indent=2) + "\n")


cfg = SplatfactoConfig(
    capacity=1 << 16, num_random=65_000, random_scale=1.5,
    rasterize_capacity=384,
)
params, state = init_gaussians(jax.random.PRNGKey(0), cfg)
c2w = jnp.asarray([[1.0, 0, 0, 0], [0, 1.0, 0, 0], [0, 0, 1.0, 4.0]],
                  jnp.float32)
W, H = 640, 480
CAP = 384


@jax.jit
def prep(params):
    viewmat = opengl_to_viewmat(c2w)
    proj = project_gaussians(
        params["means"], jnp.exp(params["scales"]), params["quats"],
        viewmat, 500.0, 500.0, W / 2, H / 2, W, H, near=cfg.near_plane,
    )
    proj = proj._replace(valid=proj.valid & state.alive)
    cam_pos = c2w[:3, 3]
    viewdirs = params["means"] - cam_pos[None]
    coeffs = jnp.concatenate(
        [params["features_dc"][:, None, :], params["features_rest"]], axis=1
    )
    rgbs = jnp.clip(
        sh_ops.eval_sh_colors(cfg.sh_degree, coeffs, viewdirs, cfg.sh_degree)
        + 0.5, 0.0, None,
    )
    opac = jax.nn.sigmoid(params["opacities"]) * proj.compensation
    payload = jnp.concatenate(
        [rgbs, proj.depths[:, None], (proj.depths ** 2)[:, None]], axis=-1
    )
    return proj, opac, payload


proj0, opac0, payl0 = jax.tree.map(jnp.asarray, prep(params))
print("prep done", flush=True)


def perturb(i):
    return proj0._replace(means2d=proj0.means2d + 1e-4 * i)


# ---- select_and_pack boundary, both vias, several row capacities --------
for via, row_cap, tag in [
    ("gather", None, "selpack_gather_row1536"),
    ("matmul", None, "selpack_matmul_row1536"),
    ("matmul", 4096, "selpack_matmul_row4096"),
    ("matmul", 8192, "selpack_matmul_row8192"),
    ("gather", 8192, "selpack_gather_row8192"),
]:
    @jax.jit
    def sp_fwd(proj, via=via, row_cap=row_cap):
        sp = select_and_pack(proj, opac0, payl0, W, H, capacity=CAP,
                             row_capacity=row_cap, pack_via=via)
        return sp.packed.sum() + sp.counts.sum()

    bench(lambda i, f=sp_fwd: f(perturb(i)), tag + "_fwd")

    @jax.jit
    def sp_fb(proj, via=via, row_cap=row_cap):
        def loss(mu):
            sp = select_and_pack(proj._replace(means2d=mu), opac0, payl0,
                                 W, H, capacity=CAP, row_capacity=row_cap,
                                 pack_via=via)
            return jnp.sum(sp.packed ** 2)

        l, g = jax.value_and_grad(loss)(proj.means2d)
        return l + g.sum()

    bench(lambda i, f=sp_fb: f(perturb(i)), tag + "_fwd_bwd")

# ---- full pipeline fwd+bwd (selpack + pallas composite), both vias ------
for via, row_cap, tag in [
    ("gather", None, "full_gather_row1536"),
    ("matmul", None, "full_matmul_row1536"),
    ("matmul", 8192, "full_matmul_row8192"),
]:
    @jax.jit
    def full_fb(proj, via=via, row_cap=row_cap):
        def loss(mu):
            sp = select_and_pack(proj._replace(means2d=mu), opac0, payl0,
                                 W, H, capacity=CAP, row_capacity=row_cap,
                                 pack_via=via)
            imgs, alphas = composite_tiles(sp.packed, sp.pix, sp.counts)
            return jnp.sum(imgs ** 2) + jnp.sum(alphas)

        l, g = jax.value_and_grad(loss)(proj.means2d)
        return l + g.sum()

    bench(lambda i, f=full_fb: f(perturb(i)), tag + "_fwd_bwd")

# ---- bench.py anchor (through projection+SH) with each via ---------------
for via in ("gather", "matmul"):
    acfg = dataclasses.replace(cfg, rasterize_pack_via=via)

    @jax.jit
    def anchor(means, acfg=acfg):
        def loss(m):
            p = dict(params, means=m)
            out = render_splat(p, state.alive, c2w, 500.0, 500.0, W / 2,
                               H / 2, W, H, acfg)
            return jnp.mean(out["rgb"]), out["rgb"]

        (l, rgb), g = jax.value_and_grad(loss, has_aux=True)(means)
        return l + jnp.sum(g[:, 0]) + rgb.sum()

    bench(lambda i, f=anchor: f(params["means"] + 1e-6 * i),
          f"bench_anchor_{via}")

print("JOB_408_DONE", flush=True)
