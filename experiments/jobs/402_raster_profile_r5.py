"""Un-confounded splat-raster stage profile (VERDICT r5 #2, first step).

The r4 stage ablation was physically impossible (select_pack_only 259.7 ms
> full 80.2 ms) — its fakes changed the compiled program instead of
isolating stages. This job times each stage ON ITS REAL INPUTS using the
production `select_and_pack` / `composite_tiles` boundary (ops/rasterize.py
refactor), so every measurement is the stage's real in-context cost:

  * full fwd / fwd+bwd            (rasterize_gaussians, pallas backend)
  * select_and_pack fwd / fwd+bwd (selection + pack gather + its scatter bwd)
  * composite fwd / fwd+bwd       (pallas kernel on the materialized pack)
  * sort+order-gathers only       (argsort + 6 N-row gathers)
  * select only                   (selection scans, no pack gather)
  * pack gather only fwd / fwd+bwd (the (T,K) row gather + scatter-add bwd)
  * tile_chunk compile-cliff probe (32 / 64 / 128 on select_and_pack)

Bench shape: 65k random Gaussians, 640x480, capacity 384 (BENCH_r04).
Writes evidence/raster_profile_r5.json progressively.
"""

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
    SplatfactoConfig,
    init_gaussians,
    render_splat,
)
from uncertainty_nerf_gs_tpu.models.splatfacto import opengl_to_viewmat
from uncertainty_nerf_gs_tpu.ops.gaussians import Projection, project_gaussians
from uncertainty_nerf_gs_tpu.ops import sh as sh_ops
from uncertainty_nerf_gs_tpu.ops.rasterize import (
    rasterize_gaussians,
    select_and_pack,
)
from uncertainty_nerf_gs_tpu.ops.rasterize_pallas import composite_tiles

OUT = Path("/root/repo/evidence/raster_profile_r5.json")
results: dict = {"_meta": {
    "shape": "65k gaussians, 640x480, capacity 384, tile_chunk 64, "
             "payload C=5 (rgb+depth+depth2)",
    "note": "all stages timed on their REAL materialized inputs via the "
            "production select_and_pack/composite_tiles boundary",
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
        print(f"{tag:34s}: {dt*1e3:8.2f} ms", flush=True)
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
CAP = cfg.rasterize_capacity


# ---- production inputs to the rasterizer (projection done once) --------
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
print("prep done; payload C =", payl0.shape[-1], flush=True)


def perturb(i):
    # distinct inputs per iter: shift screen means by a subpixel epsilon
    return proj0._replace(means2d=proj0.means2d + 1e-4 * i)


# ---- 0. bench-anchor: full fwd+bwd through projection (bench.py shape) --
@jax.jit
def bench_anchor(means):
    def loss(m):
        p = dict(params, means=m)
        out = render_splat(p, state.alive, c2w, 500.0, 500.0, W / 2, H / 2,
                           W, H, cfg)
        return jnp.mean(out["rgb"]), out["rgb"]

    (l, rgb), g = jax.value_and_grad(loss, has_aux=True)(means)
    return l + jnp.sum(g[:, 0]) + rgb.sum()


bench(lambda i: bench_anchor(params["means"] + 1e-6 * i), "bench_anchor_fwd_bwd")


# ---- 1. full rasterizer fwd / fwd+bwd (raster-only grads) ---------------
@jax.jit
def full_fwd(proj, opac, payl):
    out = rasterize_gaussians(proj, opac, payl, W, H, capacity=CAP,
                              backend="pallas")
    return out.image.sum() + out.alpha.sum() + out.max_overflow


bench(lambda i: full_fwd(perturb(i), opac0, payl0), "full_fwd")


@jax.jit
def full_fwd_bwd(proj, opac, payl):
    def loss(m2d, op, pv):
        out = rasterize_gaussians(proj._replace(means2d=m2d), op, pv, W, H,
                                  capacity=CAP, backend="pallas")
        return out.image.sum() + out.alpha.sum()

    l, gs = jax.value_and_grad(loss, argnums=(0, 1, 2))(
        proj.means2d, opac, payl
    )
    return l + sum(g.sum() for g in gs)


bench(lambda i: full_fwd_bwd(perturb(i), opac0, payl0), "full_fwd_bwd")


# ---- 2. select_and_pack fwd / fwd+bwd -----------------------------------
@jax.jit
def selpack_fwd(proj, opac, payl):
    sp = select_and_pack(proj, opac, payl, W, H, capacity=CAP)
    return (sp.packed.sum() + sp.pix.sum() + sp.counts.sum()
            + sp.overflows.sum())


bench(lambda i: selpack_fwd(perturb(i), opac0, payl0), "selpack_fwd")

rw = jax.random.normal(jax.random.PRNGKey(1), (1, CAP, payl0.shape[-1] + 6))


@jax.jit
def selpack_fwd_bwd(proj, opac, payl):
    def loss(m2d, op, pv):
        sp = select_and_pack(proj._replace(means2d=m2d), op, pv, W, H,
                             capacity=CAP)
        return jnp.sum(sp.packed * rw) + sp.pix.sum()

    l, gs = jax.value_and_grad(loss, argnums=(0, 1, 2))(
        proj.means2d, opac, payl
    )
    return l + sum(g.sum() for g in gs)


bench(lambda i: selpack_fwd_bwd(perturb(i), opac0, payl0), "selpack_fwd_bwd")

# ---- 3. composite on the real materialized pack -------------------------
sp0 = jax.jit(
    lambda proj, opac, payl: select_and_pack(proj, opac, payl, W, H,
                                             capacity=CAP)
)(proj0, opac0, payl0)
packed0 = jnp.asarray(sp0.packed)
pix0 = jnp.asarray(sp0.pix)
counts0 = jnp.asarray(sp0.counts)
print("pack: T", packed0.shape[0], "counts mean/max",
      float(counts0.mean()), int(counts0.max()), flush=True)
results["_pack_stats"] = {
    "tiles": int(packed0.shape[0]),
    "counts_mean": round(float(counts0.mean()), 1),
    "counts_max": int(counts0.max()),
    "overflow_max": int(sp0.overflows.max()),
}


@jax.jit
def comp_fwd(packed):
    img, al = composite_tiles(packed, pix0, counts0)
    return img.sum() + al.sum()


bench(lambda i: comp_fwd(packed0 + 1e-6 * i), "composite_fwd")


@jax.jit
def comp_fwd_bwd(packed):
    def loss(pk):
        img, al = composite_tiles(pk, pix0, counts0)
        return img.sum() + al.sum()

    l, g = jax.value_and_grad(loss)(packed)
    return l + g.sum()


bench(lambda i: comp_fwd_bwd(packed0 + 1e-6 * i), "composite_fwd_bwd")


# ---- 4. sort + order-gathers only ---------------------------------------
@jax.jit
def sort_gathers(proj, opac, payl):
    key = jnp.where(proj.valid, proj.depths, jnp.inf)
    order = jnp.argsort(key)
    pieces = [proj.means2d[order], proj.conics[order], proj.radii[order],
              opac[order], payl[order]]
    return sum(p.sum() for p in pieces)


bench(lambda i: sort_gathers(perturb(i), opac0, payl0), "sort_gathers_fwd")


# ---- 5. selection only (no pack gather) ---------------------------------
from uncertainty_nerf_gs_tpu.ops.rasterize import _selection, _pad_to_multiple


@jax.jit
def select_only(proj, opac, payl):
    sel = _selection(proj, opac, payl, W, H, CAP, None)
    num_tiles = sel["num_tiles"]
    pad_tiles = _pad_to_multiple(num_tiles, 64)
    tids = jnp.concatenate([
        jnp.arange(num_tiles, dtype=jnp.int32),
        jnp.zeros((pad_tiles - num_tiles,), jnp.int32),
    ]).reshape(-1, 64)
    idx_all, overflows = jax.lax.map(jax.vmap(sel["select_fn"]), tids)
    return idx_all.astype(jnp.float32).sum() + overflows.sum()


bench(lambda i: select_only(perturb(i), opac0, payl0), "select_only_fwd")


# ---- 6. pack gather only on a precomputed idx_all ------------------------
idx_all0 = jnp.asarray(
    jax.jit(
        lambda proj: jax.lax.map(
            jax.vmap(_selection(proj, opac0, payl0, W, H, CAP, None)["select_fn"]),
            jnp.concatenate([
                jnp.arange(1200, dtype=jnp.int32),
                jnp.zeros((_pad_to_multiple(1200, 64) - 1200,), jnp.int32),
            ]).reshape(-1, 64),
        )[0]
    )(proj0).reshape(-1, CAP)
)
src0 = jax.random.normal(jax.random.PRNGKey(2),
                         (65_000 + 1, payl0.shape[-1] + 6))


@jax.jit
def gather_only(src):
    return src[idx_all0].sum()


bench(lambda i: gather_only(src0 + 1e-6 * i), "pack_gather_fwd")


@jax.jit
def gather_only_bwd(src):
    def loss(s):
        return jnp.sum(s[idx_all0] * 0.5)

    l, g = jax.value_and_grad(loss)(src)
    return l + g.sum()


bench(lambda i: gather_only_bwd(src0 + 1e-6 * i), "pack_gather_fwd_bwd")


# ---- 7. tile_chunk compile-cliff probe on select_and_pack ---------------
for tc in (32, 128):
    @jax.jit
    def selpack_tc(proj, opac, payl, tc=tc):
        sp = select_and_pack(proj, opac, payl, W, H, capacity=CAP,
                             tile_chunk=tc)
        return sp.packed.sum() + sp.counts.sum() + sp.overflows.sum()

    bench(lambda i: selpack_tc(perturb(i), opac0, payl0),
          f"selpack_fwd_tc{tc}")

print("JOB_402_DONE", flush=True)
