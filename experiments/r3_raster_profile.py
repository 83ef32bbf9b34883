"""Round-3 splat rasterizer profile: where do the 59 ms fwd+bwd go?

Stages timed separately at the bench shape (65k Gaussians, 640x480,
capacity 512) in ONE process:

  a. projection + sort + row/tile selection only (materialize tile index
     buffers) — the XLA binning phase;
  b. + packed gather (the (T, K, 6+C) rows);
  c. Pallas compositing forward only;
  d. Pallas compositing fwd+bwd;
  e. full render_splat fwd+bwd (the bench number);
  f. variants: tiles-per-grid-step G in {1, 4, 8} for the Pallas kernel
     (grid-step launch overhead hypothesis), capacity {256, 512},
     row_capacity {2048, 4096}.
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

WARMUP, ITERS = 6, 5


def bench(fn, *args) -> float:
    """ms per call; axon hygiene (distinct inputs via first arg nudge)."""
    def run(i):
        return fn(args[0] + 1e-6 * i, *args[1:])

    for i in range(WARMUP):
        jax.tree.map(lambda x: float(jnp.sum(x)), run(i))
    t0 = time.perf_counter()
    outs = [run(WARMUP + i) for i in range(ITERS)]
    for o in outs:
        jax.tree.map(lambda x: float(jnp.sum(x)), o)
    return (time.perf_counter() - t0) / ITERS * 1e3


def main():
    from uncertainty_nerf_gs_tpu.models.splatfacto import (
        SplatfactoConfig,
        init_gaussians,
        render_splat,
    )
    from uncertainty_nerf_gs_tpu.ops.gaussians import project_gaussians
    from uncertainty_nerf_gs_tpu.ops.rasterize import rasterize_gaussians

    cfg = SplatfactoConfig(capacity=1 << 16, num_random=65_000, random_scale=1.5)
    params, state = init_gaussians(jax.random.PRNGKey(0), cfg)
    c2w = jnp.asarray(
        [[1.0, 0, 0, 0], [0, 1.0, 0, 0], [0, 0, 1.0, 4.0]], jnp.float32
    )
    W, H = 640, 480
    results = {}

    @jax.jit
    def full_fwd_bwd(means):
        def loss(m):
            p = dict(params, means=m)
            out = render_splat(
                p, state.alive, c2w, 500.0, 500.0, W / 2, H / 2, W, H, cfg
            )
            return jnp.mean(out["rgb"]), out["rgb"]

        (l, rgb), g = jax.value_and_grad(loss, has_aux=True)(means)
        return l + jnp.sum(g[:, 0]) + rgb.sum()

    results["full_fwd_bwd_ms"] = round(bench(full_fwd_bwd, params["means"]), 2)
    print("full fwd+bwd:", results["full_fwd_bwd_ms"], "ms", flush=True)

    @jax.jit
    def full_fwd(means):
        p = dict(params, means=means)
        out = render_splat(
            p, state.alive, c2w, 500.0, 500.0, W / 2, H / 2, W, H, cfg
        )
        return out["rgb"]

    results["full_fwd_ms"] = round(bench(full_fwd, params["means"]), 2)
    print("full fwd:", results["full_fwd_ms"], "ms", flush=True)

    # isolate stages at raster level: fixed projected inputs
    from uncertainty_nerf_gs_tpu.ops import rasterize as R

    def make_proj(means):
        viewmat = jnp.eye(4).at[2, 3].set(-4.0)[:3]
        from uncertainty_nerf_gs_tpu.models.splatfacto import opengl_to_viewmat

        proj = project_gaussians(
            means, jnp.exp(params["scales"]), params["quats"],
            opengl_to_viewmat(c2w), 500.0, 500.0, W / 2, H / 2, W, H,
            near=cfg.near_plane,
        )
        return proj._replace(valid=proj.valid & state.alive)

    proj0 = jax.jit(make_proj)(params["means"])
    opac = jax.nn.sigmoid(params["opacities"])
    payload = jnp.concatenate(
        [jax.nn.sigmoid(params["features_dc"]), jnp.ones((cfg.capacity, 1))], -1
    )

    @jax.jit
    def raster_fwd(means2d):
        out = rasterize_gaussians(
            proj0._replace(means2d=means2d), opac, payload, W, H,
            capacity=512, tile_chunk=cfg.tile_chunk, backend="pallas",
        )
        return out.image

    results["raster_fwd_pallas_ms"] = round(bench(raster_fwd, proj0.means2d), 2)
    print("raster fwd pallas:", results["raster_fwd_pallas_ms"], flush=True)

    @jax.jit
    def raster_fwd_bwd(means2d):
        def loss(m):
            out = rasterize_gaussians(
                proj0._replace(means2d=m), opac, payload, W, H,
                capacity=512, tile_chunk=cfg.tile_chunk, backend="pallas",
            )
            return jnp.mean(out.image)

        l, g = jax.value_and_grad(loss)(means2d)
        return l + g.sum()

    results["raster_fwd_bwd_pallas_ms"] = round(
        bench(raster_fwd_bwd, proj0.means2d), 2
    )
    print("raster fwd+bwd pallas:", results["raster_fwd_bwd_pallas_ms"], flush=True)

    # selection-only: replicate the binning phase by calling with a payload
    # of width 1 and returning only overflow + packed index checksum
    @jax.jit
    def selection_only(means2d):
        out = rasterize_gaussians(
            proj0._replace(means2d=means2d), opac, payload[:, :1], W, H,
            capacity=512, tile_chunk=cfg.tile_chunk, backend="xla",
        )
        return out.max_overflow

    results["xla_full_c1_ms"] = round(bench(selection_only, proj0.means2d), 2)
    print("xla backend (C=1):", results["xla_full_c1_ms"], flush=True)

    print(json.dumps(results, indent=2), flush=True)
    with open("/tmp/r3_raster_profile.json", "w") as f:
        json.dump(results, f, indent=2)


if __name__ == "__main__":
    main()
