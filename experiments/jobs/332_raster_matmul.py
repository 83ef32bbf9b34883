"""Matmul-compositing rasterizer backend vs Pallas at the bench shape
(65k Gaussians, 640x480) + cost decomposition (replaces crashed job 302).

The "matmul" backend (ops/rasterize.py::composite_tiles_mm) computes the
transmittance scan as exp(strict-lower-triangular matmul of log1p(-alpha))
on the MXU, with plain autodiff — no sequential K loop.

Measures:
  * parity: matmul vs xla rgb max|diff| at the bench shape;
  * fwd+bwd ms for matmul at capacity {256, 384, 512} (pallas cap384 51.6
    ms is the r4 sweep's incumbent, evidence/raster_sweep_r4.json);
  * fwd-only ms at the best capacity;
  * decomposition at best capacity: select+pack only (composite faked to
    a reduction that CONSUMES the packed gather, so nothing upstream is
    DCE'd) -> composite cost = total - select_pack.

Writes /root/repo/evidence/raster_matmul_r4.json.
"""

import sys as _sys
for _k in [k for k in _sys.modules if k.startswith("uncertainty_nerf_gs_tpu")]:
    del _sys.modules[_k]  # long-lived worker: force fresh package code


import json
import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

import sys
sys.path.insert(0, "/root/repo")

import uncertainty_nerf_gs_tpu.ops.rasterize as R
from uncertainty_nerf_gs_tpu.models.splatfacto import (
    SplatfactoConfig,
    init_gaussians,
    render_splat,
)

W, H = 640, 480
c2w = jnp.asarray([[1.0, 0, 0, 0], [0, 1.0, 0, 0], [0, 0, 1.0, 4.0]],
                  jnp.float32)
WARMUP, ITERS = 6, 5
results = {}
out_path = Path("/root/repo/evidence/raster_matmul_r4.json")


def _flush():
    out_path.write_text(json.dumps(results, indent=2) + "\n")


def make(cfg_kwargs):
    cfg = SplatfactoConfig(capacity=1 << 16, num_random=65_000,
                           random_scale=1.5, **cfg_kwargs)
    params, state = init_gaussians(jax.random.PRNGKey(0), cfg)
    return cfg, params, state


def bench_render(cfg, params, state, with_bwd=True):
    @jax.jit
    def fwd_bwd(means):
        def loss(m):
            p = dict(params, means=m)
            out = render_splat(p, state.alive, c2w, 500.0, 500.0, W / 2,
                               H / 2, W, H, cfg)
            return jnp.mean(out["rgb"]), out["rgb"]

        if with_bwd:
            (l, rgb), g = jax.value_and_grad(loss, has_aux=True)(means)
            return l + jnp.sum(g[:, 0]) + rgb.sum()
        l, rgb = loss(means)
        return l + rgb.sum()

    def run(i):
        return fwd_bwd(params["means"] + 1e-6 * i)

    for i in range(WARMUP):
        float(run(i))
    t0 = time.perf_counter()
    vals = [run(WARMUP + i) for i in range(ITERS)]
    s = float(jnp.sum(jnp.stack(vals)))
    dt = time.perf_counter() - t0
    assert np.isfinite(s)
    return 1000.0 * dt / ITERS  # ms/frame


# -- parity at the bench shape ------------------------------------------
_, params, state = make({})
rgb = {}
for backend in ("matmul", "xla"):
    cfg_b, _, _ = make({"rasterize_backend": backend})
    out = jax.jit(lambda p, a, c=cfg_b: render_splat(
        p, a, c2w, 500.0, 500.0, W / 2, H / 2, W, H, c))(params, state.alive)
    rgb[backend] = np.asarray(out["rgb"], np.float32)
diff = float(np.abs(rgb["matmul"] - rgb["xla"]).max())
results["matmul_vs_xla_max_abs_diff"] = diff
print("matmul vs xla max|diff| =", diff, flush=True)
_flush()

# -- capacity sweep -------------------------------------------------------
for cap in (256, 384, 512):
    cfg, params, state = make(
        {"rasterize_capacity": cap, "rasterize_backend": "matmul"})
    ms = bench_render(cfg, params, state)
    results[f"matmul_cap{cap}_fwd_bwd_ms"] = round(ms, 2)
    print(f"matmul cap={cap}: {ms:.2f} ms/frame fwd+bwd", flush=True)
    _flush()

best_cap = min((256, 384, 512),
               key=lambda c: results[f"matmul_cap{c}_fwd_bwd_ms"])
cfg, params, state = make(
    {"rasterize_capacity": best_cap, "rasterize_backend": "matmul"})
results["best_cap"] = best_cap
results[f"matmul_cap{best_cap}_fwd_ms"] = round(
    bench_render(cfg, params, state, with_bwd=False), 2)
print("fwd-only:", results[f"matmul_cap{best_cap}_fwd_ms"], flush=True)
_flush()

# -- decomposition: select+pack only (composite faked, inputs consumed) ---
real_mm = R.composite_tiles_mm


def fake_mm(packed, pix, tile_chunk=64):
    t, k, d = packed.shape
    p = pix.shape[1]
    s = jnp.sum(packed) * 1e-20 + jnp.sum(pix) * 1e-20
    return (jnp.zeros((t, p, d - 6)) + s, jnp.zeros((t, p)) + s)


R.composite_tiles_mm = fake_mm
jax.clear_caches()
ms = bench_render(cfg, params, state)
results[f"select_pack_only_cap{best_cap}_fwd_bwd_ms"] = round(ms, 2)
print(f"select+pack only: {ms:.2f} ms/frame", flush=True)
R.composite_tiles_mm = real_mm
_flush()

# tile_chunk sensitivity on the best capacity
for tc in (32, 128, 300):
    jax.clear_caches()
    cfg_tc, params_tc, state_tc = make(
        {"rasterize_capacity": best_cap, "rasterize_backend": "matmul",
         "tile_chunk": tc})
    ms = bench_render(cfg_tc, params_tc, state_tc)
    results[f"matmul_cap{best_cap}_tc{tc}_fwd_bwd_ms"] = round(ms, 2)
    print(f"tile_chunk={tc}: {ms:.2f} ms/frame", flush=True)
    _flush()

print("JOB_332_DONE", flush=True)
