"""Splat rasterizer perf sweep at the bench shape (65k Gaussians, 640x480).

Measures render_splat fwd+bwd (the BENCH secondary metric) across:
  * rasterize_capacity {256, 384, 512} with overflow stats (the CPU
    occupancy study: median 698 intersecting/tile, opacity ~0.1 =>
    saturation at ~175 splats, so the K-chunked kernel's saturation exit
    should make small capacities nearly free in quality);
  * _TILES_PER_STEP {8, 16} and _K_CHUNK {64, 128} on the best capacity
    (module-level knobs of ops/rasterize_pallas.py, monkeypatched).

Also validates the K-chunked Pallas kernel against the XLA backend
numerically at the bench shape (max |diff| of the rgb image).

Writes /root/repo/evidence/raster_sweep_r4.json.
"""

import json
import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

import sys
sys.path.insert(0, "/root/repo")

from uncertainty_nerf_gs_tpu.models.splatfacto import (
    SplatfactoConfig,
    init_gaussians,
    render_splat,
)
from uncertainty_nerf_gs_tpu.ops import rasterize_pallas as rp

W, H = 640, 480
c2w = jnp.asarray([[1.0, 0, 0, 0], [0, 1.0, 0, 0], [0, 0, 1.0, 4.0]],
                  jnp.float32)
WARMUP, ITERS = 6, 5


def make(cfg_kwargs):
    cfg = SplatfactoConfig(capacity=1 << 16, num_random=65_000,
                           random_scale=1.5, **cfg_kwargs)
    params, state = init_gaussians(jax.random.PRNGKey(0), cfg)
    return cfg, params, state


def bench_fwd_bwd(cfg, params, state):
    @jax.jit
    def fwd_bwd(means):
        def loss(m):
            p = dict(params, means=m)
            out = render_splat(p, state.alive, c2w, 500.0, 500.0, W / 2,
                               H / 2, W, H, cfg)
            return jnp.mean(out["rgb"]), out["rgb"]

        (l, rgb), g = jax.value_and_grad(loss, has_aux=True)(means)
        return l + jnp.sum(g[:, 0]) + rgb.sum()

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


results = {}

# numerical check: pallas vs xla rgb at bench shape (capacity 512)
_, params, state = make({})
rgb = {}
for backend in ("pallas", "xla"):
    cfg_b, _, _ = make({"rasterize_backend": backend})
    out = jax.jit(lambda p, a, c=cfg_b: render_splat(
        p, a, c2w, 500.0, 500.0, W / 2, H / 2, W, H, c))(
        params, state.alive)
    rgb[backend] = np.asarray(out["rgb"], np.float32)
diff = float(np.abs(rgb["pallas"] - rgb["xla"]).max())
results["pallas_vs_xla_max_abs_diff"] = diff
print("pallas vs xla max|diff| =", diff, flush=True)

for cap in (256, 384, 512):
    cfg, params, state = make({"rasterize_capacity": cap})
    ms = bench_fwd_bwd(cfg, params, state)
    # overflow stat at this capacity
    out = jax.jit(lambda p, a, c=cfg: render_splat(
        p, a, c2w, 500.0, 500.0, W / 2, H / 2, W, H, c))(
        params, state.alive)
    ov = int(out["raster_overflow"]) if "raster_overflow" in out else -1
    results[f"cap{cap}"] = {"fwd_bwd_ms": round(ms, 2), "max_overflow": ov}
    print(f"capacity={cap}: {ms:.1f} ms/frame, max_overflow={ov}",
          flush=True)

best_cap = min((256, 384, 512),
               key=lambda c: results[f"cap{c}"]["fwd_bwd_ms"])
for tps in (8, 16):
    for kc in (64, 128):
        rp._TILES_PER_STEP = tps
        rp._K_CHUNK = kc
        jax.clear_caches()
        cfg, params, state = make({"rasterize_capacity": best_cap})
        ms = bench_fwd_bwd(cfg, params, state)
        results[f"cap{best_cap}_tps{tps}_kc{kc}"] = {
            "fwd_bwd_ms": round(ms, 2)}
        print(f"tps={tps} kc={kc}: {ms:.1f} ms/frame", flush=True)
rp._TILES_PER_STEP = 8
rp._K_CHUNK = 128

out_path = Path("/root/repo/evidence/raster_sweep_r4.json")
out_path.write_text(json.dumps(results, indent=2))
print("wrote", out_path, flush=True)
