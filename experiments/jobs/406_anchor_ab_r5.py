"""Raster bench-anchor A/B: r5 refactor vs r4 snapshot (+ decomposition).

Job 402 measured the through-projection fwd+bwd anchor (bench.py's exact
splat metric) at 272.6 ms, vs 51.1 ms in BENCH_r04. Two hypotheses:
  (a) the select_and_pack refactor changed the compiled program;
  (b) worker-state contamination (job 400 had just held ~1.5 GB of gather
      tables; r4's number came from a fresh driver process).
This job A/Bs the EXACT bench.py fwd_bwd with (1) current code, (2) the
pre-refactor rasterize (git 7966acb snapshot injected into sys.modules),
(3) current code again, after jax.clear_caches() + gc each time. It also
decomposes: projection+SH-only fwd+bwd (grads wrt 3D means).

Writes evidence/anchor_ab_r5.json progressively.
"""

import gc
import importlib.util
import json
import sys
import time
import traceback
from pathlib import Path

sys.path.insert(0, "/root/repo")
for m in [k for k in sys.modules if k.startswith("uncertainty_nerf_gs_tpu")]:
    del sys.modules[m]

import jax
import jax.numpy as jnp
import numpy as np

OUT = Path("/root/repo/evidence/anchor_ab_r5.json")
results: dict = {"_meta": {
    "anchor": "bench.py fwd_bwd: render_splat grads wrt 3D means, 65k "
              "gaussians 640x480 cap384, pallas backend (auto)",
    "r4_benched": 51.09, "job402_measured": 272.57,
}}
ITERS = 5
SNAP = "/root/repo/experiments/jobs/_rasterize_r4_snapshot.py"


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


def purge():
    for m in [k for k in sys.modules
              if k.startswith("uncertainty_nerf_gs_tpu")]:
        del sys.modules[m]
    jax.clear_caches()
    gc.collect()


def measure_anchor(tag, inject_snapshot=False):
    purge()
    if inject_snapshot:
        import uncertainty_nerf_gs_tpu.ops as ops_pkg

        spec = importlib.util.spec_from_file_location(
            "uncertainty_nerf_gs_tpu.ops.rasterize", SNAP
        )
        mod = importlib.util.module_from_spec(spec)
        sys.modules["uncertainty_nerf_gs_tpu.ops.rasterize"] = mod
        spec.loader.exec_module(mod)
        ops_pkg.rasterize = mod

    from uncertainty_nerf_gs_tpu.models.splatfacto import (
        SplatfactoConfig, init_gaussians, render_splat,
    )

    cfg = SplatfactoConfig(
        capacity=1 << 16, num_random=65_000, random_scale=1.5,
        rasterize_capacity=384,
    )
    params, state = init_gaussians(jax.random.PRNGKey(0), cfg)
    c2w = jnp.asarray([[1.0, 0, 0, 0], [0, 1.0, 0, 0], [0, 0, 1.0, 4.0]],
                      jnp.float32)
    W, H = 640, 480

    @jax.jit
    def fwd_bwd(means):
        def loss(m):
            p = dict(params, means=m)
            out = render_splat(p, state.alive, c2w, 500.0, 500.0, W / 2,
                               H / 2, W, H, cfg)
            return jnp.mean(out["rgb"]), out["rgb"]

        (l, rgb), g = jax.value_and_grad(loss, has_aux=True)(means)
        return l + jnp.sum(g[:, 0]) + rgb.sum()

    bench(lambda i: fwd_bwd(params["means"] + 1e-6 * i), tag)


measure_anchor("anchor_current_1")
measure_anchor("anchor_r4_snapshot", inject_snapshot=True)
measure_anchor("anchor_current_2")

# ---- decomposition: projection+SH only, grads wrt 3D means --------------
purge()
from uncertainty_nerf_gs_tpu.models.splatfacto import (  # noqa: E402
    SplatfactoConfig, init_gaussians, opengl_to_viewmat,
)
from uncertainty_nerf_gs_tpu.ops.gaussians import project_gaussians  # noqa
from uncertainty_nerf_gs_tpu.ops import sh as sh_ops  # noqa: E402

cfg = SplatfactoConfig(capacity=1 << 16, num_random=65_000, random_scale=1.5,
                       rasterize_capacity=384)
params, state = init_gaussians(jax.random.PRNGKey(0), cfg)
c2w = jnp.asarray([[1.0, 0, 0, 0], [0, 1.0, 0, 0], [0, 0, 1.0, 4.0]],
                  jnp.float32)
W, H = 640, 480


@jax.jit
def proj_fwd_bwd(means):
    def loss(m):
        viewmat = opengl_to_viewmat(c2w)
        proj = project_gaussians(
            m, jnp.exp(params["scales"]), params["quats"], viewmat,
            500.0, 500.0, W / 2, H / 2, W, H, near=cfg.near_plane,
        )
        coeffs = jnp.concatenate(
            [params["features_dc"][:, None, :], params["features_rest"]],
            axis=1,
        )
        rgbs = sh_ops.eval_sh_colors(
            cfg.sh_degree, coeffs, m - c2w[:3, 3][None], cfg.sh_degree
        )
        return (jnp.sum(proj.means2d) + jnp.sum(proj.conics)
                + jnp.sum(proj.depths) + jnp.sum(rgbs))

    l, g = jax.value_and_grad(loss)(means)
    return l + jnp.sum(g[:, 0])


bench(lambda i: proj_fwd_bwd(params["means"] + 1e-6 * i), "proj_sh_only_fwd_bwd")
print("JOB_406_DONE", flush=True)
