"""Profile the fused ensemble render's stages at bench shapes."""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

from uncertainty_nerf_gs_tpu.models.nerfacto import NerfactoConfig, NerfactoModel
from uncertainty_nerf_gs_tpu.ops import raymarch
from uncertainty_nerf_gs_tpu.ops.sampling import RayBundle, sample_pdf, sample_uniform
from uncertainty_nerf_gs_tpu.parallel.ensemble_fused import (
    build_fused_ensemble_render,
    pack_ensemble_tables,
)
from uncertainty_nerf_gs_tpu.parallel.ensemble_parallel import init_ensemble_params

CHUNK = 1 << 13
ITERS = 5


def bench(fn, label, *args):
    float(jnp.sum(fn(0, *args)))
    float(jnp.sum(fn(1, *args)))
    t0 = time.perf_counter()
    outs = [fn(2 + i, *args) for i in range(ITERS)]
    s = float(jnp.sum(jnp.stack([jnp.sum(o) for o in outs])))
    dt = (time.perf_counter() - t0) / ITERS
    assert np.isfinite(s)
    print(f"{label:40s}: {dt*1e3:8.1f} ms", flush=True)
    return dt


def main():
    config = NerfactoConfig(
        num_images=8, uncertainty_channels=1, near_plane=0.5, far_plane=6.0,
        background_color="white", use_appearance_embedding=False,
        proposal_field_type="hash",
    )
    model = NerfactoModel(config)
    stacked = init_ensemble_params(model, 5)
    packed = pack_ensemble_tables(model, stacked, table_dtype=jnp.bfloat16)
    render = build_fused_ensemble_render(model)

    rng = np.random.default_rng(0)
    d = rng.normal(size=(CHUNK, 3))
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    rb = RayBundle(
        origins=jnp.asarray(rng.uniform(-0.1, 0.1, (CHUNK, 3)), jnp.float32),
        directions=jnp.asarray(d, jnp.float32),
        nears=jnp.full((CHUNK,), 0.5),
        fars=jnp.full((CHUNK,), 6.0),
        camera_indices=jnp.zeros((CHUNK,), jnp.int32),
    )

    def run_full(i):
        b = rb._replace(origins=rb.origins + 1e-6 * i)
        return render(stacked, packed, b)["rgb"]

    bench(run_full, "full fused render")

    # sampling-only: uniform -> pdf -> pdf with fake weights
    @jax.jit
    def run_sampling(i, rb_in):
        b = rb_in._replace(origins=rb_in.origins + 1e-6 * i)
        rs = sample_uniform(b, 256, key=None)
        w = jnp.exp(-jnp.abs(rs.positions[..., 0]))
        rs2 = sample_pdf(b, rs.spacing_edges, w, 96, key=None)
        w2 = jnp.exp(-jnp.abs(rs2.positions[..., 0]))
        rs3 = sample_pdf(b, rs2.spacing_edges, w2, 48, key=None)
        return rs3.positions.sum()

    bench(run_sampling, "sampling only (uniform+2 pdf)", rb)

    # median depth for 5 members
    @jax.jit
    def run_median(i, w, s):
        return raymarch.render_median_depth(w + 1e-6 * i, s).sum()

    w = jnp.asarray(rng.uniform(0, 0.1, (5, CHUNK, 48)), jnp.float32)
    s = jnp.asarray(rng.uniform(0.5, 6.0, (5, CHUNK, 48)), jnp.float32)
    s = jnp.sort(s, axis=-1)
    bench(run_median, "median depth x5 members", w, s)

    # interp/tail probe: weights+rgb tail only
    @jax.jit
    def run_tail(i, w, s):
        ww = w + 1e-6 * i
        acc = raymarch.render_accumulation(ww)
        d1 = raymarch.render_expected_depth(ww, s)
        dv = raymarch.depth_variance(ww, s, d1)
        return acc.sum() + dv.sum()

    bench(run_tail, "expected depth+var tail x5", w, s)


if __name__ == "__main__":
    main()
