"""Finer profiling: pdf call, packed lookup per field, member MLPs."""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

from uncertainty_nerf_gs_tpu.ops.encodings import (
    hash_grid_resolutions,
    packed_cell_lookup,
)
from uncertainty_nerf_gs_tpu.ops.sampling import RayBundle, sample_pdf, sample_uniform

CHUNK = 1 << 13
ITERS = 5
M, F = 5, 2


def bench(fn, label, *args):
    float(jnp.sum(fn(0, *args)))
    float(jnp.sum(fn(1, *args)))
    t0 = time.perf_counter()
    outs = [fn(2 + i, *args) for i in range(ITERS)]
    s = float(jnp.sum(jnp.stack([jnp.sum(o) for o in outs])))
    dt = (time.perf_counter() - t0) / ITERS
    assert np.isfinite(s)
    print(f"{label:44s}: {dt*1e3:8.1f} ms", flush=True)
    return dt


def main():
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

    @jax.jit
    def one_pdf(i, rb_in):
        b = rb_in._replace(origins=rb_in.origins + 1e-6 * i)
        rs = sample_uniform(b, 256, key=None)
        w = jnp.exp(-jnp.abs(rs.positions[..., 0]))
        rs2 = sample_pdf(b, rs.spacing_edges, w, 96, key=None)
        return rs2.spacing_edges.sum()

    bench(one_pdf, "uniform256 + one pdf->96 (edges only)", rb)

    @jax.jit
    def uniform_only(i, rb_in):
        b = rb_in._replace(origins=rb_in.origins + 1e-6 * i)
        rs = sample_uniform(b, 256, key=None)
        return rs.positions.sum()

    bench(uniform_only, "uniform256 + positions", rb)

    # packed lookups per field at real shapes
    gen = jax.jit(
        lambda k, shape=None, dt=None: (jax.random.normal(k, shape, jnp.float32) * 1e-2).astype(dt),
        static_argnames=("shape", "dt"),
    )
    main_res = hash_grid_resolutions(16, 16, 2048)
    p_res = hash_grid_resolutions(5, 16, 128)
    tbl_main = gen(jax.random.PRNGKey(1), shape=(16, 2**19, 128), dt=jnp.bfloat16)
    tbl_p = gen(jax.random.PRNGKey(2), shape=(5, 2**17, 128), dt=jnp.bfloat16)

    @jax.jit
    def lk_main(i, tbl):
        k = jax.random.fold_in(jax.random.PRNGKey(0), i)
        pos = jax.random.uniform(k, (CHUNK * 48, 3))
        return packed_cell_lookup(tbl, pos, main_res, 2**19, M, F).sum()

    bench(lk_main, "packed lookup main (48 smp, 16 lvl)", tbl_main)

    @jax.jit
    def lk_p1(i, tbl):
        k = jax.random.fold_in(jax.random.PRNGKey(1), i)
        pos = jax.random.uniform(k, (CHUNK * 256, 3))
        return packed_cell_lookup(tbl, pos, p_res, 2**17, M, F).sum()

    bench(lk_p1, "packed lookup prop1 (256 smp, 5 lvl)", tbl_p)

    @jax.jit
    def lk_p2(i, tbl):
        k = jax.random.fold_in(jax.random.PRNGKey(2), i)
        pos = jax.random.uniform(k, (CHUNK * 96, 3))
        return packed_cell_lookup(tbl, pos, p_res, 2**17, M, F).sum()

    bench(lk_p2, "packed lookup prop2 (96 smp, 5 lvl)", tbl_p)

    # gather-only (no trilerp select) at prop1 shapes, to isolate select cost
    @jax.jit
    def gather_only(i, tbl):
        k = jax.random.fold_in(jax.random.PRNGKey(3), i)
        n = CHUNK * 256
        total = jnp.float32(0.0)
        for lvl in range(5):
            idx = jax.random.randint(jax.random.fold_in(k, lvl), (n,), 0, 2**17)
            total += tbl[lvl][idx].astype(jnp.float32).sum()
        return total

    bench(gather_only, "gather-only prop1 shapes (5x2.1M rows)", tbl_p)


if __name__ == "__main__":
    main()
