"""Prototype bench: cell-major hash-grid layout for the ensemble render.

Design under test (round-2 perf plan, VERDICT item 1):
  * cell-major tables: each table row holds ALL 8 corner feature vectors of
    one grid cell -> ONE row gather per (sample, level) instead of 8 corner
    gathers (trilinear weights then reduce over the in-row corner axis).
  * member packing: the M ensemble members' features are lane-stacked in the
    same row (8 corners x M members x F feats = 80 f32 <= 128 lanes), so the
    single gather serves the whole ensemble.
  * shared proposal chain: members share sample positions (mean proposal
    density), so gather indices are identical across members.

Measures the full encode+MLP forward at bench shapes (4096 rays; 256/96/48
samples; props 5 levels 2^17; main 16 levels 2^19) vs the round-1 path.

NOTE: tables are jit ARGUMENTS (donated closure constants would be baked
into the remote-compile payload — 4.3 GB — and stall compilation).
"""

from __future__ import annotations

import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from uncertainty_nerf_gs_tpu.ops.encodings import (
    _hash_corner_indices,
    hash_grid_resolutions,
)

M = 5  # ensemble members
F = 2  # features per level
RAYS = 4096
ITERS = 5


def cell_indices(positions, res, table_size):
    """(n,3) in [0,1] -> (cell_row_idx, trilerp_weights (n,8))."""
    scaled = positions * res
    base = jnp.floor(jnp.clip(scaled, 0, res - 1e-6)).astype(jnp.int32)
    base = jnp.minimum(base, res - 1)
    frac = scaled - base.astype(scaled.dtype)
    if res**3 <= table_size:
        idx = base[:, 0] + res * (base[:, 1] + res * base[:, 2])
    else:
        idx = _hash_corner_indices(base, jnp.int32(res), table_size)
    wx = jnp.stack([1 - frac[:, 0], frac[:, 0]], 1)  # (n,2)
    wy = jnp.stack([1 - frac[:, 1], frac[:, 1]], 1)
    wz = jnp.stack([1 - frac[:, 2], frac[:, 2]], 1)
    w = (wx[:, :, None, None] * wy[:, None, :, None] * wz[:, None, None, :]).reshape(-1, 8)
    return idx, w


def packed_cell_lookup(table, positions, resolutions, table_size):
    """table: (L, table_size, 128) rows with 8*M*F=80 used lanes.
    Returns (M, n, L*F)."""
    n = positions.shape[0]
    outs = []
    for lvl, res in enumerate(resolutions):
        idx, w = cell_indices(positions, int(res), table_size)
        rows = table[lvl][idx]  # (n, 128) ONE gather serves all members
        corners = rows[:, : 8 * M * F].reshape(n, 8, M, F)
        feat = jnp.einsum("nc,ncmf->mnf", w.astype(rows.dtype), corners)
        outs.append(feat)
    return jnp.concatenate(outs, axis=-1)


def bench(fn, label, *args):
    float(jnp.sum(fn(0, *args)))
    float(jnp.sum(fn(1, *args)))
    t0 = time.perf_counter()
    outs = [fn(2 + i, *args) for i in range(ITERS)]
    s = float(jnp.sum(jnp.stack([o.sum() for o in outs])))
    dt = (time.perf_counter() - t0) / ITERS
    assert np.isfinite(s)
    print(f"{label:45s}: {dt*1e3:8.1f} ms  -> {RAYS/dt:9.0f} rays/s", flush=True)
    return dt


def main():
    key = jax.random.PRNGKey(0)
    main_res = hash_grid_resolutions(16, 16, 2048)
    p1_res = hash_grid_resolutions(5, 16, 128)
    p2_res = hash_grid_resolutions(5, 16, 256)
    T_MAIN, T_PROP = 2**19, 2**17

    for dtype in (jnp.float32, jnp.bfloat16):
        name = jnp.dtype(dtype).name
        gen = jax.jit(
            lambda k, shape=None, dt=None: (jax.random.normal(k, shape, jnp.float32) * 1e-2).astype(dt),
            static_argnames=("shape", "dt"),
        )
        tbl_main = gen(jax.random.PRNGKey(10), shape=(16, T_MAIN, 128), dt=dtype)
        tbl_p1 = gen(jax.random.PRNGKey(11), shape=(5, T_PROP, 128), dt=dtype)
        tbl_p2 = gen(jax.random.PRNGKey(12), shape=(5, T_PROP, 128), dt=dtype)
        w_in = jax.device_put(np.random.default_rng(3).standard_normal((M, 32, 64), np.float32) * 0.1)
        w_hid = jax.device_put(np.random.default_rng(4).standard_normal((M, 64, 64), np.float32) * 0.1)
        w_out = jax.device_put(np.random.default_rng(5).standard_normal((M, 64, 16), np.float32) * 0.1)
        wp = jax.device_put(np.random.default_rng(6).standard_normal((M, 10, 16), np.float32) * 0.1)
        wp2 = jax.device_put(np.random.default_rng(7).standard_normal((M, 16, 1), np.float32) * 0.1)

        @jax.jit
        def fwd(i, tbl_main, tbl_p1, tbl_p2, w_in, w_hid, w_out, wp, wp2):
            k = jax.random.fold_in(key, i)
            n1 = RAYS * 256
            pos1 = jax.random.uniform(k, (n1, 3))
            f1 = packed_cell_lookup(tbl_p1, pos1, p1_res, T_PROP)
            d1 = jnp.einsum("mnf,mfh->mnh", f1.astype(jnp.float32), wp)
            d1 = jnp.einsum("mnh,mho->mno", jax.nn.relu(d1), wp2)
            d1m = jnp.mean(d1, 0)
            n2 = RAYS * 96
            pos2 = jax.random.uniform(jax.random.fold_in(k, 1), (n2, 3))
            f2 = packed_cell_lookup(tbl_p2, pos2, p2_res, T_PROP)
            d2 = jnp.einsum("mnf,mfh->mnh", f2.astype(jnp.float32), wp)
            d2 = jnp.einsum("mnh,mho->mno", jax.nn.relu(d2), wp2)
            d2m = jnp.mean(d2, 0)
            n3 = RAYS * 48
            pos3 = jax.random.uniform(jax.random.fold_in(k, 2), (n3, 3))
            f3 = packed_cell_lookup(tbl_main, pos3, main_res, T_MAIN)
            h = jnp.einsum("mnf,mfh->mnh", f3.astype(jnp.float32), w_in)
            h = jnp.einsum("mnh,mhk->mnk", jax.nn.relu(h), w_hid)
            out = jnp.einsum("mnh,mhk->mnk", jax.nn.relu(h), w_out)
            return out.sum(-1).sum(-1) + d1m.sum() + d2m.sum()

        bench(fwd, f"cell-major packed M=5 {name}",
              tbl_main, tbl_p1, tbl_p2, w_in, w_hid, w_out, wp, wp2)

    # reference comparison: round-1 per-member corner gathers, main field only
    from uncertainty_nerf_gs_tpu.ops.encodings import hash_encoding_lookup

    tbl_corner = jax.jit(
        lambda k: jax.random.normal(k, (16, F, T_MAIN)) * 1e-2
    )(jax.random.PRNGKey(13))

    @jax.jit
    def fwd_corner(i, tbl_corner):
        k = jax.random.fold_in(key, i)
        n3 = RAYS * 48
        pos3 = jax.random.uniform(k, (n3, 3))

        def one_member(_):
            return hash_encoding_lookup(tbl_corner, pos3, main_res, F).sum()

        return jax.lax.map(one_member, jnp.arange(M).astype(jnp.float32))

    bench(fwd_corner, "round-1 corner per-member x5 (main only)", tbl_corner)


if __name__ == "__main__":
    main()
