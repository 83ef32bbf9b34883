"""Microbenchmark: XLA dynamic row-gather cost vs row width / dtype on TPU.

Question driving the round-2 perf design (VERDICT item 1): the ensemble hash
lookup is bound by row gathers at ~125M rows/s with (rows, 128) f32 tables.
If the per-row cost is issue-rate bound (not bandwidth bound), widening rows
to hold all M ensemble members' features (rows, M*128) serves 5 members with
ONE gather — ~5x. This measures rows/s and GB/s across widths and dtypes.

Timing hygiene (axon): distinct inputs per iter + host materialization.
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

N_IDX = 1 << 22  # 4M gathered rows, representative of a bench launch
ROWS = 8192
ITERS = 5


def bench(fn, *args) -> float:
    # warmup
    float(jnp.sum(fn(0, *args)))
    float(jnp.sum(fn(1, *args)))
    t0 = time.perf_counter()
    outs = [fn(2 + i, *args) for i in range(ITERS)]
    s = float(jnp.sum(jnp.stack([o.sum() for o in outs])))
    dt = time.perf_counter() - t0
    assert np.isfinite(s)
    return dt / ITERS


def main() -> None:
    key = jax.random.PRNGKey(0)
    idx = jax.random.randint(key, (N_IDX,), 0, ROWS, dtype=jnp.int32)

    results = []

    for width in (128, 256, 512, 640, 1024):
        for dtype in (jnp.float32, jnp.bfloat16):
            table = jax.random.normal(key, (ROWS, width), dtype)

            @jax.jit
            def run(i, table=table, idx=idx):
                # distinct per-iter indices to defeat caching
                ix = (idx + i) % ROWS
                return jnp.sum(table[ix], axis=0)  # reduce to keep output tiny

            dt = bench(run)
            rows_per_s = N_IDX / dt
            bpr = width * jnp.dtype(dtype).itemsize
            gbs = rows_per_s * bpr / 1e9
            results.append((f"axis0 w={width} {jnp.dtype(dtype).name}", rows_per_s / 1e6, gbs))
            print(f"axis0 gather w={width:5d} {jnp.dtype(dtype).name:8s}: "
                  f"{rows_per_s/1e6:8.1f}M rows/s  {gbs:7.1f} GB/s  {dt*1e3:7.2f} ms")

    # one-hot matmul alternative for small tables (dense levels): idx -> onehot @ table
    for rows_small in (2048, 8192):
        table = jax.random.normal(key, (rows_small, 128), jnp.bfloat16)
        idx_s = idx % rows_small

        @jax.jit
        def run_mm(i, table=table, idx=idx_s):
            ix = (idx + i) % rows_small
            # blocked one-hot matmul: (chunk, rows) @ (rows, 128)
            def body(carry, ixc):
                oh = jax.nn.one_hot(ixc, rows_small, dtype=jnp.bfloat16)
                return carry + jnp.sum(oh @ table, axis=0), None

            chunks = ix.reshape(64, -1)
            out, _ = jax.lax.scan(body, jnp.zeros((128,), jnp.float32), chunks)
            return out

        dt = bench(run_mm)
        print(f"onehot-matmul rows={rows_small:5d} bf16    : {N_IDX/dt/1e6:8.1f}M rows/s  {dt*1e3:7.2f} ms")

    # take_along_axis lane gather (axis -1) for comparison: gather scalars
    table_t = jax.random.normal(key, (128, ROWS), jnp.float32)

    @jax.jit
    def run_lane(i, table=table_t, idx=idx):
        ix = ((idx + i) % ROWS).reshape(1, -1)
        vals = jnp.take_along_axis(table[:1], ix, axis=-1)
        return jnp.sum(vals, axis=-1)

    dt = bench(run_lane)
    print(f"lane scalar-gather f32          : {N_IDX/dt/1e6:8.1f}M elems/s  {dt*1e3:7.2f} ms")


if __name__ == "__main__":
    main()
