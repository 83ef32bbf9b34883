"""Pallas DMA-gather probe + gather-cliff refinement (exact-wall physics).

Job 400 located the XLA row-gather cliff between 33.5 MB (169M rows/s)
and 67 MB (73-77M rows/s) of operand bytes — dtype/lanes/rows all
irrelevant, splits lose (rate is per issued row). The remaining untried
lever for the EXACT bf16 path is a hand-rolled Pallas gather: per-row
HBM->VMEM async copies with a deep outstanding-DMA pipeline. If the XLA
slow path is latency-bound with a shallow queue, more outstanding copies
could beat 13 ns/row; if it is scalar-issue-bound, this kernel will lose
(its per-row issue is a fori_loop body). Either result closes the
question for evidence/exact_wall_r5.json.

Also: threshold refinement (is the cliff at ~34 or ~50 or ~64 MB?) and an
overlap test (do two independent gathers pipeline?).
"""

import json
import time
import traceback
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

OUT = Path("/root/repo/evidence/pallas_gather_probe_r5.json")
N_IDX = 1 << 21
ITERS = 5
results: dict = {"_meta": {"n_idx": N_IDX}}


def bench(run, tag, n_rows=N_IDX):
    try:
        for i in range(4):
            float(jnp.sum(run(i)))
        t0 = time.perf_counter()
        outs = [run(4 + i) for i in range(ITERS)]
        s = float(jnp.sum(jnp.stack([o.sum() for o in outs])))
        dt = (time.perf_counter() - t0) / ITERS
        assert np.isfinite(s)
        rate = n_rows / dt / 1e6
        results[tag] = round(rate, 1)
        print(f"{tag:34s}: {rate:8.1f} M rows/s   {dt*1e3:7.2f} ms",
              flush=True)
    except Exception as e:
        results[tag] = f"ERROR: {type(e).__name__}: {e}"[:300]
        print(f"{tag}: FAILED {e}", flush=True)
        traceback.print_exc()
    OUT.write_text(json.dumps(results, indent=2) + "\n")


key = jax.random.PRNGKey(0)
idx = jax.random.randint(key, (N_IDX,), 0, 1 << 19, dtype=jnp.int32)


# ---- 1. cliff threshold refinement (all 128 lanes) ----------------------
def plain(rows, lanes, dtype, tag):
    table = jax.random.normal(key, (rows, lanes), jnp.float32).astype(dtype)

    @jax.jit
    def run(i, table=table):
        ix = (idx + i) % rows
        return jnp.sum(table[ix].astype(jnp.float32), axis=0)

    bench(run, tag)


plain(1 << 16, 128, jnp.float32, "f32_r16_l128_34MB")
plain(1 << 17, 160, jnp.bfloat16, "bf16_r17_l160_42MB")
plain(1 << 17, 192, jnp.bfloat16, "bf16_r17_l192_50MB")
plain(3 << 16, 128, jnp.bfloat16, "bf16_r3x16_l128_50MB")


# ---- 2. overlap: two independent slow gathers in one program ------------
tab_a = jax.random.normal(key, (1 << 19, 128), jnp.float32).astype(jnp.bfloat16)
tab_b = jax.random.normal(jax.random.PRNGKey(1), (1 << 19, 128),
                          jnp.float32).astype(jnp.bfloat16)
half = N_IDX // 2


@jax.jit
def two_gathers(i):
    ia = (idx[:half] + i) % (1 << 19)
    ib = (idx[half:] + 3 * i) % (1 << 19)
    return jnp.sum(tab_a[ia].astype(jnp.float32), axis=0) + jnp.sum(
        tab_b[ib].astype(jnp.float32), axis=0
    )


bench(two_gathers, "two_indep_gathers_2x1M")  # rate in semantic rows (2M total)


# ---- 3. pallas DMA gather ----------------------------------------------
def pallas_gather(table, ix, block=2048, outstanding=16):
    n = ix.shape[0]
    lanes = table.shape[1]
    D = outstanding

    def kernel(idx_ref, table_ref, out_ref, sems):
        def start(j):
            pltpu.make_async_copy(
                table_ref.at[idx_ref[j]], out_ref.at[j], sems.at[j % D]
            ).start()

        def wait(j):
            pltpu.make_async_copy(
                table_ref.at[idx_ref[j]], out_ref.at[j], sems.at[j % D]
            ).wait()

        jax.lax.fori_loop(0, D, lambda j, c: (start(j), c)[1], 0)

        def body(j, c):
            wait(j - D)
            start(j)
            return c

        jax.lax.fori_loop(D, block, body, 0)
        jax.lax.fori_loop(block - D, block, lambda j, c: (wait(j), c)[1], 0)

    grid = (n // block,)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((block,), lambda i: (i,), memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec(
            (block, lanes), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((n, lanes), table.dtype),
        scratch_shapes=[pltpu.SemaphoreType.DMA((D,))],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(ix, table)


for block, d in ((2048, 16), (4096, 64)):
    @jax.jit
    def run_pg(i, block=block, d=d):
        ix = (idx + i) % (1 << 19)
        return jnp.sum(
            pallas_gather(tab_a, ix, block=block, outstanding=d).astype(
                jnp.float32
            ),
            axis=0,
        )

    bench(run_pg, f"pallas_gather_b{block}_d{d}")

print("JOB_403_DONE", flush=True)
