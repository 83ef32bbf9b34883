"""Gather overlap + lane-split physics (exact-path lever candidate).

Job 400/403 established: the XLA row-gather cliff keys on operand BYTES
(<=33.5 MB: ~169 M rows/s; >=42 MB: ~68-77), row-splits lose (cost is
per issued row), and the Pallas per-row-DMA gather crashes this
toolchain's TPU compiler. The fused ensemble's per-level tables are
84 MB (bf16, 80 lanes member-packed) / 42 MB (int8) -> slow mode.

Remaining candidate: LANE-split each table into sub-34 MB pieces and
issue the gathers with the same indices. Total issued rows double/triple
— this only wins if independent fast-mode gathers OVERLAP. Job 400's
probe of exactly this died on an axon quirk (closed-over device tables
are inlined into the compile payload -> HTTP 413), so here every table
is a jit ARGUMENT.

Also: int4-width rate (int8 dtype, 40 lanes = 21 MB — what a 4-bit
packed table of the 80-feature row would gather at), and whether two
independent SLOW gathers overlap (explains the in-context 89 vs
standalone 77 M rows/s).

Writes /root/repo/evidence/gather_overlap_r5.json progressively.
"""

import json
import time
import traceback
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

OUT = Path("/root/repo/evidence/gather_overlap_r5.json")
N_IDX = 1 << 21
ROWS = 1 << 19
ITERS = 5
results: dict = {"_meta": {
    "n_idx": N_IDX, "rows": ROWS,
    "note": "rates are SEMANTIC M lookups/s (a lane-split config issues "
            "k gathers per lookup); tables passed as jit args (job-400 "
            "413 lesson)",
}}

key = jax.random.PRNGKey(0)
idx = jax.random.randint(key, (N_IDX,), 0, ROWS, dtype=jnp.int32)


def bench(fn, args, tag):
    try:
        run = jax.jit(fn)
        for i in range(4):
            float(jnp.sum(run(jnp.int32(i), *args)))
        t0 = time.perf_counter()
        outs = [run(jnp.int32(4 + i), *args) for i in range(ITERS)]
        s = float(jnp.sum(jnp.stack([o.sum() for o in outs])))
        dt = (time.perf_counter() - t0) / ITERS
        assert np.isfinite(s)
        rate = N_IDX / dt / 1e6
        results[tag] = round(rate, 1)
        print(f"{tag:36s}: {rate:8.1f} M lookups/s  {dt*1e3:7.2f} ms", flush=True)
    except Exception as e:
        results[tag] = f"ERROR: {type(e).__name__}: {e}"[:300]
        print(f"{tag}: FAILED {e}", flush=True)
        traceback.print_exc()
    OUT.write_text(json.dumps(results, indent=2) + "\n")


def mk(lanes, dtype, seed=0):
    t = jax.random.normal(jax.random.PRNGKey(seed), (ROWS, lanes), jnp.float32)
    if dtype == jnp.int8:
        return (t * 10).astype(jnp.int8)
    return t.astype(dtype)


# -- anchors (this process's own warm numbers for the known modes) --------
t80i = mk(80, jnp.int8)          # 42 MB — the real fused int8 table
t40i = mk(40, jnp.int8)          # 21 MB — int4-width
t64i = mk(64, jnp.int8)          # 33.5 MB — at threshold
t80b = mk(80, jnp.bfloat16)      # 84 MB — the real fused bf16 table

bench(lambda i, t: jnp.sum(t[(idx + i) % ROWS].astype(jnp.float32), 0),
      (t80i,), "int8_l80_42MB")
bench(lambda i, t: jnp.sum(t[(idx + i) % ROWS].astype(jnp.float32), 0),
      (t64i,), "int8_l64_34MB")
bench(lambda i, t: jnp.sum(t[(idx + i) % ROWS].astype(jnp.float32), 0),
      (t40i,), "int8_l40_21MB")
bench(lambda i, t: jnp.sum(t[(idx + i) % ROWS].astype(jnp.float32), 0),
      (t80b,), "bf16_l80_84MB")

# -- lane-split with SAME indices: do k fast gathers overlap? -------------
t40a, t40b_ = mk(40, jnp.int8, 1), mk(40, jnp.int8, 2)


def split2_int8(i, ta, tb):
    ix = (idx + i) % ROWS
    return (jnp.sum(ta[ix].astype(jnp.float32), 0)
            + jnp.sum(tb[ix].astype(jnp.float32), 0))


bench(split2_int8, (t40a, t40b_), "int8_lanesplit2_2x21MB")

t20 = [mk(20, jnp.int8, 10 + k) for k in range(4)]


def split4_int8(i, ta, tb, tc, td):
    ix = (idx + i) % ROWS
    return sum(jnp.sum(t[ix].astype(jnp.float32), 0) for t in (ta, tb, tc, td))


bench(split4_int8, tuple(t20), "int8_lanesplit4_4x10MB")

b20 = [mk(20, jnp.bfloat16, 20 + k) for k in range(4)]


def split4_bf16(i, ta, tb, tc, td):
    ix = (idx + i) % ROWS
    return sum(jnp.sum(t[ix].astype(jnp.float32), 0) for t in (ta, tb, tc, td))


bench(split4_bf16, tuple(b20), "bf16_lanesplit4_4x21MB")

# -- different-index overlap (two levels' gathers in one program) ---------
half = N_IDX // 2


def two_tables(i, ta, tb):
    ia = (idx[:half] + i) % ROWS
    ib = (idx[half:] + 3 * i) % ROWS
    return (jnp.sum(ta[ia].astype(jnp.float32), 0)
            + jnp.sum(tb[ib].astype(jnp.float32), 0))


# 2x 1M lookups from two 42 MB tables = semantic 2M rows total
t80i2 = mk(80, jnp.int8, 3)
bench(two_tables, (t80i2, mk(80, jnp.int8, 4)), "int8_2tables_halfidx_42MB")

# fast-mode pair: two 21 MB tables, half the indices each
bench(two_tables, (t40a, t40b_), "int8_2tables_halfidx_21MB")

print("JOB_409_DONE", flush=True)
