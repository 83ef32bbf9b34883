"""Gather-rate physics for the exact-path wall (VERDICT r5 next-round #3).

The r3 study established: bf16 (2^19,128) row gathers collapse to ~73M
rows/s while <=2^17-row operands run 150-220M and int8 (2^19,128) runs
202M. Fold (same bytes, fewer rows) stays slow (r4 job 324). Open
question that decides the one remaining EXACT lever: does the lowering
cliff key on operand BYTES or ROWS?

  * byte-keyed  -> f32 (2^18,128) [134 MB] slow, bf16 (2^18,128) [67 MB]
    fast -> ROW-SPLIT (two (2^18,128) gathers + select, exact math) runs
    the big main-grid gather at ~2x effective rate.
  * row-keyed   -> bf16 (2^18,128) fast but f32 (2^18,128) also fast,
    and int8's speed is dtype-specific; row-split still works.

Measures standalone rates for the operand grid + the row-split2/4
emulations. Writes evidence/gather_physics_r5.json progressively.
"""

import json
import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

OUT = Path("/root/repo/evidence/gather_physics_r5.json")
N_IDX = 1 << 21
ITERS = 5
results: dict = {"_meta": {
    "n_idx": N_IDX,
    "note": "standalone XLA row-gather rates, one v5e chip via axon; "
            "rate = semantic rows/s (row-splitN fetches N_IDX rows per "
            "sub-table but serves N_IDX semantic lookups)",
}}


def bench(fn) -> float:
    for i in range(4):
        float(jnp.sum(fn(i)))
    t0 = time.perf_counter()
    outs = [fn(4 + i) for i in range(ITERS)]
    s = float(jnp.sum(jnp.stack([o.sum() for o in outs])))
    dt = time.perf_counter() - t0
    assert np.isfinite(s)
    return dt / ITERS


def save(name, dt):
    rate = N_IDX / dt / 1e6
    results[name] = round(rate, 1)
    print(f"{name:34s}: {rate:8.1f} M rows/s   {dt*1e3:7.2f} ms", flush=True)
    OUT.write_text(json.dumps(results, indent=2) + "\n")


key = jax.random.PRNGKey(0)
idx = jax.random.randint(key, (N_IDX,), 0, 1 << 19, dtype=jnp.int32)


def plain(rows, lanes, dtype, tag, discard_first=False):
    table = jax.random.normal(key, (rows, lanes), jnp.float32).astype(dtype)

    @jax.jit
    def run(i, table=table):
        ix = (idx + i) % rows
        return jnp.sum(table[ix].astype(jnp.float32), axis=0)

    if discard_first:
        bench(run)  # first measurement after worker restart absorbs tunnel warm-up
    save(tag, bench(run))


# tunnel warm-up absorber + fast-rate anchor
plain(1 << 17, 128, jnp.bfloat16, "bf16_r17_l128", discard_first=True)
plain(1 << 18, 128, jnp.bfloat16, "bf16_r18_l128")
plain(1 << 19, 128, jnp.bfloat16, "bf16_r19_l128")
plain(1 << 17, 128, jnp.float32, "f32_r17_l128")
plain(1 << 18, 128, jnp.float32, "f32_r18_l128")  # 134 MB at 2^18 rows
plain(1 << 19, 128, jnp.int8, "int8_r19_l128")
plain(1 << 19, 64, jnp.bfloat16, "bf16_r19_l64")
plain(1 << 18, 256, jnp.bfloat16, "bf16_r18_l256")  # fold2 shape, 134 MB


def rowsplit(n_split, tag):
    """Exact 2^19-row gather as n_split gathers from (2^19/n, 128) tables."""
    rows = (1 << 19) // n_split
    tables = [
        jax.random.normal(jax.random.PRNGKey(s), (rows, 128), jnp.float32)
        .astype(jnp.bfloat16)
        for s in range(n_split)
    ]

    @jax.jit
    def run(i, tables=tuple(tables)):
        ix = (idx + i) % (1 << 19)
        sub = ix % rows
        which = ix // rows
        acc = jnp.zeros((N_IDX, 128), jnp.float32)
        for s, t in enumerate(tables):
            part = t[sub].astype(jnp.float32)
            acc = acc + jnp.where((which == s)[:, None], part, 0.0)
        return jnp.sum(acc, axis=0)

    save(tag, bench(run))


rowsplit(2, "bf16_rowsplit2")
rowsplit(4, "bf16_rowsplit4")

# rowsplit with the select fused differently: mask BEFORE the f32 cast
def rowsplit_mask_bf16(n_split, tag):
    rows = (1 << 19) // n_split
    tables = [
        jax.random.normal(jax.random.PRNGKey(s), (rows, 128), jnp.float32)
        .astype(jnp.bfloat16)
        for s in range(n_split)
    ]

    @jax.jit
    def run(i, tables=tuple(tables)):
        ix = (idx + i) % (1 << 19)
        sub = ix % rows
        which = ix // rows
        acc = jnp.zeros((N_IDX, 128), jnp.bfloat16)
        for s, t in enumerate(tables):
            acc = acc + jnp.where((which == s)[:, None], t[sub],
                                  jnp.bfloat16(0))
        return jnp.sum(acc.astype(jnp.float32), axis=0)

    save(tag, bench(run))


rowsplit_mask_bf16(2, "bf16_rowsplit2_maskbf16")

print("JOB_400_DONE", flush=True)
