"""bf16 narrow-lane gather bracketing (ROUND6_PLAN #4 / exact-path wall).

Open question from evidence/exact_wall_r5.json: the bf16 84 MB member-
packed main levels need >= 3 lane parts to get under XLA's ~34 MB gather
cliff, and the one 3-way in-context attempt HALVED throughput, while a
standalone 4x21 MB bf16 split measured a pathological 21 M/s. Is that
pathology lane-WIDTH dependent (a lowering mode for narrow bf16 minor
dims) or intrinsic to k>=3 splits? This brackets it:

  A. standalone bf16 gather rate vs lane width (8..64) at 2^19 rows —
     operand 8.4..67 MB; int8 l32 control. First row is a throwaway
     (tunnel warm-up absorbs the first standalone microbench — r5 lesson).
  B. same-index multi-gather candidates: bf16 (32,32,16) 3-way split of
     the real 80-lane row, and 2x40-lane (do two SLOW gathers overlap?).
  C. only if B's 3-way semantic rate beats the 84 MB slow mode by > 15%:
     the real fused 5-member render with max_parts=3 (monkeypatched) —
     the in-context verdict.

Writes /root/repo/evidence/bf16_lane_sweep_r5.json progressively.
"""

import sys as _sys
for _k in [k for k in _sys.modules if k.startswith("uncertainty_nerf_gs_tpu")]:
    del _sys.modules[_k]

import json
import time
import traceback
from pathlib import Path

import sys
sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

OUT = Path("/root/repo/evidence/bf16_lane_sweep_r5.json")
N_IDX = 1 << 21
ROWS = 1 << 19
ITERS = 5
results: dict = {"_meta": {
    "n_idx": N_IDX, "rows": ROWS,
    "note": "rates are SEMANTIC M lookups/s; tables passed as jit args; "
            "first row (warmup_discard) absorbs tunnel warm-up",
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
        print(f"{tag:32s}: {rate:8.1f} M lookups/s  {dt*1e3:7.2f} ms",
              flush=True)
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


def gsum(i, t):
    return jnp.sum(t[(idx + i) % ROWS].astype(jnp.float32), 0)


# -- A. width bracket ------------------------------------------------------
bench(gsum, (mk(32, jnp.bfloat16, 99),), "warmup_discard")
for w in (8, 16, 24, 32, 40, 48, 64):
    mb = ROWS * w * 2 / 1e6
    bench(gsum, (mk(w, jnp.bfloat16, w),), f"bf16_l{w}_{mb:.0f}MB")
bench(gsum, (mk(32, jnp.int8, 7),), "int8_l32_17MB")

# -- B. same-index split candidates ---------------------------------------
b32a, b32b, b16 = (mk(32, jnp.bfloat16, 41), mk(32, jnp.bfloat16, 42),
                   mk(16, jnp.bfloat16, 43))


def split3_bf16(i, ta, tb, tc):
    ix = (idx + i) % ROWS
    return (jnp.sum(ta[ix].astype(jnp.float32), 0)
            + jnp.sum(tb[ix].astype(jnp.float32), 0)
            + jnp.sum(tc[ix].astype(jnp.float32), 0))


bench(split3_bf16, (b32a, b32b, b16), "bf16_split3_32_32_16")

b40a, b40b = mk(40, jnp.bfloat16, 51), mk(40, jnp.bfloat16, 52)


def split2_bf16(i, ta, tb):
    ix = (idx + i) % ROWS
    return (jnp.sum(ta[ix].astype(jnp.float32), 0)
            + jnp.sum(tb[ix].astype(jnp.float32), 0))


bench(split2_bf16, (b40a, b40b), "bf16_split2_2x42MB_slowpair")

# anchor: the real 84 MB whole-row mode in THIS process
bench(gsum, (mk(80, jnp.bfloat16, 61),), "bf16_l80_84MB_anchor")

# -- C. in-context 3-way only if physics says it can pay ------------------
three = results.get("bf16_split3_32_32_16")
anchor = results.get("bf16_l80_84MB_anchor")
if isinstance(three, (int, float)) and isinstance(anchor, (int, float)) \
        and three > anchor * 1.15:
    print("3-way split beats slow mode standalone — in-context A/B",
          flush=True)
    import functools

    from uncertainty_nerf_gs_tpu.models.nerfacto import (
        NerfactoConfig, NerfactoModel,
    )
    from uncertainty_nerf_gs_tpu.ops import encodings as enc
    from uncertainty_nerf_gs_tpu.ops.sampling import RayBundle
    from uncertainty_nerf_gs_tpu.parallel import ensemble_fused as ef
    from uncertainty_nerf_gs_tpu.parallel.ensemble_parallel import (
        init_ensemble_params,
    )

    CHUNK = 1 << 15
    config = NerfactoConfig(
        num_images=8, uncertainty_channels=1, near_plane=0.5, far_plane=6.0,
        background_color="white", use_appearance_embedding=False,
        proposal_field_type="hash", mixed_precision=True,
    )
    model = NerfactoModel(config)
    stacked = init_ensemble_params(model, 5)
    rng = np.random.default_rng(0)
    d = rng.normal(size=(CHUNK, 3))
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    bundle = RayBundle(
        origins=jnp.asarray(rng.uniform(-0.1, 0.1, (CHUNK, 3)), jnp.float32),
        directions=jnp.asarray(d, jnp.float32),
        nears=jnp.full((CHUNK,), config.near_plane),
        fars=jnp.full((CHUNK,), config.far_plane),
        camera_indices=jnp.zeros((CHUNK,), jnp.int32),
    )
    orig_split = enc.split_packed_tables
    enc.split_packed_tables = functools.partial(orig_split, max_parts=3)
    try:
        packed = ef.pack_ensemble_tables(
            model, stacked, table_dtype=jnp.bfloat16, table_split=True,
        )
    finally:
        enc.split_packed_tables = orig_split
    render = ef.build_fused_ensemble_render(model, main_stride_scale=0.0)

    def runctx(i):
        b = bundle._replace(origins=bundle.origins + 1e-6 * i)
        return render(stacked, packed, b)["rgb"]

    try:
        for i in range(6):
            float(jnp.sum(runctx(i)))
        t0 = time.perf_counter()
        outs = [runctx(6 + i) for i in range(5)]
        s = float(jnp.sum(jnp.stack([o.sum() for o in outs])))
        dt = (time.perf_counter() - t0) / 5
        assert np.isfinite(s)
        results["bf16_exact_split3_incontext_rays_s"] = round(CHUNK / dt, 1)
        print(f"bf16_exact split3 in-context: {CHUNK/dt:.1f} rays/s",
              flush=True)
    except Exception as e:
        results["bf16_exact_split3_incontext_rays_s"] = (
            f"ERROR: {type(e).__name__}: {e}"[:300])
        traceback.print_exc()
    OUT.write_text(json.dumps(results, indent=2) + "\n")
else:
    results["incontext"] = (
        f"skipped: split3 {three} vs anchor {anchor} — physics says the "
        "3-way split cannot beat slow mode in-context")
    OUT.write_text(json.dumps(results, indent=2) + "\n")
    print(results["incontext"], flush=True)

print("JOB_445_DONE", flush=True)
