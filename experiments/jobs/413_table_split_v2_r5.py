"""Refined-rule lane-split in-context re-measurement (follow-up to 412).

Job 412's rule pad-dropped EVERY table (tuples even at parts=1); the
measurements implicated narrow single-part gathers as pathological:
int8_exact split WON (64.6k -> 80.8k rays/s) but int8_stride8 LOST
(107.9k -> 89.5k) and bf16 3-way collapsed. The refined rule
(split_packed_tables max_parts=2, parts==1 passes through WHOLE with pad
kept) now splits ONLY the 42 MB int8 main levels into 2 x 21 MB and
leaves proposals/bf16 alone. This job re-measures the three int8 rows
and UPDATES evidence/table_split_incontext_r5.json in place (bench.py's
_use_table_split reads it).
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

from uncertainty_nerf_gs_tpu.models.nerfacto import NerfactoConfig, NerfactoModel
from uncertainty_nerf_gs_tpu.ops.sampling import RayBundle
from uncertainty_nerf_gs_tpu.parallel.ensemble_fused import (
    build_fused_ensemble_render, pack_ensemble_tables,
)
from uncertainty_nerf_gs_tpu.parallel.ensemble_parallel import init_ensemble_params

OUT = Path("/root/repo/evidence/table_split_incontext_r5.json")
CHUNK = 1 << 15
results = json.loads(OUT.read_text()) if OUT.exists() else {}
results.setdefault("_meta", {})
results["_meta"]["rule_v2"] = (
    "split1 rows re-measured under the refined rule (max_parts=2, no "
    "single-part pad-drop): only the 42 MB int8 main levels split into "
    "2 x 21 MB; v1-rule rows kept under *_rule_v1"
)

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


def bench(render, packed, tag):
    try:
        def run(i):
            b = bundle._replace(origins=bundle.origins + 1e-6 * i)
            return render(stacked, packed, b)["rgb"]

        for i in range(6):
            float(jnp.sum(run(i)))
        t0 = time.perf_counter()
        outs = [run(6 + i) for i in range(5)]
        s = float(jnp.sum(jnp.stack([o.sum() for o in outs])))
        dt = (time.perf_counter() - t0) / 5
        assert np.isfinite(s)
        if tag in results and isinstance(results[tag], (int, float)):
            results[f"{tag}_rule_v1"] = results[tag]
        results[tag] = round(CHUNK / dt, 1)
        print(f"{tag:28s}: {CHUNK/dt:9.1f} rays/s  ({dt*1e3:.1f} ms)",
              flush=True)
    except Exception as e:
        results[tag] = f"ERROR: {type(e).__name__}: {e}"[:300]
        print(f"{tag}: FAILED {e}", flush=True)
        traceback.print_exc()
    OUT.write_text(json.dumps(results, indent=2) + "\n")


# sanity: refined rule leaves bf16 and proposals unsplit
pk = pack_ensemble_tables(model, stacked, table_dtype=jnp.bfloat16,
                          table_split=True)
f = pk["field"]["tables"] if isinstance(pk["field"], dict) else pk["field"]
assert not any(isinstance(t, tuple) for t in
               (f if isinstance(f, list) else [f[i] for i in range(len(f))])), \
    "bf16 must pass through whole under rule v2"
results["_meta"]["bf16_exact_split1"] = "rule v2: pass-through (== split0)"
del pk, f
jax.clear_caches()

for tag, stride, split in [
    ("int8_exact_split1", 0.0, True),
    ("int8_stride8_split1", 8.0, True),
    ("int8_stride4_split0", 4.0, False),
    ("int8_stride4_split1", 4.0, True),
]:
    packed = pack_ensemble_tables(model, stacked, table_dtype=jnp.int8,
                                  table_split=split)
    tabs = packed["field"]["tables"]
    n_split = sum(isinstance(t, tuple) for t in
                  (tabs if isinstance(tabs, list) else
                   [tabs[i] for i in range(len(tabs))]))
    print(f"{tag}: {n_split} split main levels", flush=True)
    render = build_fused_ensemble_render(model, main_stride_scale=stride)
    bench(render, packed, tag)
    del packed
    jax.clear_caches()

print("JOB_413_DONE", flush=True)
