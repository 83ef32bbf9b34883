"""In-context A/B of lane-split eval tables (VERDICT r5 #3 — exact path).

split_packed_tables is EXACT (addressing only; oracle test green): each
fused level's 67 MB int8 / 134 MB bf16 member-packed table becomes
sub-34 MB lane slices with pad lanes dropped. Physics (jobs 400/403/409):
the row-gather lowering runs ~2.2x faster under ~34 MB operands; splits
pay k x issued rows, so the win requires either the pad-drop byte saving
(128 -> 80 lanes) or gather overlap. This measures the real fused
5-member render at reference scale — the definitive in-context verdict.

Writes evidence/table_split_incontext_r5.json progressively.
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
results: dict = {"_meta": {
    "config": "5-member fused ensemble render, reference scale, 32k-ray "
              "chunk (bench.py shapes); rates in rays/s",
}}

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
        results[tag] = round(CHUNK / dt, 1)
        print(f"{tag:28s}: {CHUNK/dt:9.1f} rays/s  ({dt*1e3:.1f} ms)",
              flush=True)
    except Exception as e:
        results[tag] = f"ERROR: {type(e).__name__}: {e}"[:300]
        print(f"{tag}: FAILED {e}", flush=True)
        traceback.print_exc()
    OUT.write_text(json.dumps(results, indent=2) + "\n")


dt8, dt16 = jnp.int8, jnp.bfloat16
for tag, dtype, stride, split in [
    ("bf16_exact_split0", dt16, 0.0, False),
    ("bf16_exact_split1", dt16, 0.0, True),
    ("int8_exact_split0", dt8, 0.0, False),
    ("int8_exact_split1", dt8, 0.0, True),
    ("int8_stride8_split0", dt8, 8.0, False),
    ("int8_stride8_split1", dt8, 8.0, True),
]:
    packed = pack_ensemble_tables(model, stacked, table_dtype=dtype,
                                  table_split=split)
    render = build_fused_ensemble_render(model, main_stride_scale=stride)
    bench(render, packed, tag)
    del packed
    jax.clear_caches()

print("JOB_412_DONE", flush=True)
