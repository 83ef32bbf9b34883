"""Decompose the PDF stage's 206 ms in-context cost (job 303: exact
render 564 ms, no_pdf 358 ms — yet the v2 resample kernels standalone
measure ~40 ms for both stages). Who eats the other ~165 ms?

In-context variants (exact config, bf16 tables, monkeypatched):
  real        — baseline (the v2 Pallas kernel);
  glue_only   — resample_edges_tpu faked to `return u` (keeps u
                generation + _edges_to_samples + downstream shapes);
  xla_pdf     — force the XLA fallback resampler branch in-context;
  blocks32/64 — v2 kernel with the rays-per-step block forced up
                (per-step grid overhead hypothesis: stage 1 runs 2048
                16-ray steps at ~26 us flat cost per step).

Standalone: v2 kernel at the exact in-context shapes, default and
forced-block variants.

Writes /root/repo/evidence/pdf_incontext_r4.json.
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

import sys
sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/experiments")

import uncertainty_nerf_gs_tpu.ops.pdf_pallas as PP
import uncertainty_nerf_gs_tpu.ops.sampling as S
import uncertainty_nerf_gs_tpu.parallel.ensemble_fused as EF
from uncertainty_nerf_gs_tpu.models.nerfacto import NerfactoConfig, NerfactoModel
from uncertainty_nerf_gs_tpu.ops.sampling import RayBundle
from uncertainty_nerf_gs_tpu.parallel.ensemble_parallel import init_ensemble_params
from r3_gather_ablation import bench, CHUNK

results = {}
rng = np.random.default_rng(0)

# --- standalone kernel at the exact in-context shapes -----------------------
def bench_standalone(tag, r, s, n, block=None):
    w = jnp.asarray(rng.uniform(0.1, 1.0, (r, s)), jnp.float32)
    edges = jnp.asarray(np.sort(rng.uniform(size=(r, s + 1))), jnp.float32)
    u = jnp.asarray(
        (np.arange(n)[None, :] + 0.5) / n * np.ones((r, 1)), jnp.float32
    )
    orig = PP._block_rays
    if block is not None:
        PP._block_rays = lambda sp, nl: block

    @jax.jit
    def run(i):
        return PP.resample_edges_tpu(w + 1e-6 * i, edges, u).sum()

    for i in range(6):
        float(run(i))
    t0 = time.perf_counter()
    vals = [run(6 + i) for i in range(5)]
    sm = float(jnp.stack(vals).sum())
    dt = (time.perf_counter() - t0) / 5
    PP._block_rays = orig
    assert np.isfinite(sm)
    results[tag] = round(dt * 1e3, 2)
    print(f"{tag}: {dt*1e3:.2f} ms", flush=True)


for block in (None, 32, 64):
    suffix = "" if block is None else f"_b{block}"
    bench_standalone(f"standalone_s256_q97{suffix}", CHUNK, 256, 97, block)
    bench_standalone(f"standalone_s96_q49{suffix}", CHUNK, 96, 49, block)

# --- in-context --------------------------------------------------------------
config = NerfactoConfig(
    num_images=8, uncertainty_channels=1, near_plane=0.5, far_plane=6.0,
    background_color="white", use_appearance_embedding=False,
    proposal_field_type="hash", mixed_precision=True,
)
model = NerfactoModel(config)
stacked = init_ensemble_params(model, 5)
packed = EF.pack_ensemble_tables(model, stacked, table_dtype=jnp.bfloat16)

d = rng.normal(size=(CHUNK, 3))
d /= np.linalg.norm(d, axis=-1, keepdims=True)
bundle = RayBundle(
    origins=jnp.asarray(rng.uniform(-0.1, 0.1, (CHUNK, 3)), jnp.float32),
    directions=jnp.asarray(d, jnp.float32),
    nears=jnp.full((CHUNK,), config.near_plane),
    fars=jnp.full((CHUNK,), config.far_plane),
    camera_indices=jnp.zeros((CHUNK,), jnp.int32),
)

real_kernel = PP.resample_edges_tpu
real_on_tpu = S.on_tpu
real_blocks = PP._block_rays


def timed(tag):
    render = EF.build_fused_ensemble_render(model)
    dt = bench(render, stacked, packed, bundle)
    results[f"incontext_{tag}_ms"] = round(dt * 1e3, 1)
    results[f"incontext_{tag}_rays_per_s"] = round(CHUNK / dt, 0)
    print(f"in-context {tag}: {dt*1e3:.1f} ms ({CHUNK/dt:,.0f} rays/s)",
          flush=True)


timed("real")

PP.resample_edges_tpu = lambda w, e, u, *a, **k: u
timed("glue_only")
PP.resample_edges_tpu = real_kernel

S.on_tpu = lambda: False  # sample_pdf falls to the XLA branch
timed("xla_pdf")
S.on_tpu = real_on_tpu

for block in (32, 64):
    PP._block_rays = lambda sp, nl, b=block: b
    timed(f"blocks{block}")
PP._block_rays = real_blocks

with open("/root/repo/evidence/pdf_incontext_r4.json", "w") as f:
    json.dump(results, f, indent=2)
    f.write("\n")
print("JOB_304_DONE", flush=True)
