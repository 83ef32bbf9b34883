"""Round-3 perf: bf16 (mixed_precision) parity bench + chunk-size sweep.

VERDICT r2 #1: the reference's own configs train/eval under AMP
(`/root/reference/nerfuncertainty/models/mcdropout/mcdropout_models.py:91`),
so the honest parity bench should run the bf16 MLP path. This script, in ONE
process (axon wedges on churn):

  1. benches the fused 5-member ensemble render at the reference-parity
     scale for {f32, bf16} x {1<<15, 1<<16} ray chunks;
  2. cross-checks bf16 vs f32 render quality (PSNR between the two rgb
     outputs on identical rays; AUSE inputs rgb_std compared too).

Params are initialized ONCE and shared (mixed_precision only changes
compute dtype, not the param pytree).
"""

from __future__ import annotations

import dataclasses
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

WARMUP = 6
ITERS = 5


def make_bundle(chunk: int, cfg):
    from uncertainty_nerf_gs_tpu.ops.sampling import RayBundle

    rng = np.random.default_rng(0)
    d = rng.normal(size=(chunk, 3))
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return RayBundle(
        origins=jnp.asarray(rng.uniform(-0.1, 0.1, (chunk, 3)), jnp.float32),
        directions=jnp.asarray(d, jnp.float32),
        nears=jnp.full((chunk,), cfg.near_plane),
        fars=jnp.full((chunk,), cfg.far_plane),
        camera_indices=jnp.zeros((chunk,), jnp.int32),
    )


def bench_one(render, stacked, packed, bundle, n_rays) -> float:
    def run(i):
        b = bundle._replace(origins=bundle.origins + 1e-6 * i)
        return render(stacked, packed, b)["rgb"]

    for i in range(WARMUP):
        float(jnp.sum(run(i)))
    t0 = time.perf_counter()
    outs = [run(WARMUP + i) for i in range(ITERS)]
    checksum = float(jnp.sum(jnp.stack([o.sum() for o in outs])))
    dt = time.perf_counter() - t0
    assert np.isfinite(checksum)
    return ITERS * n_rays / dt


def main():
    from uncertainty_nerf_gs_tpu.models.nerfacto import NerfactoConfig, NerfactoModel
    from uncertainty_nerf_gs_tpu.parallel.ensemble_fused import (
        build_fused_ensemble_render,
        pack_ensemble_tables,
    )
    from uncertainty_nerf_gs_tpu.parallel.ensemble_parallel import (
        init_ensemble_params,
    )

    base = NerfactoConfig(
        num_images=8,
        uncertainty_channels=1,
        near_plane=0.5,
        far_plane=6.0,
        background_color="white",
        use_appearance_embedding=False,
        proposal_field_type="hash",
    )
    print("init params (5 members)...", flush=True)
    model_f32 = NerfactoModel(base)
    stacked = init_ensemble_params(model_f32, 5)
    packed = pack_ensemble_tables(model_f32, stacked, table_dtype=jnp.bfloat16)

    cfg_bf16 = dataclasses.replace(base, mixed_precision=True)
    model_bf16 = NerfactoModel(cfg_bf16)

    results = {}
    renders = {}
    for name, model in (("f32", model_f32), ("bf16", model_bf16)):
        render = build_fused_ensemble_render(model)
        renders[name] = render
        for chunk in (1 << 15, 1 << 16):
            bundle = make_bundle(chunk, base)
            tag = f"{name}_{chunk >> 10}k"
            print(f"bench {tag}...", flush=True)
            rps = bench_one(render, stacked, packed, bundle, chunk)
            results[tag] = round(rps, 1)
            print(f"  {tag}: {rps:,.0f} rays/s", flush=True)

    # quality cross-check on one chunk
    bundle = make_bundle(1 << 15, base)
    out32 = renders["f32"](stacked, packed, bundle)
    out16 = renders["bf16"](stacked, packed, bundle)
    rgb32 = np.asarray(out32["rgb"], np.float64)
    rgb16 = np.asarray(out16["rgb"], np.float64)
    mse = float(np.mean((rgb32 - rgb16) ** 2))
    results["bf16_vs_f32_rgb_psnr"] = round(-10 * np.log10(max(mse, 1e-12)), 2)
    s32 = np.asarray(out32["rgb_std"], np.float64)
    s16 = np.asarray(out16["rgb_std"], np.float64)
    results["bf16_vs_f32_std_mae"] = float(np.mean(np.abs(s32 - s16)))
    results["f32_std_mean"] = float(np.mean(s32))
    print(json.dumps(results, indent=2), flush=True)
    with open("/tmp/r3_bf16_bench.json", "w") as f:
        json.dump(results, f, indent=2)


if __name__ == "__main__":
    main()
