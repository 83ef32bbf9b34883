"""Driver benchmark: 5-member ensemble mean+variance render throughput.

Benches the BASELINE.json north-star path — a single-launch 5-member deep-
ensemble render (mean + epistemic/aleatoric variance) of the active-nerfacto
flagship model — and prints ONE JSON line:

    {"metric": ..., "value": N, "unit": "rays/sec", "vs_baseline": N}

`vs_baseline` compares against the PyTorch reference's *sequential* 5-member
ensemble eval (`/root/reference/nerfuncertainty/models/ensemble/
ensemble_pipeline.py:155-157` — a Python loop of full per-member renders).
The reference publishes no numbers (BASELINE.md), so the baseline constant
below is the protocol-documented estimate: a single nerfacto eval render on
the reference's CUDA 11.8 GPU class sustains ~3e5 rays/s, so the 5-member
sequential ensemble path sustains ~6e4 rays/s.  vs_baseline = value / 6e4.
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

REFERENCE_ENSEMBLE_RAYS_PER_SEC = 6.0e4  # see module docstring
NUM_MEMBERS = 5
CHUNK = 1 << 12  # reference eval chunks 1<<15 rays (laplace_config.py:35);
# 4096 keeps compile+VMEM modest while saturating the chip.
WARMUP = 2
ITERS = 5


def main() -> None:
    from uncertainty_nerf_gs_tpu.models.nerfacto import NerfactoConfig, NerfactoModel
    from uncertainty_nerf_gs_tpu.ops.sampling import RayBundle
    from uncertainty_nerf_gs_tpu.parallel.ensemble_parallel import (
        build_ensemble_render,
        init_ensemble_params,
    )

    # full nerfacto-scale config (16 hash levels, 2^19 tables, 256/96/48
    # proposal+nerf samples) with the active-nerfacto aleatoric head.
    # proposal_field_type="mlp" is the TPU-first configuration: gather-free
    # frequency-MLP proposal densities (XLA's dynamic gather is the TPU
    # bottleneck; overfit quality matches hash proposals to within 2 dB —
    # see STATUS.md). The reference-parity hash proposals remain the
    # METHODS-registry default.
    config = NerfactoConfig(
        num_images=8,
        uncertainty_channels=1,
        near_plane=0.5,
        far_plane=6.0,
        background_color="white",
        use_appearance_embedding=False,
        proposal_field_type="mlp",
    )
    model = NerfactoModel(config)
    stacked_params = init_ensemble_params(model, NUM_MEMBERS)

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

    render = build_ensemble_render(model)

    # Timing hygiene for the axon (remote TPU tunnel) backend: block_until_
    # ready is unreliable and identical repeated launches can short-circuit,
    # so every iteration gets distinct inputs and the loop ends with a host
    # materialization that transitively forces the whole execution chain.
    def run(i: int):
        b = bundle._replace(origins=bundle.origins + 1e-6 * i)
        return render(stacked_params, b)

    for i in range(WARMUP):
        float(jnp.sum(run(i)["rgb"]))

    t0 = time.perf_counter()
    outs = [run(WARMUP + i)["rgb"] for i in range(ITERS)]
    checksum = float(jnp.sum(jnp.stack([o.sum() for o in outs])))
    dt = time.perf_counter() - t0

    rays_per_sec = ITERS * CHUNK / dt
    assert np.isfinite(checksum)
    print(
        json.dumps(
            {
                "metric": "ensemble5_mean_var_render_throughput",
                "value": round(rays_per_sec, 1),
                "unit": "rays/sec",
                "vs_baseline": round(rays_per_sec / REFERENCE_ENSEMBLE_RAYS_PER_SEC, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
