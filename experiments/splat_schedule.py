"""Splat densification-schedule tuning on the procedural scene (VERDICT r1
item 8): overfit PSNR at a fixed step budget across refine cadences and
capacity settings, with the round-2 targeted moment resets. Writes a small
table; the winner becomes the documented default rationale."""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=1200)
    ap.add_argument("--workdir", default="/tmp/splat_sched")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from uncertainty_nerf_gs_tpu.data.dataparsers import DATAPARSERS
    from uncertainty_nerf_gs_tpu.data.datasets import load_images
    from uncertainty_nerf_gs_tpu.data.synthetic import write_blender_dataset
    from uncertainty_nerf_gs_tpu.engine.splat_trainer import SplatfactoTrainer
    from uncertainty_nerf_gs_tpu.metrics import psnr
    from uncertainty_nerf_gs_tpu.models.splatfacto import SplatfactoConfig

    work = Path(args.workdir)
    scene = work / "scene"
    if not scene.exists():
        write_blender_dataset(scene, num_train=12, num_test=3, height=64, width=64)
    outputs = DATAPARSERS["blender-data"](scene, "train")
    images = load_images(outputs)

    variants = {
        "default(r100,w500)": dict(refine_every=100, warmup_length=500),
        "fast-refine(r50,w300)": dict(refine_every=50, warmup_length=300),
        "slow-refine(r200,w500)": dict(refine_every=200, warmup_length=500),
        "no-densify": dict(refine_every=100, warmup_length=500,
                           stop_split_at=0),
    }
    results = {}
    for name, over in variants.items():
        cfg = SplatfactoConfig(
            capacity=1 << 14, num_random=4000, random_scale=1.0,
            background_color="white", rasterize_capacity=256, tile_chunk=16,
            cull_alpha_thresh=0.05, **over,
        )
        tr = SplatfactoTrainer(
            config=cfg, cameras=outputs.cameras, images=images, seed=0,
        )
        t0 = time.perf_counter()
        tr.train(args.steps, log_every=0)
        dt = time.perf_counter() - t0
        ps = []
        for i in range(min(3, len(outputs.cameras))):
            out = tr.render_image(i, background=np.ones(3))
            ps.append(float(psnr(jnp.asarray(out["rgb"]),
                                 jnp.asarray(images[i]))))
        alive = int(np.asarray(tr.splat_state.alive).sum())
        results[name] = {
            "train_view_psnr": float(np.mean(ps)),
            "alive": alive,
            "steps_per_sec": args.steps / dt,
        }
        print(f"{name:24s}: psnr={np.mean(ps):6.2f}  alive={alive:6d} "
              f" {args.steps/dt:5.1f} steps/s", flush=True)

    (work / "results.json").write_text(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
