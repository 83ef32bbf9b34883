"""Cell-vs-corner hash-grid layout quality check (round-2 deviation
validation): train the same nerfacto config under both grid layouts on the
procedural scene and compare eval-view PSNR. The cell layout trades tcnn's
corner sharing for one-gather-per-sample lookups; this quantifies the
quality cost (expected: within ~1 dB)."""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

OVERRIDES = {
    "num_proposal_samples": (64, 32),
    "num_nerf_samples": 24,
    "num_levels": 8,
    "max_res": 512,
    "log2_hashmap_size": 15,
    "use_appearance_embedding": False,
    "near_plane": 0.5,
    "far_plane": 4.5,
    "background_color": "white",
    "use_scene_contraction": False,
    "eval_num_rays_per_chunk": 1 << 12,
    "proposal_net_args": (
        dict(num_levels=4, max_res=64, log2_hashmap_size=13, hidden_dim=16),
        dict(num_levels=4, max_res=128, log2_hashmap_size=13, hidden_dim=16),
    ),
}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=1500)
    ap.add_argument("--workdir", default="/tmp/layoutq")
    args = ap.parse_args()

    from uncertainty_nerf_gs_tpu.data.synthetic import write_blender_dataset
    from uncertainty_nerf_gs_tpu.scripts.eval_uncertainty import main as eval_main
    from uncertainty_nerf_gs_tpu.scripts.train import main as train_main

    work = Path(args.workdir)
    scene = work / "scene"
    if not scene.exists():
        write_blender_dataset(scene, num_train=12, num_test=3, height=64, width=64)

    results = {}
    for layout in ("cell", "corner"):
        d = work / f"run_{layout}"
        ov = dict(OVERRIDES, grid_layout=layout)
        if not list(d.glob("step-*.ckpt")):
            train_main([
                "nerfacto", "--data", str(scene), "--dataparser", "blender-data",
                "--output-dir", str(d), "--max-num-iterations", str(args.iters),
                "--steps-per-save", str(args.iters), "--seed", "0",
                "--log-every", "500", "--camera-opt", "off", "--overrides", json.dumps(ov),
            ])
        out = eval_main([
            "--load-config", str(d),
            "--output-path", str(work / f"metrics_{layout}.json"),
        ])
        results[layout] = out["results"]
        print(f"{layout}: psnr={out['results']['psnr']:.2f} "
              f"ssim={out['results']['ssim']:.3f}")

    dpsnr = results["cell"]["psnr"] - results["corner"]["psnr"]
    print(f"\ncell - corner PSNR delta: {dpsnr:+.2f} dB")
    Path(work / "summary.json").write_text(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
