"""Round-3 TPU suite, ONE process (axon wedges on churn), in this order:

  1. sparse-view layout quality: 12-view procedural scene, cell vs corner
     vs HYBRID at equal steps — done-criterion: hybrid within ~0.5 dB of
     corner (VERDICT r2 #2);
  2. active-splatfacto soak >= 15k iters so the full refine schedule
     (stop_split_at, opacity resets) executes NaN-free (VERDICT r2 #3b);
  3. active-nerfacto 30k-iter soak at reference scale (16 levels / 2^19 /
     256/96/48 / 4096 rays) with periodic train-view eval — late-training
     stability evidence (VERDICT r2 #3a).

Each step logs to stdout and writes JSON summaries under the workdir;
failures are isolated so later steps still run.
"""

from __future__ import annotations

import json
import sys
import time
import traceback
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

WORK = Path("/tmp/r3_soak")

SPARSE_OVERRIDES = {
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

# full reference scale (laplace_config.py:27,31-35 budgets); bf16 MLP
# compute matches the reference's AMP training — the 30k soak doubles as
# the stability evidence for flipping mixed_precision on by default
SOAK_OVERRIDES = {
    "use_appearance_embedding": False,
    "near_plane": 0.5,
    "far_plane": 4.5,
    "background_color": "white",
    "use_scene_contraction": False,
    "eval_num_rays_per_chunk": 1 << 12,
    "mixed_precision": True,
}


def step(name, fn):
    print(f"\n===== {name} =====", flush=True)
    t0 = time.perf_counter()
    try:
        fn()
        print(f"[{name}] done in {time.perf_counter()-t0:.0f}s", flush=True)
    except Exception:
        traceback.print_exc()
        print(f"[{name}] FAILED (continuing)", flush=True)


def sparse_layout_quality():
    from uncertainty_nerf_gs_tpu.data.synthetic import write_blender_dataset
    from uncertainty_nerf_gs_tpu.scripts.eval_uncertainty import main as eval_main
    from uncertainty_nerf_gs_tpu.scripts.train import main as train_main

    scene = WORK / "sparse_scene"
    if not scene.exists():
        write_blender_dataset(scene, num_train=12, num_test=3, height=64, width=64)
    results = {}
    for layout in ("hybrid", "corner", "cell"):
        # v2: hybrid dense criterion extended to (res+1)^3 <= 8*table
        d = WORK / f"sparse_{layout}_v2"
        ov = dict(SPARSE_OVERRIDES, grid_layout=layout)
        if not list(d.glob("step-*.ckpt")):
            train_main([
                "nerfacto", "--data", str(scene), "--dataparser",
                "blender-data", "--output-dir", str(d),
                "--max-num-iterations", "2000", "--steps-per-save", "2000",
                "--seed", "0", "--log-every", "500", "--camera-opt", "off",
                "--overrides", json.dumps(ov),
            ])
        out = eval_main([
            "--load-config", str(d),
            "--output-path", str(WORK / f"sparse_metrics_{layout}_v2.json"),
        ])
        results[layout] = {
            k: out["results"][k] for k in ("psnr", "ssim")
        }
        print(f"sparse-12view {layout}: psnr={out['results']['psnr']:.2f}",
              flush=True)
    (WORK / "sparse_layout_summary.json").write_text(
        json.dumps(results, indent=2)
    )


def splat_soak():
    """Full refine schedule (incl. stop_split_at and opacity resets) for
    BOTH splat methods: the 090 run showed active-splatfacto degrading
    past step 4000 (train psnr 17.9 -> 7.4 across the 6000 reset); plain
    splatfacto under the same schedule isolates NLL-vs-schedule."""
    from uncertainty_nerf_gs_tpu.data.synthetic import write_blender_dataset
    from uncertainty_nerf_gs_tpu.scripts.train import main as train_main

    scene = WORK / "splat_scene"
    if not scene.exists():
        write_blender_dataset(scene, num_train=24, num_test=3, height=64, width=64)
    for method, unc in (("splatfacto", 0), ("active-splatfacto", 1)):
        d = WORK / f"soak_{method}"
        ov = {
            "capacity": 1 << 15,
            "num_random": 4096,
            "random_scale": 1.2,
            "uncertainty_channels": unc,
            # the synthetic GT is white-composited RGBA with ~42% coverage;
            # the reference's background_color="random" configs EVAL on a
            # fixed navy background, so train-view PSNR would read ~6 dB on
            # a healthy model — soak on white so the curves are readable
            "background_color": "white",
        }
        train_main([
            method, "--data", str(scene), "--dataparser",
            "blender-data", "--output-dir", str(d),
            "--max-num-iterations", "16000", "--steps-per-save", "8000",
            "--steps-per-eval-image", "2000",
            "--seed", "0", "--log-every", "1000",
            "--overrides", json.dumps(ov),
        ])


def nerfacto_soak():
    from uncertainty_nerf_gs_tpu.data.synthetic import write_blender_dataset
    from uncertainty_nerf_gs_tpu.scripts.train import main as train_main

    scene = WORK / "soak_scene"
    if not scene.exists():
        write_blender_dataset(scene, num_train=40, num_test=4, height=64, width=64)
    d = WORK / "nerfacto_soak"
    load = ["--load-dir", str(d)] if list(d.glob("step-*.ckpt")) else []
    train_main([
        "active-nerfacto", "--data", str(scene), "--dataparser",
        "blender-data", "--output-dir", str(d),
        "--max-num-iterations", "30000", "--steps-per-save", "6000",
        "--steps-per-eval-image", "2000",
        "--seed", "0", "--log-every", "1000", "--camera-opt", "off",
        "--overrides", json.dumps(SOAK_OVERRIDES),
    ] + load)


def main():
    WORK.mkdir(exist_ok=True)
    step("sparse_layout_quality", sparse_layout_quality)
    step("splat_soak", splat_soak)
    step("nerfacto_soak", nerfacto_soak)
    print("R3_SOAK_SUITE_DONE", flush=True)


if __name__ == "__main__":
    main()
