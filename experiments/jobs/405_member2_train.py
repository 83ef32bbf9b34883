"""Train gate-substrate member 2 (VERDICT r5 #1: gate at 5 members).

Same config as members 0/1 (job 310): reference model scale, 40-view
64x64 procedural scene, 12k iters, bf16 AMP parity mode. Resumable.
"""

import json
from pathlib import Path

import sys
sys.path.insert(0, "/root/repo")

from uncertainty_nerf_gs_tpu.scripts.train import main as train_main

WORK = Path("/root/repo/.soak/quality2k")
TOTAL = 12000
SEED = int(Path(__file__).stem.split("_")[1][6:])  # memberN -> N

OVERRIDES = {
    "use_appearance_embedding": False,
    "near_plane": 0.5,
    "far_plane": 4.5,
    "background_color": "white",
    "use_scene_contraction": False,
    "eval_num_rays_per_chunk": 1 << 12,
    "mixed_precision": True,
}

d = WORK / f"member{SEED}"
steps = sorted(int(p.name[5:14]) for p in d.glob("step-*.ckpt"))
if steps and steps[-1] >= TOTAL:
    print(f"member{SEED} already at step {steps[-1]}", flush=True)
else:
    args = [
        "active-nerfacto", "--data", str(WORK / "scene"), "--dataparser",
        "blender-data", "--output-dir", str(d),
        "--max-num-iterations", str(TOTAL), "--steps-per-save", "4000",
        "--seed", str(SEED), "--log-every", "1000", "--camera-opt", "off",
        "--overrides", json.dumps(OVERRIDES),
    ]
    if steps:
        args += ["--load-dir", str(d)]
    train_main(args)
print(f"JOB_MEMBER{SEED}_DONE", flush=True)
