"""Train gate-substrate member0 to 12k (r5 continuation).

The host wipe destroyed the r4/r5 substrate checkpoints (.soak/ is not
committed); the scene was regenerated bit-identically (seeded). Saves at
6000 (fork point for members 1-4) and 12000.
"""

import json
from pathlib import Path

import sys
sys.path.insert(0, "/root/repo")
for m in [k for k in sys.modules if k.startswith("uncertainty_nerf_gs_tpu")]:
    del sys.modules[m]

from uncertainty_nerf_gs_tpu.scripts.train import main as train_main

WORK = Path("/root/repo/.soak/quality2k")
TOTAL = 12000

OVERRIDES = {
    "use_appearance_embedding": False,
    "near_plane": 0.5,
    "far_plane": 4.5,
    "background_color": "white",
    "use_scene_contraction": False,
    "eval_num_rays_per_chunk": 1 << 12,
    "mixed_precision": True,
}

d = WORK / "member0"
steps = sorted(int(p.name[5:14]) for p in d.glob("step-*.ckpt"))
if steps and steps[-1] >= TOTAL:
    print(f"member0 already at step {steps[-1]}", flush=True)
else:
    args = [
        "active-nerfacto", "--data", str(WORK / "scene"), "--dataparser",
        "blender-data", "--output-dir", str(d),
        "--max-num-iterations", str(TOTAL), "--steps-per-save", "6000",
        "--seed", "0", "--log-every", "1000", "--camera-opt", "off",
        "--overrides", json.dumps(OVERRIDES),
    ]
    if steps:
        args += ["--load-dir", str(d)]
    train_main(args)
print("JOB_510_DONE", flush=True)
