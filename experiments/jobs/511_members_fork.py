"""Train gate members 1-4 as forks of member0@6000, +2000 steps each.

Substrate economics (r5 continuation): the host wipe destroyed the r4
substrate; retraining 5 independent 12k members (~4.5 h at the measured
3.7 steps/s) does not fit the session's chip budget. Members 1-4 restore
member0's step-6000 checkpoint and train 2000 further steps under
DIFFERENT seeds (independent batch streams), giving 5 real
reference-scale checkpoints for the widened 5-member gate. The fork is
recorded in the gate evidence _meta (weaker inter-member diversity than
independent inits — shared first-6k trajectory).
"""

import json
import shutil
from pathlib import Path

import sys
sys.path.insert(0, "/root/repo")
for m in [k for k in sys.modules if k.startswith("uncertainty_nerf_gs_tpu")]:
    del sys.modules[m]

from uncertainty_nerf_gs_tpu.scripts.train import main as train_main

WORK = Path("/root/repo/.soak/quality2k")
FORK_STEP = 6000
TARGET = 8000

OVERRIDES = {
    "use_appearance_embedding": False,
    "near_plane": 0.5,
    "far_plane": 4.5,
    "background_color": "white",
    "use_scene_contraction": False,
    "eval_num_rays_per_chunk": 1 << 12,
    "mixed_precision": True,
}

src_ckpt = WORK / "member0" / f"step-{FORK_STEP:09d}.ckpt"
assert src_ckpt.exists(), f"fork point missing: {src_ckpt}"

for seed in (1, 2, 3, 4):
    d = WORK / f"member{seed}"
    steps = sorted(int(p.name[5:14]) for p in d.glob("step-*.ckpt"))
    if steps and steps[-1] >= TARGET:
        print(f"member{seed} already at step {steps[-1]}", flush=True)
        continue
    if not steps:
        d.mkdir(parents=True, exist_ok=True)
        shutil.copytree(src_ckpt, d / src_ckpt.name)
        print(f"member{seed}: forked from member0@{FORK_STEP}", flush=True)
    train_main([
        "active-nerfacto", "--data", str(WORK / "scene"), "--dataparser",
        "blender-data", "--output-dir", str(d), "--load-dir", str(d),
        "--max-num-iterations", str(TARGET), "--steps-per-save", "2000",
        "--seed", str(seed), "--log-every", "1000", "--camera-opt", "off",
        "--overrides", json.dumps(OVERRIDES),
    ])
    print(f"member{seed} done", flush=True)
print("JOB_511_DONE", flush=True)
