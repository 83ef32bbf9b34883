"""Train the quality-gate substrate to convergence (VERDICT r3 weak #3).

The r3 int8/stride gate ran on 2k-iter members at eval PSNR ~13.8 — an
undertrained model whose AUSE deltas are noise-prone in both directions.
This resumes both quality2k members (reference model scale: 16 levels /
2^19 table / 256/96/48 samples, bf16 AMP parity mode) from step-2000 to
step-12000 so the r4 gate (job 320) certifies at a converged checkpoint.

Checkpoints persist under /root/repo/.soak/quality2k (reboot-safe);
re-queuing auto-resumes from the latest step-*.ckpt.
"""

import json
from pathlib import Path

import sys
sys.path.insert(0, "/root/repo")

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

for seed in (0, 1):
    d = WORK / f"member{seed}"
    steps = sorted(int(p.name[5:14]) for p in d.glob("step-*.ckpt"))
    if steps and steps[-1] >= TOTAL:
        print(f"member{seed} already at step {steps[-1]}", flush=True)
        continue
    train_main([
        "active-nerfacto", "--data", str(WORK / "scene"), "--dataparser",
        "blender-data", "--output-dir", str(d), "--load-dir", str(d),
        "--max-num-iterations", str(TOTAL), "--steps-per-save", "10000",
        "--seed", str(seed), "--log-every", "1000", "--camera-opt", "off",
        "--overrides", json.dumps(OVERRIDES),
    ])
print("JOB_310_DONE", flush=True)
