"""Corner-layout determinism rerun (open anomaly, STATUS.md).

History on the 12-view sparse scene @ 2k iters: corner scored 26.8 dB,
then a regenerated run scored 15.9 dB eval with healthy train views
(44 dB) — i.e. it sometimes overfits. Two fresh runs with different
seeds quantify the variance; cell/hybrid regenerated consistently, so
if corner is high-variance under sparse supervision that itself is the
finding (hybrid+facereg stays the sparse default either way).

Writes /root/repo/evidence/corner_rerun_r4.json.
"""

import sys as _sys
for _k in [k for k in _sys.modules if k.startswith("uncertainty_nerf_gs_tpu")]:
    del _sys.modules[_k]  # long-lived worker: force fresh package code


import json
import sys
from pathlib import Path

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/experiments")

import r3_soak_suite as suite
from uncertainty_nerf_gs_tpu.data.synthetic import write_blender_dataset
from uncertainty_nerf_gs_tpu.scripts.eval_uncertainty import main as eval_main
from uncertainty_nerf_gs_tpu.scripts.train import main as train_main

WORK = Path("/root/repo/.soak/r3")
WORK.mkdir(parents=True, exist_ok=True)
scene = WORK / "sparse_scene"
if not scene.exists():
    write_blender_dataset(scene, num_train=12, num_test=3, height=64, width=64)

results = {}
for seed in (0, 1):
    d = WORK / f"sparse_corner_rerun_s{seed}"
    ov = dict(suite.SPARSE_OVERRIDES, grid_layout="corner")
    if not list(d.glob("step-*.ckpt")):
        train_main([
            "nerfacto", "--data", str(scene), "--dataparser", "blender-data",
            "--output-dir", str(d), "--max-num-iterations", "2000",
            "--steps-per-save", "2000", "--seed", str(seed),
            "--log-every", "500", "--camera-opt", "off",
            "--overrides", json.dumps(ov),
        ])
    out = eval_main([
        "--load-config", str(d),
        "--output-path", str(d / "metrics.json"),
    ])
    results[f"seed{seed}"] = {k: out["results"][k] for k in ("psnr", "ssim")}
    print(f"corner seed{seed}: psnr={out['results']['psnr']:.2f}", flush=True)

out_path = Path("/root/repo/evidence/corner_rerun_r4.json")
out_path.write_text(json.dumps(results, indent=2))
print("wrote", out_path, flush=True)
