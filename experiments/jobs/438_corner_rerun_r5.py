"""Corner-layout nondeterminism closure (VERDICT r4 #5, open since r3).

History on the 12-view sparse scene @ 2k iters: corner scored 26.8 dB,
then a regenerated run scored 15.9 dB eval with healthy train views
(44 dB) — an unexplained 11 dB swing that anchors the sparse-view
default table (hybrid + face_consistency_mult=1.0, scripts/train.py).

Three corner seeds + one hybrid control (same fixed data order — the
device-side sampler consumes only the run seed). If corner is
high-variance under sparse supervision, that itself is the finding and
the hybrid default stands on firmer ground; if all three land ~26-27 dB
the 15.9 was an infra artifact (it regenerated the scene on a different
process — scene is cached on disk here).

Writes /root/repo/evidence/corner_rerun_r5.json progressively.
"""

import sys as _sys
for _k in [k for k in _sys.modules if k.startswith("uncertainty_nerf_gs_tpu")]:
    del _sys.modules[_k]

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

OUT = Path("/root/repo/evidence/corner_rerun_r5.json")
results: dict = {"_meta": {
    "scene": "12-view 64x64 procedural sparse scene, 2k iters",
    "history": {"r2_corner": 26.81, "r3_regenerated_corner": 15.9,
                "hybrid_facereg1.0_default": 28.71},
}}

RUNS = [("corner", s) for s in (0, 1, 2)] + [("hybrid", 0)]
for layout, seed in RUNS:
    tag = f"{layout}_seed{seed}"
    try:
        d = WORK / f"sparse_{layout}_rerun_r5_s{seed}"
        ov = dict(suite.SPARSE_OVERRIDES, grid_layout=layout)
        if layout == "hybrid":
            ov["face_consistency_mult"] = 1.0
        if not list(d.glob("step-*.ckpt")):
            train_main([
                "nerfacto", "--data", str(scene), "--dataparser",
                "blender-data", "--output-dir", str(d),
                "--max-num-iterations", "2000", "--steps-per-save", "2000",
                "--seed", str(seed), "--log-every", "500",
                "--camera-opt", "off", "--overrides", json.dumps(ov),
            ])
        out = eval_main([
            "--load-config", str(d),
            "--output-path", str(d / "metrics.json"),
        ])
        results[tag] = {k: round(out["results"][k], 3)
                        for k in ("psnr", "ssim")}
        print(f"{tag}: psnr={out['results']['psnr']:.2f}", flush=True)
    except Exception as e:
        import traceback; traceback.print_exc()
        results[tag] = f"ERROR: {e}"[:300]
    OUT.write_text(json.dumps(results, indent=2) + "\n")
    import jax
    jax.clear_caches()

print("JOB_438_DONE", flush=True)
