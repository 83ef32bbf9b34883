"""Full-scale quality validation of the int8 eval tables and the
main-field anchor stride (the levers job 201 benches).

Trains a 2-member active-nerfacto ensemble at the reference model scale
(16 levels / 2^19 table / 256/96/48 samples) for 2k iters on the 40-view
procedural scene, then runs the ensemble eval CLI across
{bf16, int8} x {stride 0, 4, 8} and reports PSNR/AUSE deltas vs the
bf16-exact render. Pass criteria (BASELINE.md: AUSE within 1%):
dPSNR > -0.1 dB and |dAUSE| < 1% => the variant is safe as a default.

Writes /root/repo/evidence/int8_stride_quality_r3.json.
Checkpoints persist under /root/repo/.soak/quality2k (reboot-safe).
"""

import json
from pathlib import Path

import sys
sys.path.insert(0, "/root/repo")

from uncertainty_nerf_gs_tpu.data.synthetic import write_blender_dataset
from uncertainty_nerf_gs_tpu.scripts.eval_uncertainty import main as eval_main
from uncertainty_nerf_gs_tpu.scripts.train import main as train_main

WORK = Path("/root/repo/.soak/quality2k")
WORK.mkdir(parents=True, exist_ok=True)
scene = WORK / "scene"
if not scene.exists():
    write_blender_dataset(scene, num_train=40, num_test=4, height=64, width=64)

OVERRIDES = {
    "use_appearance_embedding": False,
    "near_plane": 0.5,
    "far_plane": 4.5,
    "background_color": "white",
    "use_scene_contraction": False,
    "eval_num_rays_per_chunk": 1 << 12,
    "mixed_precision": True,
}

members = []
for seed in (0, 1):
    d = WORK / f"member{seed}"
    if not list(d.glob("step-*.ckpt")):
        train_main([
            "active-nerfacto", "--data", str(scene), "--dataparser",
            "blender-data", "--output-dir", str(d),
            "--max-num-iterations", "2000", "--steps-per-save", "2000",
            "--seed", str(seed), "--log-every", "500", "--camera-opt", "off",
            "--overrides", json.dumps(OVERRIDES),
        ])
    members.append(str(d))

results = {}
for name, dtype, stride in [
    ("bf16_exact", "bf16", 0.0),
    ("int8_exact", "int8", 0.0),
    ("bf16_stride4", "bf16", 4.0),
    ("bf16_stride8", "bf16", 8.0),
    ("int8_stride4", "int8", 4.0),
    ("int8_stride8", "int8", 8.0),
]:
    out = eval_main([
        "--load-config", members[0], "--load-config", members[1],
        "--output-path", str(WORK / f"metrics_{name}.json"),
        "--table-dtype", dtype, "--main-stride-scale", str(stride),
    ])
    r = out["results"]
    results[name] = {k: r[k] for k in sorted(r)
                     if isinstance(r[k], (int, float))}
    print(name, "psnr", r.get("psnr"), "ause_mse", r.get("ause_mse"),
          flush=True)

base = results["bf16_exact"]
for name, r in results.items():
    if name == "bf16_exact":
        continue
    dpsnr = r["psnr"] - base["psnr"]
    rel_ause = {
        k: (r[k] - base[k]) / max(abs(base[k]), 1e-9)
        for k in r if "ause" in k
    }
    worst = max(abs(v) for v in rel_ause.values()) if rel_ause else 0.0
    results[name]["delta_psnr_db"] = round(dpsnr, 4)
    results[name]["worst_rel_ause"] = round(worst, 5)
    results[name]["passes"] = bool(dpsnr > -0.1 and worst < 0.01)
    print(f"{name}: dPSNR={dpsnr:+.4f} dB worst |dAUSE|={worst:.4%} "
          f"passes={results[name]['passes']}", flush=True)

out_path = Path("/root/repo/evidence/int8_stride_quality_r3.json")
out_path.write_text(json.dumps(results, indent=2))
print("wrote", out_path, flush=True)
