"""Opportunistic 30k-soak extension, dynamic targets (VERDICT r4 #4) — runs only if the
gate pipeline drains early. Seeds from member0@12000 (same config/seed as
the reference-budget schedule), trains in SHORT segments with progressive
evidence + git commit after each, so whatever lands before session end is
preserved. Resumable by re-queuing.
"""

import json
import math
import shutil
import subprocess
from pathlib import Path

import sys
sys.path.insert(0, "/root/repo")
for m in [k for k in sys.modules if k.startswith("uncertainty_nerf_gs_tpu")]:
    del sys.modules[m]

from uncertainty_nerf_gs_tpu.scripts.train import main as train_main

SRC = Path("/root/repo/.soak/quality2k")
D = Path("/root/repo/.soak/r5/nerfacto_soak30k")
OUT = Path("/root/repo/evidence/soak30k_nerfacto_r5.json")
TOTAL = 30000

OVERRIDES = {
    "use_appearance_embedding": False,
    "near_plane": 0.5,
    "far_plane": 4.5,
    "background_color": "white",
    "use_scene_contraction": False,
    "eval_num_rays_per_chunk": 1 << 12,
    "mixed_precision": True,
}

D.mkdir(parents=True, exist_ok=True)
if not list(D.glob("step-*.ckpt")):
    src_ckpt = SRC / "member0" / "step-000012000.ckpt"
    assert src_ckpt.exists(), "member0 @12000 missing"
    shutil.copytree(src_ckpt, D / "step-000012000.ckpt")
    print("seeded from member0 step-12000", flush=True)


def summarize():
    curve: dict[int, dict] = {}
    nonfinite = []
    events = [json.loads(l) for f in (SRC / "member0" / "events.jsonl",
                                      D / "events.jsonl") if f.exists()
              for l in f.open()]
    for e in events:
        if not math.isfinite(e["value"]):
            nonfinite.append(e)
        if e["step"] % 1000 == 0 or e["name"].startswith("eval"):
            curve.setdefault(e["step"], {})[e["name"]] = round(e["value"], 5)
    last = max(curve)
    OUT.write_text(json.dumps({
        "_meta": {
            "run": "active-nerfacto, reference scale + 30k schedule "
                   "(laplace_config.py:27), 40-view 64x64 procedural scene; "
                   "steps 0-12000 are gate member0 (job 510), rest fresh "
                   "(seeded from its checkpoint). Short segments with "
                   "progressive committed evidence — the r5 host wipe ate "
                   "two prior attempts' checkpoints.",
            "final_step": last,
            "target_step": TOTAL,
            "complete": last >= TOTAL,
            "nonfinite_events": len(nonfinite),
        },
        "final_metrics": curve[last],
        "curve": {str(k): curve[k] for k in sorted(curve)},
    }, indent=2) + "\n")
    subprocess.run(["git", "-C", "/root/repo", "add", str(OUT)], check=True)
    subprocess.run(
        ["git", "-C", "/root/repo", "commit", "-m",
         f"Evidence: 30k soak progressive curve to step {last} "
         f"(nonfinite={len(nonfinite)})"], check=False)
    print("summarized to step", last, "nonfinite", len(nonfinite), flush=True)
    return last, nonfinite


# bounded to two segments per queue run (session-end clock); targets are
# computed from the CURRENT checkpoint so re-queued copies keep advancing
# toward 30000 (the fixed-target version capped out at 18000)
_cur = sorted(int(p.name[5:14]) for p in D.glob("step-*.ckpt"))[-1]
for target in (min(_cur + 3000, TOTAL), min(_cur + 6000, TOTAL)):
    steps = sorted(int(p.name[5:14]) for p in D.glob("step-*.ckpt"))
    if steps[-1] < target:
        print("resuming from", steps[-1], "target", target, flush=True)
        train_main([
            "active-nerfacto", "--data", str(SRC / "scene"), "--dataparser",
            "blender-data", "--output-dir", str(D), "--load-dir", str(D),
            "--max-num-iterations", str(target), "--steps-per-save", "3000",
            "--seed", "0", "--log-every", "1000", "--camera-opt", "off",
            "--overrides", json.dumps(OVERRIDES),
        ])
    last, nonfinite = summarize()

print("JOB_550_DONE", flush=True)
