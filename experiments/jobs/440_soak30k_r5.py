"""30k reference-budget soak, round 5 (VERDICT r4 #4 / Missing #2).

The reference trains 30k iterations (laplace_config.py:27). Prior
attempts: r3 died at 26k with the relay (ckpts in /tmp, wiped); r4 was
dropped for ~15-min tunnel checkpoint saves. This run:
  * seeds from a COPY of gate member0's step-12000 checkpoint (same
    scene/config/seed) so only 18k fresh steps are needed (~115 min at
    the measured 2.65 steps/s) — member0 itself stays at 12000 so the
    5-member gate substrate remains symmetric;
  * checkpoints under /root/repo/.soak/r5/nerfacto_soak30k (reboot-safe),
    saves at 6000-step cadence (3 tunnel saves total);
  * on completion, summarizes events.jsonl into
    evidence/soak30k_nerfacto_r5.json: per-1000-step loss curve, NaN scan,
    eval-image PSNR curve, wall-clock. Resumable by re-queuing.
"""

import json
import math
import shutil
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
    """Progressive evidence: called after every training segment so a
    round-end interruption still leaves a committed partial curve."""
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
                   "steps 0-12000 are gate member0 (job 310), 12000-30000 "
                   "fresh (this job, seeded from its checkpoint)",
            "final_step": last,
            "target_step": TOTAL,
            "complete": last >= TOTAL,
            "nonfinite_events": len(nonfinite),
        },
        "final_metrics": curve[last],
        "curve": {str(k): curve[k] for k in sorted(curve)},
    }, indent=2) + "\n")
    print("summarized to step", last, "nonfinite", len(nonfinite), flush=True)
    return last, nonfinite


for target in (18000, 24000, 30000):
    steps = sorted(int(p.name[5:14]) for p in D.glob("step-*.ckpt"))
    print("resuming from", steps[-1], "target", target, flush=True)
    if steps[-1] < target:
        train_main([
            "active-nerfacto", "--data", str(SRC / "scene"), "--dataparser",
            "blender-data", "--output-dir", str(D), "--load-dir", str(D),
            "--max-num-iterations", str(target), "--steps-per-save", "6000",
            "--steps-per-eval-image", "3000",
            "--seed", "0", "--log-every", "1000", "--camera-opt", "off",
            "--overrides", json.dumps(OVERRIDES),
        ])
    last, nonfinite = summarize()

assert last >= TOTAL and not nonfinite
print("JOB_440_DONE", flush=True)
