"""Quantify the splat depth-variance semantic deviation (VERDICT r3 #6):
run the reference-indirection oracle vs the in-pass moments on the trained
16k active-splatfacto soak checkpoint (job 350) and commit the comparison.

Writes /root/repo/evidence/depth_var_compare_r4.json.
"""

import sys as _sys
for _k in [k for k in _sys.modules if k.startswith("uncertainty_nerf_gs_tpu")]:
    del _sys.modules[_k]  # long-lived worker: force fresh package code


import sys
from pathlib import Path

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/experiments")

from depth_var_oracle import compare_on_run

run = Path("/root/repo/.soak/r3/soak_active-splatfacto")
if not list(run.glob("step-*.ckpt")):
    # fall back to any trained splat run under .soak
    cands = [d for d in Path("/root/repo/.soak").rglob("soak_*splatfacto*")
             if list(d.glob("step-*.ckpt"))]
    assert cands, "no trained splat checkpoint found — run job 350 first"
    run = cands[0]
print("comparing on", run, flush=True)
compare_on_run(run, Path("/root/repo/evidence/depth_var_compare_r4.json"))
print("JOB_355_DONE", flush=True)
