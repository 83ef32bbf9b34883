"""Commit the 16k splat soaks' curves as evidence (VERDICT r3 #3b)."""
import sys
from pathlib import Path

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/experiments")

from soak_evidence import summarize
import json

for method in ("splatfacto", "active-splatfacto"):
    run = Path(f"/root/repo/.soak/r3/soak_{method}")
    if not (run / "events.jsonl").exists():
        print("missing", run, flush=True)
        continue
    out = summarize(run, f"{method} 16k soak, full refine schedule")
    p = Path(f"/root/repo/evidence/splat_soak16k_{method}_r4.json")
    p.write_text(json.dumps(out, indent=2) + "\n")
    print("wrote", p, "max_step", out["max_step"], "nan_free",
          out["nan_free"], flush=True)
print("JOB_352_DONE", flush=True)
