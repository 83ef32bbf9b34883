"""Commit the 30k nerfacto soak's curves as evidence (VERDICT r3 #3a)."""
import sys
from pathlib import Path

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/experiments")

from soak_evidence import summarize
import json

run = Path("/root/repo/.soak/r3/nerfacto_soak")
out = summarize(run, "active-nerfacto 30k soak, reference scale, bf16")
p = Path("/root/repo/evidence/soak30k_nerfacto_r4.json")
p.write_text(json.dumps(out, indent=2) + "\n")
print("wrote", p, "max_step", out["max_step"], "nan_free", out["nan_free"],
      flush=True)
print("JOB_345_DONE", flush=True)
