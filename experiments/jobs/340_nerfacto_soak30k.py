"""30k-iter active-nerfacto soak at reference scale (VERDICT r2 #3a).

The previous attempt reached step 26000 NaN-free before the axon relay
died; its checkpoints lived in /tmp and were wiped by the host reboot,
so this is a fresh, RESUMABLE run: checkpoints every 2000 steps under
/root/repo/.soak/r3/nerfacto_soak (reboot-safe), and the suite's
nerfacto_soak() auto-resumes from the latest step-*.ckpt if re-queued.
"""

import sys
from pathlib import Path

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/experiments")

import r3_soak_suite as suite

suite.WORK = Path("/root/repo/.soak/r3")
suite.WORK.mkdir(parents=True, exist_ok=True)
suite.step("nerfacto_soak", suite.nerfacto_soak)
print("JOB_220_DONE", flush=True)
