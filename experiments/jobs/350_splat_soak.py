"""16k-iter splat soaks (plain + active) — full refine schedule incl.
stop_split_at=15000 and opacity resets, with the round-3 NaN fix
(safe-sqrt compensation grad + non-finite-slot cull) and the
budget-capped densification. White background so train-view PSNR is
readable (STATUS.md splat-soak root-cause note).

Workdir /root/repo/.soak/r3 — survives host reboots (/tmp does not).
"""

import sys
from pathlib import Path

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/experiments")

import r3_soak_suite as suite

suite.WORK = Path("/root/repo/.soak/r3")
suite.WORK.mkdir(parents=True, exist_ok=True)
suite.step("splat_soak", suite.splat_soak)
print("JOB_210_DONE", flush=True)
