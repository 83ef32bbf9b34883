"""Dry-run the driver bench end-to-end inside the worker (the r4 headline
selection + fold wiring are new; a failure at the driver's round-end run
would be unrecoverable). Prints the same JSON lines bench.py emits."""

import sys as _sys
for _k in [k for k in _sys.modules if k.startswith("uncertainty_nerf_gs_tpu")]:
    del _sys.modules[_k]

import runpy
import sys

sys.path.insert(0, "/root/repo")
sys.argv = ["bench.py"]
runpy.run_path("/root/repo/bench.py", run_name="__main__")
print("JOB_360_DONE", flush=True)
