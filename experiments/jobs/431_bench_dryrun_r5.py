"""Dry-run the driver bench end-to-end inside the worker right after the
r5 gate lands: bench.py now keys its headline on
evidence/int8_stride_quality_r5.json (full AUSE/AUCE+depth criterion) and
adopts the rule-v2 table split per (dtype, stride) from
evidence/table_split_incontext_r5.json — a selection bug at the driver's
round-end run would be unrecoverable. Prints bench.py's JSON lines."""

import sys as _sys
for _k in [k for k in _sys.modules if k.startswith("uncertainty_nerf_gs_tpu")]:
    del _sys.modules[_k]

import runpy
import sys

sys.path.insert(0, "/root/repo")
sys.argv = ["bench.py"]
runpy.run_path("/root/repo/bench.py", run_name="__main__")
print("JOB_431_DONE", flush=True)
