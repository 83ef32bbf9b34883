"""Driver-bench dryrun right after the r5 gate lands (r5 continuation).

bench.py keys its headline on evidence/int8_stride_quality_r5.json; a
selection bug at the driver's round-end run would be unrecoverable, so
run it here, record the lines, and commit them as evidence.
"""

import sys as _sys
for _k in [k for k in _sys.modules if k.startswith("uncertainty_nerf_gs_tpu")]:
    del _sys.modules[_k]

import io
import json
import contextlib
import runpy
import subprocess
import sys
from pathlib import Path

sys.path.insert(0, "/root/repo")

buf = io.StringIO()


class Tee(io.TextIOBase):
    def write(self, s):
        buf.write(s)
        sys.__stdout__.write(s)
        return len(s)


sys.argv = ["bench.py"]
with contextlib.redirect_stdout(Tee()):
    runpy.run_path("/root/repo/bench.py", run_name="__main__")

lines = [json.loads(l) for l in buf.getvalue().splitlines()
         if l.strip().startswith("{")]
OUT = Path("/root/repo/evidence/bench_dryrun_r5cont.json")
OUT.write_text(json.dumps({"lines": lines}, indent=2) + "\n")
subprocess.run(["git", "-C", "/root/repo", "add", str(OUT)], check=True)
subprocess.run(
    ["git", "-C", "/root/repo", "commit", "-m",
     "Evidence: driver-bench dryrun after the r5 gate (r5 continuation)"],
    check=False)
print("JOB_531_DONE", flush=True)
