"""Persistent TPU job worker — ONE process for all TPU work in a round.

The axon tunnel wedges ~15-20 min after TPU process churn (see memory
notes), so instead of one process per experiment, this worker stays alive
and executes job files sequentially in-process:

  * drop `NNN_name.py` into /tmp/tpu_jobs/queue — picked up in sorted
    order, exec'd with a fresh module namespace (`__name__ == "__main__"`),
    stdout going to /tmp/tpu_jobs/logs/NNN_name.log;
  * on completion the job moves to done/ (or failed/ with traceback);
  * drop a file named STOP to shut the worker down cleanly.

Jobs share the process's jax runtime; anything they leave in module caches
persists (by design — remote-compile caches stay warm).
"""

from __future__ import annotations

import contextlib
import io
import sys
import time
import traceback
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

ROOT = Path("/tmp/tpu_jobs")
QUEUE = ROOT / "queue"
DONE = ROOT / "done"
FAILED = ROOT / "failed"
LOGS = ROOT / "logs"


class Tee(io.TextIOBase):
    def __init__(self, *streams):
        self.streams = streams

    def write(self, s):
        for st in self.streams:
            st.write(s)
            st.flush()
        return len(s)

    def flush(self):
        for st in self.streams:
            st.flush()


def run_job(path: Path) -> None:
    log_path = LOGS / (path.stem + ".log")
    src = path.read_text()
    print(f"[worker] running {path.name} -> {log_path}", flush=True)
    t0 = time.perf_counter()
    g: dict = {}
    with open(log_path, "w") as lf:
        tee = Tee(sys.__stdout__, lf)
        try:
            code = compile(src, str(path), "exec")
            g.update({"__name__": "__main__", "__file__": str(path)})
            with contextlib.redirect_stdout(tee), contextlib.redirect_stderr(tee):
                exec(code, g)
            dest = DONE / path.name
            status = "done"
        except BaseException:
            with open(log_path, "a") as lf2:
                lf2.write(traceback.format_exc())
            sys.__stdout__.write(traceback.format_exc())
            dest = FAILED / path.name
            status = "FAILED"
    path.rename(dest)
    print(
        f"[worker] {path.name}: {status} in {time.perf_counter()-t0:.0f}s",
        flush=True,
    )
    _release_device_memory(g)


def _release_device_memory(job_globals: dict) -> None:
    """Free everything a finished job left on the chip.

    Jobs exec in ONE long-lived process (the axon tunnel wedges on process
    churn), so device arrays referenced by job globals / jit caches pile
    up across jobs; round 3 lost a whole queue to a RESOURCE_EXHAUSTED
    cascade after one job OOM'd. Jobs don't share device state (anything
    persistent lives on disk), so between jobs every live array is
    garbage: drop the job's namespace, clear jit caches, delete whatever
    buffers remain.
    """
    import gc
    import sys as _sys

    job_globals.clear()
    # Purge repo modules so the NEXT job re-imports current source — code
    # edits land without worker restarts (process churn wedges the tunnel
    # ~15 min). Jobs must not rely on repo-module state across jobs
    # (persistent state lives on disk by contract).
    for name in [m for m in _sys.modules if m.startswith("uncertainty_nerf_gs_tpu")]:
        del _sys.modules[name]
    try:
        import jax

        jax.clear_caches()
        gc.collect()
        leaked = 0
        for arr in jax.live_arrays():
            try:
                arr.delete()
                leaked += 1
            except Exception:
                pass
        gc.collect()
        if leaked:
            print(f"[worker] freed {leaked} leaked device arrays", flush=True)
    except Exception as e:  # cleanup must never kill the worker
        print(f"[worker] cleanup error (continuing): {e}", flush=True)


def _tunnel_up() -> bool:
    """True iff the axon relay is listening (r5: the relay process died
    mid-round and every queued TPU job either hung forever or burned into
    failed/ with Connection-refused — gate the queue on a cheap TCP probe
    instead)."""
    import socket

    try:
        with socket.create_connection(("127.0.0.1", 8083), timeout=2):
            return True
    except OSError:
        return False


def main() -> None:
    for d in (QUEUE, DONE, FAILED, LOGS):
        d.mkdir(parents=True, exist_ok=True)
    waited = 0
    while not _tunnel_up():
        if waited % 600 == 0:
            print(f"[worker] axon relay not listening on :8083 — waiting "
                  f"({waited // 60} min)", flush=True)
        time.sleep(30)
        waited += 30
    # warm the runtime once so the first job doesn't pay tunnel setup
    import jax
    import jax.numpy as jnp

    print("[worker] probing device...", flush=True)
    print("[worker] device ok:", float(jnp.ones((8, 128)).sum()),
          jax.devices(), flush=True)
    while True:
        stop = ROOT / "STOP"
        if stop.exists():
            stop.unlink()
            print("[worker] STOP — exiting", flush=True)
            return
        jobs = sorted(QUEUE.glob("*.py"))
        if jobs and not _tunnel_up():
            print("[worker] tunnel down — holding queue", flush=True)
            time.sleep(30)
            continue
        if jobs:
            run_job(jobs[0])
        else:
            time.sleep(5)


if __name__ == "__main__":
    main()
