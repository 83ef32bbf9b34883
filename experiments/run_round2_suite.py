"""Run the remaining round-2 TPU experiments in ONE process (the axon
tunnel wedges on rapid process churn): stride-quality validation,
cell-vs-corner layout quality, splat densification schedule, and the
driver bench — in that order, each step logged and failures isolated."""

from __future__ import annotations

import subprocess
import sys
import traceback

sys.path.insert(0, "/root/repo")


def step(name, fn):
    print(f"\n===== {name} =====", flush=True)
    try:
        fn()
    except Exception:
        traceback.print_exc()
        print(f"[{name}] FAILED (continuing)", flush=True)


def stride_quality():
    import experiments.stride_quality as m

    sys.argv = ["x", "--workdir", "/tmp/parity3"]
    m.main()


def layout_quality():
    import experiments.layout_quality as m

    sys.argv = ["x", "--iters", "1500", "--workdir", "/tmp/layoutq"]
    m.main()


def splat_schedule():
    import experiments.splat_schedule as m

    sys.argv = ["x", "--steps", "1200", "--workdir", "/tmp/splat_sched"]
    m.main()


def bench():
    import bench as b

    b.main()


if __name__ == "__main__":
    step("stride_quality", stride_quality)
    step("layout_quality", layout_quality)
    step("splat_schedule", splat_schedule)
    step("bench", bench)
    print("\nSUITE DONE", flush=True)
