"""Copy round-3 measurement artifacts from the /tmp workdirs into the
repo's evidence/ directory so they survive the round (the host wiped /tmp
mid-round once already — STATUS.md curves lost their backing files).

Idempotent; copies only known JSON/metric artifacts (small), never
checkpoints or images.
"""

from __future__ import annotations

import shutil
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
EVIDENCE = REPO / "evidence"

SOURCES = [
    "/tmp/r3_soak/bench_201.json",
    "/tmp/r3_soak/gather_study.json",
    "/tmp/r3_soak/gather_cliff_205d.json",
    "/tmp/r3_soak/pdf_micro_205c.json",
    "/tmp/r3_soak/pdf_v2_205f.json",
    "/tmp/r3_soak/pdf_v2_208.json",
    "/tmp/r3_soak/int8_bench_209.json",
    "/tmp/r3_soak/raster_sweep_202.json",
    "/tmp/r3_soak/raster_compiled_208.json",
    "/tmp/r3_soak/raster_stages_205e.json",
    "/tmp/r3_soak/launch_overhead_209c.json",
    "/tmp/r3_soak/sparse_layout_summary.json",
    "/tmp/r3_soak/sparse_metrics_hybrid_v2.json",
    "/tmp/r3_soak/sparse_metrics_corner_v2.json",
    "/tmp/r3_soak/sparse_metrics_cell_v2.json",
    "/tmp/r3_soak/sparse_metrics_hybrid_facereg.json",
    "/tmp/r3_soak/sparse_metrics_corner_rerun.json",
    "/tmp/r3_soak/stride_int8_quality.json",
]


def main() -> None:
    EVIDENCE.mkdir(exist_ok=True)
    copied = []
    for src in SOURCES:
        p = Path(src)
        if p.exists():
            shutil.copy2(p, EVIDENCE / p.name)
            copied.append(p.name)
    # training logs: last 40 lines of each soak job log (curves)
    logs = Path("/tmp/tpu_jobs/logs")
    if logs.exists():
        for lg in sorted(logs.glob("*.log")):
            txt = lg.read_text(errors="replace")
            lines = [
                ln for ln in txt.splitlines()
                if ("step " in ln and "loss" in ln) or "psnr" in ln
            ]
            if lines:
                (EVIDENCE / f"curve_{lg.stem}.txt").write_text(
                    "\n".join(lines[-200:]) + "\n"
                )
                copied.append(f"curve_{lg.stem}.txt")
    print("copied:", ", ".join(copied) or "(nothing)")


if __name__ == "__main__":
    main()
