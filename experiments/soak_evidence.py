"""Summarize a training run's events.jsonl into a committed evidence JSON
(VERDICT r3 #3: anything worth citing must live under evidence/, not /tmp).

Extracts the loss/PSNR curves (downsampled), NaN checks, and step coverage.

Usage: python experiments/soak_evidence.py <run_dir> <out_json> [label]
"""

from __future__ import annotations

import json
import math
import sys
from pathlib import Path


def summarize(run_dir: Path, label: str = "") -> dict:
    events = run_dir / "events.jsonl"
    rows = []
    with open(events) as f:
        for line in f:
            line = line.strip()
            if line:
                rows.append(json.loads(line))
    if rows and "name" in rows[0] and "value" in rows[0]:
        # ScalarWriter long format {"step", "name", "value", "wall"}:
        # pivot to wide per-step rows
        wide: dict[int, dict] = {}
        for r in rows:
            wide.setdefault(r["step"], {"step": r["step"]})[r["name"]] = r[
                "value"
            ]
        rows = [wide[s] for s in sorted(wide)]
    steps = [r["step"] for r in rows]
    keys = sorted({k for r in rows for k in r if k != "step"})
    curves: dict[str, list] = {}
    nonfinite = {}
    for k in keys:
        pts = [(r["step"], r[k]) for r in rows if k in r]
        bad = [s for s, v in pts if not math.isfinite(v)]
        if bad:
            nonfinite[k] = bad[:20]
        # downsample to <=200 points, always keeping the last
        stride = max(1, len(pts) // 200)
        kept = pts[::stride]
        if kept[-1] != pts[-1]:
            kept.append(pts[-1])
        curves[k] = [[s, round(v, 6)] for s, v in kept]
    ckpts = sorted(int(p.name[5:14]) for p in run_dir.glob("step-*.ckpt"))
    out = {
        "label": label or run_dir.name,
        "run_dir": str(run_dir),
        "max_step": max(steps) if steps else 0,
        "checkpoints": ckpts,
        "nan_free": not nonfinite,
        "nonfinite_steps": nonfinite,
        "final": {k: curves[k][-1][1] for k in keys},
        "curves": curves,
    }
    return out


def main() -> None:
    run_dir = Path(sys.argv[1])
    out_json = Path(sys.argv[2])
    label = sys.argv[3] if len(sys.argv) > 3 else ""
    out = summarize(run_dir, label)
    out_json.parent.mkdir(parents=True, exist_ok=True)
    out_json.write_text(json.dumps(out, indent=2) + "\n")
    print(f"wrote {out_json}: max_step={out['max_step']} "
          f"nan_free={out['nan_free']} final={out['final']}")


if __name__ == "__main__":
    main()
