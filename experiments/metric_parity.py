"""AUSE/AUCE/NLL parity experiment (VERDICT r1 item 2).

Trains active-nerfacto, nerfacto-mcdropout, nerfacto-laplace and a 2-member
nerfacto ensemble on the procedural Blender-style scene (no external data in
this environment), evaluates each through the real `ut-eval-unc` harness,
then recomputes AUSE (mae/mse/rmse), AUCE (abs/len/neg) and NLL from the
dumped raw renders with `tests/reference_oracles.py` — literal numpy
transcriptions of the reference's metric math — and reports the relative
difference per metric. Writes PARITY.md at the repo root.

Run:  python experiments/metric_parity.py [--iters 2000] [--out PARITY.md]
(the TPU chip trains each method in a few minutes at these settings).
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "tests"))

from reference_oracles import ause_reference, auce_reference, nll_reference

# reduced-but-real model scale: full proposal hierarchy + hash grids; sizes
# trimmed so four 2k-iteration trainings fit one bench session.
OVERRIDES = {
    "num_proposal_samples": (64, 32),
    "num_nerf_samples": 24,
    "num_levels": 8,
    "max_res": 512,
    "log2_hashmap_size": 15,
    "use_appearance_embedding": False,
    "near_plane": 0.5,
    "far_plane": 4.5,
    "background_color": "white",
    "use_scene_contraction": False,
    "eval_num_rays_per_chunk": 1 << 12,
    "proposal_net_args": (
        dict(num_levels=4, max_res=64, log2_hashmap_size=13, hidden_dim=16),
        dict(num_levels=4, max_res=128, log2_hashmap_size=13, hidden_dim=16),
    ),
}

METHODS = [
    ("active-nerfacto", {}),
    ("nerfacto-mcdropout", {}),
    ("nerfacto-laplace", {}),
]


def oracle_metrics_from_raw(raw_dir: Path) -> dict[str, float]:
    """Reference-math metrics averaged over the dumped eval images."""
    per_image: list[dict[str, float]] = []
    for f in sorted(raw_dir.glob("raw_*.npz")):
        z = np.load(f)
        rgb, gt = z["rgb"], z["gt"]
        std = z["rgb_std"].reshape(rgb.shape[:2])
        sq = ((rgb - gt) ** 2).sum(-1).reshape(-1)
        ab = np.abs(rgb - gt).sum(-1).reshape(-1)
        var = (std**2).reshape(-1)
        m = {
            "rgb_ause_mae": ause_reference(var, ab, "mae")[3],
            "rgb_ause_mse": ause_reference(var, sq, "mse")[3],
            "rgb_ause_rmse": ause_reference(var, sq, "rmse")[3],
            "nll_rgb": float(np.mean(nll_reference(rgb, gt, std, eps=3e-2))),
        }
        std3 = np.repeat(std.reshape(-1, 1), 3, axis=1).reshape(-1)
        a = auce_reference(rgb.reshape(-1), std3, gt.reshape(-1))
        m["rgb_auce_abs"] = float(a["auc_abs_error_values"])
        m["rgb_auce_length"] = float(a["auc_length_values"])
        m["rgb_auce_neg"] = float(a["auc_neg_error_values"])
        per_image.append(m)
    keys = per_image[0].keys()
    return {k: float(np.mean([m[k] for m in per_image])) for k in keys}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=2000)
    ap.add_argument("--workdir", default="/tmp/parity")
    ap.add_argument("--out", default=str(Path(__file__).parents[1] / "PARITY.md"))
    args = ap.parse_args()

    from uncertainty_nerf_gs_tpu.data.synthetic import write_blender_dataset
    from uncertainty_nerf_gs_tpu.scripts.eval_uncertainty import main as eval_main
    from uncertainty_nerf_gs_tpu.scripts.train import main as train_main

    work = Path(args.workdir)
    scene = work / "scene"
    if not scene.exists():
        write_blender_dataset(scene, num_train=40, num_test=3, height=64, width=64)

    rows = []
    results: dict[str, dict] = {}

    def train(method: str, seed: int, name: str) -> Path:
        d = work / f"run_{name}"
        if not list(d.glob("step-*.ckpt")):
            train_main([
                method, "--data", str(scene), "--dataparser", "blender-data",
                "--output-dir", str(d), "--max-num-iterations", str(args.iters),
                "--steps-per-save", str(args.iters), "--seed", str(seed),
                "--log-every", "500", "--camera-opt", "off", "--overrides", json.dumps(OVERRIDES),
            ])
        return d

    def evaluate(name: str, load_dirs: list[Path], extra: list[str] = ()):
        raw = work / f"raw_{name}"
        out = eval_main([
            *sum([["--load-config", str(d)] for d in load_dirs], []),
            "--output-path", str(work / f"metrics_{name}.json"),
            "--render-output-path", str(raw),
            "--save-raw-outputs", *extra,
        ])
        ours = out["results"]
        oracle = oracle_metrics_from_raw(raw)
        results[name] = {"ours": ours, "oracle": oracle}
        for k, ov in oracle.items():
            mine = ours.get(k)
            if mine is None:
                continue
            denom = max(abs(ov), 1e-12)
            rel = abs(mine - ov) / denom
            rows.append((name, k, mine, ov, rel))

    for method, _ in METHODS:
        d = train(method, 0, method)
        evaluate(method, [d])
    e1 = train("nerfacto", 1, "ens_m1")
    e2 = train("nerfacto", 2, "ens_m2")
    evaluate("ensemble2", [e1, e2])

    # ------------------------------------------------------------- report
    lines = [
        "# Metric parity vs the reference's math (round 2)",
        "",
        "Four methods trained on the procedural Blender-style scene "
        f"({args.iters} iters, reduced-but-real configs), evaluated through "
        "`ut-eval-unc`, then AUSE/AUCE/NLL recomputed from the SAME raw "
        "renders with literal numpy transcriptions of the reference's "
        "metric code (`tests/reference_oracles.py` — "
        "`/root/reference/nerfuncertainty/metrics/ause.py:7-44`, "
        "`auce.py:10-57`, `eval_uncertainty.py:404-412`).",
        "",
        "| method | metric | ours | reference math | rel diff |",
        "|---|---|---|---|---|",
    ]
    worst = 0.0
    for name, k, mine, ov, rel in rows:
        worst = max(worst, rel)
        lines.append(f"| {name} | {k} | {mine:.6f} | {ov:.6f} | {rel*100:.3f}% |")
    lines += [
        "",
        f"**Worst relative difference: {worst*100:.3f}%** "
        "(BASELINE.json tolerance: 1%).",
        "",
        "PSNR per method (plausibility / ordering):",
        "",
    ]
    for name, r in results.items():
        lines.append(
            f"- {name}: psnr={r['ours']['psnr']:.2f}, "
            f"ause_rmse={r['ours'].get('rgb_ause_rmse', float('nan')):.4f}, "
            f"nll={r['ours'].get('nll_rgb', float('nan')):.3f}"
        )
    Path(args.out).write_text("\n".join(lines) + "\n")
    print("\n".join(lines))
    assert worst < 0.01, f"parity worse than 1%: {worst}"
    print(f"\nPARITY OK (worst {worst*100:.3f}%) -> {args.out}")


if __name__ == "__main__":
    main()
