"""Validate the anchor-strided proposal evaluation on trained models:
render the parity ensemble's eval views with stride on vs off and compare
PSNR-to-GT plus the AUSE/std outputs (the deviation the fused render's
default enables must be visually and metrically negligible)."""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", default="/tmp/parity3")
    args = ap.parse_args()

    import jax.numpy as jnp

    from uncertainty_nerf_gs_tpu.metrics import psnr
    from uncertainty_nerf_gs_tpu.metrics.ause import ause
    from uncertainty_nerf_gs_tpu.models.ensemble import stack_params
    from uncertainty_nerf_gs_tpu.parallel.ensemble_fused import (
        build_fused_ensemble_render,
        pack_ensemble_tables,
    )
    from uncertainty_nerf_gs_tpu.scripts.eval_uncertainty import (
        _eval_cameras_and_images,
        _load_run,
        _nerfacto_full_image_renderer,
    )

    work = Path(args.workdir)
    run_dirs = [work / "run_ens_m1", work / "run_ens_m2"]
    trainers = []
    for d in run_dirs:
        t, s, run_cfg, _ = _load_run(d)
        trainers.append(t)
    eval_outputs, eval_images = _eval_cameras_and_images(run_cfg)
    base = trainers[0]
    stacked = stack_params(
        [{k: v for k, v in t.state.params.items() if k != "camera_opt"}
         for t in trainers]
    )
    packed = pack_ensemble_tables(base.model, stacked, table_dtype=jnp.bfloat16)

    rows = []
    for stride in (False, True):
        fused = build_fused_ensemble_render(
            base.model, proposal_anchor_stride=stride
        )

        def chunk_fn(rb, fused=fused):
            return fused(stacked, packed, rb)

        render = _nerfacto_full_image_renderer(base, chunk_fn, eval_outputs.cameras)
        outs = [render(i) for i in range(len(eval_images))]
        ps = [float(psnr(o["rgb"], jnp.asarray(g[..., :3])))
              for o, g in zip(outs, eval_images)]
        ause_vals = []
        for o, g in zip(outs, eval_images):
            err = jnp.sum((o["rgb"] - jnp.asarray(g[..., :3])) ** 2, -1).reshape(-1)
            var = (o["rgb_std"] ** 2).reshape(-1)
            ause_vals.append(float(ause(var, err, "rmse")[3]))
        rows.append((stride, outs, float(np.mean(ps)), float(np.mean(ause_vals))))
        print(f"stride={stride}: psnr={np.mean(ps):.3f} ause_rmse={np.mean(ause_vals):.4f}")

    # render-to-render agreement
    diffs = [float(jnp.abs(a["rgb"] - b["rgb"]).max())
             for a, b in zip(rows[0][1], rows[1][1])]
    cross = [float(psnr(a["rgb"], b["rgb"])) for a, b in zip(rows[0][1], rows[1][1])]
    print(f"exact-vs-strided: max|drgb|={max(diffs):.4f}  "
          f"cross-psnr={np.mean(cross):.2f} dB  "
          f"dPSNR={rows[1][2]-rows[0][2]:+.3f}  dAUSE={rows[1][3]-rows[0][3]:+.5f}")
    (Path(args.workdir) / "stride_quality.json").write_text(json.dumps({
        "psnr_exact": rows[0][2], "psnr_strided": rows[1][2],
        "ause_exact": rows[0][3], "ause_strided": rows[1][3],
        "cross_psnr": float(np.mean(cross)),
    }, indent=2))


if __name__ == "__main__":
    main()
