"""Convert official LPIPS (AlexNet) torch weights to the `.npz` format
consumed by ``ops/lpips.py::load_params``.

The reference reports LPIPS through torchmetrics' AlexNet-backbone LPIPS
(`/root/reference/nerfuncertainty/scripts/eval_uncertainty.py:685`). This
image has no pretrained weights (zero egress), so official-scale numbers
require running this converter once on a machine that has either:

  * the ``lpips`` pip package (Zhang et al. reference implementation), or
  * ``torchmetrics[image]`` (same weights via torchvision + lpips heads).

Usage:
    python -m uncertainty_nerf_gs_tpu.scripts.convert_lpips_weights \
        --output lpips_alex.npz

Output keys (see ``ops/lpips.py::load_params``): ``conv{i}_w`` with shape
(out, in, kh, kw), ``conv{i}_b`` (out,), ``lin{i}`` (out,) for i in 0..4 —
the five AlexNet feature stages and their linear calibration heads.
Pass the file to the evaluator via ``--lpips-weights``; without it, scores
are reported as ``lpips_rand`` (random-feature proxy), never ``lpips``.
"""

from __future__ import annotations

import argparse

import numpy as np


def convert_from_lpips_package(net: str = "alex") -> dict[str, np.ndarray]:
    """Extract conv + linear-head weights from the `lpips` pip package."""
    import lpips as lpips_pkg  # type: ignore
    import torch

    model = lpips_pkg.LPIPS(net=net)
    out: dict[str, np.ndarray] = {}
    # AlexNet features: conv layers live at indices 0,3,6,8,10 of .net.slices
    convs = [
        m for m in model.net.modules() if isinstance(m, torch.nn.Conv2d)
    ]
    lins = [lin.model[1] for lin in model.lins]  # Dropout, Conv1x1
    assert len(convs) == 5 and len(lins) == 5, (len(convs), len(lins))
    for i, (conv, lin) in enumerate(zip(convs, lins)):
        out[f"conv{i}_w"] = conv.weight.detach().numpy()
        out[f"conv{i}_b"] = conv.bias.detach().numpy()
        out[f"lin{i}"] = lin.weight.detach().numpy().reshape(-1)
    return out


def main(argv: list[str] | None = None) -> None:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--output", required=True, help="output .npz path")
    ap.add_argument("--net", default="alex", choices=["alex"])
    args = ap.parse_args(argv)
    weights = convert_from_lpips_package(args.net)
    np.savez(args.output, **weights)
    print(f"wrote {args.output}: " + ", ".join(sorted(weights)))


if __name__ == "__main__":
    main()
