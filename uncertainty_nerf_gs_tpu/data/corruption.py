"""Controlled-corruption harness: noise / blur injected into TRAIN images.

Rebuild of `/root/reference/nerfuncertainty/scripts/save_noisy_images.py`:
Gaussian noise is added in [0, 1] space (`:8-29`), Gaussian blur uses an odd
kernel with OpenCV's default sigma rule (`:31-40`), and — crucially — only
*training* images are corrupted: the script recomputes nerfstudio's
equally-spaced ``train_split_fraction=0.9`` split and copies eval images
through unmodified (`:60-94`). This is the aleatoric-confound generator for
the paper's corruption study (a scientific feature, SURVEY §5.3).

Implemented with numpy + PIL (no cv2 in this environment); the separable
blur matches cv2.GaussianBlur(k, sigma=0) via the same derived sigma.
"""

from __future__ import annotations

import shutil
from pathlib import Path

import numpy as np

from uncertainty_nerf_gs_tpu.data.dataparsers import get_train_eval_split_fraction

IMAGE_EXTS = (".jpg", ".jpeg", ".png")


def add_gaussian_noise(
    img: np.ndarray, mean: float = 0.0, std_dev: float = 0.1,
    rng: np.random.Generator | None = None,
) -> np.ndarray:
    """uint8 image + N(mean, std^2) noise in [0, 1] space
    (`save_noisy_images.py:8-29`)."""
    rng = rng or np.random.default_rng()
    x = img.astype(np.float32) / 255.0
    x = x + rng.normal(mean, std_dev, x.shape).astype(np.float32)
    return (np.clip(x, 0.0, 1.0) * 255.0).round().astype(np.uint8)


def _cv2_default_sigma(kernel_size: int) -> float:
    """OpenCV's sigma when sigma=0 is passed: 0.3*((k-1)*0.5 - 1) + 0.8."""
    return 0.3 * ((kernel_size - 1) * 0.5 - 1.0) + 0.8


def _gaussian_kernel1d(kernel_size: int, sigma: float) -> np.ndarray:
    half = (kernel_size - 1) / 2.0
    x = np.arange(kernel_size, dtype=np.float64) - half
    k = np.exp(-(x**2) / (2.0 * sigma**2))
    return (k / k.sum()).astype(np.float32)


def add_gaussian_blur(img: np.ndarray, kernel_size: int = 5) -> np.ndarray:
    """Separable Gaussian blur with reflect-101 borders (cv2 semantics,
    `save_noisy_images.py:31-40`). kernel_size must be odd."""
    if kernel_size % 2 != 1:
        raise ValueError("kernel_size must be odd")
    k = _gaussian_kernel1d(kernel_size, _cv2_default_sigma(kernel_size))
    x = img.astype(np.float32)
    pad = kernel_size // 2
    # reflect-101 (cv2 BORDER_DEFAULT): reflect without repeating the edge
    x = np.pad(x, ((pad, pad), (pad, pad), (0, 0)), mode="reflect")
    x = np.apply_along_axis(lambda r: np.convolve(r, k, mode="valid"), 0, x)
    x = np.apply_along_axis(lambda r: np.convolve(r, k, mode="valid"), 1, x)
    return np.clip(x.round(), 0, 255).astype(np.uint8)


def process_images(
    input_folder: Path | str,
    output_folder: Path | str,
    operation: str = "noise",
    mean: float = 0.0,
    std_dev: float = 0.1,
    kernel_size: int = 5,
    train_split_fraction: float = 0.9,
    seed: int | None = None,
) -> dict[str, list[str]]:
    """Corrupt train-split images, copy eval images through
    (`save_noisy_images.py:45-94`). Returns {"train": [...], "eval": [...]}."""
    from PIL import Image

    input_folder = Path(input_folder)
    output_folder = Path(output_folder)
    output_folder.mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(seed)

    filenames = sorted(
        f for f in (p.name for p in input_folder.iterdir())
        if f.lower().endswith(IMAGE_EXTS)
    )
    i_train, _ = get_train_eval_split_fraction(len(filenames), train_split_fraction)
    train_set = set(int(i) for i in i_train)

    done: dict[str, list[str]] = {"train": [], "eval": []}
    for idx, name in enumerate(filenames):
        src = input_folder / name
        dst = output_folder / name
        if idx in train_set:
            img = np.asarray(Image.open(src).convert("RGB"))
            if operation == "noise":
                out = add_gaussian_noise(img, mean, std_dev, rng)
            elif operation == "blur":
                out = add_gaussian_blur(img, kernel_size)
            else:
                raise ValueError(f"unknown operation {operation}")
            Image.fromarray(out).save(dst)
            done["train"].append(name)
        else:
            shutil.copyfile(src, dst)
            done["eval"].append(name)
    return done


def main(argv: list[str] | None = None) -> None:
    """CLI mirroring the reference argparse surface
    (`save_noisy_images.py:97-114`)."""
    import argparse

    ap = argparse.ArgumentParser(description="corrupt train-split images")
    ap.add_argument("--input-folder", required=True)
    ap.add_argument("--output-folder", required=True)
    ap.add_argument("--operation", choices=("noise", "blur"), default="noise")
    ap.add_argument("--mean", type=float, default=0.0)
    ap.add_argument("--std-dev", type=float, default=0.1)
    ap.add_argument("--kernel-size", type=int, default=5)
    ap.add_argument("--seed", type=int, default=None)
    args = ap.parse_args(argv)
    done = process_images(
        args.input_folder, args.output_folder, args.operation,
        args.mean, args.std_dev, args.kernel_size, seed=args.seed,
    )
    print(f"corrupted {len(done['train'])} train images, "
          f"copied {len(done['eval'])} eval images")


if __name__ == "__main__":
    main()
