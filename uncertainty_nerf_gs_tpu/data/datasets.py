"""Image dataset: DataparserOutputs -> cached image stacks.

The consumed slice of nerfstudio's InputDataset/datamanager image path
(SURVEY §1 L5): decode images to float32 [0, 1], composite RGBA over the
parser's alpha color (Blender), optional GT depth loading. Images are
cached host-side as one (N, H, W, 3) stack; trainers move it to device
once (the reference's CPU->GPU per-batch boundary disappears).
"""

from __future__ import annotations

from pathlib import Path

import numpy as np

from uncertainty_nerf_gs_tpu.data.dataparsers import DataparserOutputs


def load_image(path: Path, alpha_color: np.ndarray | None = None) -> np.ndarray:
    """(H, W, 3) float32 in [0, 1]; RGBA composited over alpha_color."""
    from PIL import Image

    with Image.open(path) as im:
        arr = np.asarray(im).astype(np.float32) / 255.0
    if arr.ndim == 2:
        arr = np.repeat(arr[..., None], 3, -1)
    if arr.shape[-1] == 4:
        rgb, a = arr[..., :3], arr[..., 3:]
        bg = alpha_color if alpha_color is not None else np.ones(3, np.float32)
        arr = rgb * a + bg * (1.0 - a)
    return arr[..., :3]


def load_images(outputs: DataparserOutputs) -> np.ndarray:
    """Stack all images of a parsed split: (N, H, W, 3) float32."""
    imgs = [load_image(p, outputs.alpha_color) for p in outputs.image_filenames]
    return np.stack(imgs)


def load_masks(outputs: DataparserOutputs) -> np.ndarray | None:
    """Stack per-image masks when the parser listed them: (N, H, W) bool,
    True = pixel participates in training (nerfstudio sampler semantics:
    only nonzero-mask pixels are sampled)."""
    if not getattr(outputs, "mask_filenames", None):
        return None
    from PIL import Image

    masks = []
    for p in outputs.mask_filenames:
        with Image.open(p) as im:
            arr = np.asarray(im)
        if arr.ndim == 3:
            arr = arr[..., 0]
        masks.append(arr > 0)
    return np.stack(masks)


def load_depths(outputs: DataparserOutputs) -> np.ndarray | None:
    """Stack GT depth images when the parser listed them (blender-downscale
    test split)."""
    if not outputs.depth_filenames:
        return None
    from PIL import Image

    depths = []
    for p in outputs.depth_filenames:
        with Image.open(p) as im:
            depths.append(np.asarray(im).astype(np.float32))
    return np.stack(depths)
