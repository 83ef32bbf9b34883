"""Checkpoint save/load/resume.

Replaces the reference's nerfstudio-delegated checkpointing (SURVEY §5.4):
``step-{step:09d}.ckpt`` files holding ``{"pipeline": state_dict, "step"}``,
latest-step discovery by filename parse (`/root/reference/nerfuncertainty/
models/ensemble/ensemble_utils.py:49-70`), per-member ensemble loading
(`ensemble_pipeline.py:126-141`), and the Laplace GGN cache file
``ggn_{n_iters}.pt`` (`scripts/eval_uncertainty.py:1104-1116`).

TPU-native: one orbax `StandardCheckpointer` call per pytree
``{params, opt_state, step}`` — no DDP prefix stripping needed (that whole
machinery, `ensemble_pipeline.py:71-124`, disappears under SPMD).
"""

from __future__ import annotations

import re
from pathlib import Path
from typing import Any

import jax
import numpy as np

_STEP_RE = re.compile(r"step-(\d+)\.ckpt")


def checkpoint_path(load_dir: Path, step: int) -> Path:
    return Path(load_dir) / f"step-{step:09d}.ckpt"


def latest_checkpoint(load_dir: Path) -> Path | None:
    """Latest `step-*.ckpt` by parsed step number
    (`ensemble_utils.py:49-70` semantics)."""
    load_dir = Path(load_dir)
    if not load_dir.exists():
        return None
    best, best_step = None, -1
    for p in load_dir.iterdir():
        m = _STEP_RE.fullmatch(p.name)
        if m and int(m.group(1)) > best_step:
            best, best_step = p, int(m.group(1))
    return best


def save_checkpoint(load_dir: Path, step: int, state: Any) -> Path:
    """Save a pytree (e.g. {params, opt_state, step}) with orbax.

    The whole tree is pulled to host in ONE ``jax.device_get`` before the
    orbax write: on remote-attached devices (axon tunnel) per-array fetches
    serialize into many small RPCs, while a single batched transfer rides
    the link at full bandwidth.
    """
    import orbax.checkpoint as ocp

    path = checkpoint_path(load_dir, step)
    path.parent.mkdir(parents=True, exist_ok=True)
    state = jax.device_get(state)
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path.absolute(), state, force=True)
    return path


def load_checkpoint(path: Path, target: Any | None = None) -> Any:
    """Load a checkpoint; `target` (matching pytree of arrays) restores
    exact dtypes/shardings when given."""
    import orbax.checkpoint as ocp

    with ocp.StandardCheckpointer() as ckptr:
        if target is not None:
            return ckptr.restore(
                Path(path).absolute(),
                jax.tree.map(ocp.utils.to_shape_dtype_struct, target),
            )
        try:
            return ckptr.restore(Path(path).absolute())
        except ValueError:
            # targetless restore replays the SAVED shardings, which fails
            # when the checkpoint was written on another platform (e.g.
            # TPU-trained, CPU-inspected); rebuild a target from metadata
            # so arrays land on the current default device
            meta = ckptr.metadata(Path(path).absolute())
            meta = getattr(meta, "item_metadata", meta)
            sharding = jax.sharding.SingleDeviceSharding(jax.devices()[0])
            target = jax.tree.map(
                lambda m: jax.ShapeDtypeStruct(
                    tuple(m.shape), m.dtype, sharding=sharding
                ),
                meta,
                is_leaf=lambda m: hasattr(m, "shape") and hasattr(m, "dtype"),
            )
            return ckptr.restore(Path(path).absolute(), target)


def load_latest(load_dir: Path, target: Any | None = None) -> tuple[Any, int] | None:
    p = latest_checkpoint(load_dir)
    if p is None:
        return None
    step = int(_STEP_RE.fullmatch(p.name).group(1))
    return load_checkpoint(p, target), step


def load_ensemble_checkpoints(
    load_dirs: list[Path], target: Any | None = None
) -> list[Any]:
    """Per-member latest-checkpoint loading (`ensemble_utils.py:37-108`):
    each member directory is searched independently; members must all have
    at least one checkpoint."""
    states = []
    for d in load_dirs:
        got = load_latest(d, target)
        if got is None:
            raise FileNotFoundError(f"no step-*.ckpt under {d}")
        states.append(got[0])
    return states


# --- Laplace GGN cache (`eval_uncertainty.py:1104-1116`) -------------------


def ggn_cache_path(config_dir: Path, n_iters: int) -> Path:
    # v2: sum-reduction GGN scale (matches the reference's
    # MSELoss(reduction="sum"); round-2 caches under the old name carried
    # the mean-normalized fit and must not be reused)
    return Path(config_dir) / f"ggn_v2_{n_iters}.npz"


def save_ggn_cache(config_dir: Path, n_iters: int, posterior: Any) -> Path:
    path = ggn_cache_path(config_dir, n_iters)
    path.parent.mkdir(parents=True, exist_ok=True)
    flat, treedef = jax.tree.flatten(posterior)
    np.savez(path, *[np.asarray(x) for x in flat])
    return path


def load_ggn_cache(config_dir: Path, n_iters: int, like: Any) -> Any | None:
    path = ggn_cache_path(config_dir, n_iters)
    if not path.exists():
        return None
    data = np.load(path)
    flat, treedef = jax.tree.flatten(like)
    loaded = [data[f"arr_{i}"] for i in range(len(flat))]
    return jax.tree.unflatten(treedef, loaded)
