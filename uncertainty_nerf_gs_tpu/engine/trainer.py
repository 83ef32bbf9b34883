"""Training loop for the nerfacto family.

TPU-native equivalent of nerfstudio's ``Trainer`` + ``VanillaPipeline``
combination the reference rides (SURVEY §3.1 call stack): per step a batch
of rays is gathered from the cached images, the model forward + losses run
under one jit, and per-group Adam updates apply. Ray generation happens
*inside* the loss so camera-optimizer pose tangents receive gradients
(nerfstudio applies its CameraOptimizer the same way).

The train step is built once and jitted; the pixel sampler keeps shapes
static (fixed rays/batch). Multi-device data parallelism shards the ray
axis (see `parallel/`).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Callable, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from uncertainty_nerf_gs_tpu.cameras.cameras import Cameras, generate_rays
from uncertainty_nerf_gs_tpu.engine.optimizers import (
    DEFAULT_GROUPS,
    OptimizerGroupConfig,
    make_optimizer,
)
from uncertainty_nerf_gs_tpu.models.nerfacto import (
    NerfactoConfig,
    NerfactoModel,
    nerfacto_loss,
    proposal_anneal_factor,
)
from uncertainty_nerf_gs_tpu.ops.sampling import RayBundle


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    step: jax.Array


def _encoding_face_loss(cfg: NerfactoConfig, model_params, key) -> jax.Array:
    """Mean face-consistency penalty over the MAIN field's cell-stored grid
    levels (all levels for grid_layout="cell"; the hashed levels only for
    "hybrid" — its dense levels share corners exactly)."""
    from uncertainty_nerf_gs_tpu.ops.encodings import (
        face_consistency_loss,
        hash_grid_resolutions,
        hybrid_is_dense,
    )

    res_all = hash_grid_resolutions(cfg.num_levels, cfg.base_res, cfg.max_res)
    table_size = 2**cfg.log2_hashmap_size
    enc = model_params["field"]["encoding"]
    if cfg.grid_layout == "cell":
        levels = list(range(cfg.num_levels))
    else:  # hybrid: params["cells"] stacks only the non-dense levels
        levels = [
            lvl
            for lvl, r in enumerate(res_all)
            if not hybrid_is_dense(int(r), table_size)
        ]
    if not levels:
        return jnp.zeros(())
    cells = enc["cells"]
    terms = [
        face_consistency_loss(
            cells[j],
            int(res_all[lvl]),
            table_size,
            jax.random.fold_in(key, lvl),
            cfg.face_consistency_samples,
            cfg.features_per_level,
        )
        for j, lvl in enumerate(levels)
    ]
    return sum(terms) / len(terms)


@dataclasses.dataclass
class NerfactoTrainer:
    """Owns model, params, optimizer, and the jitted step.

    Args:
      config: model config.
      cameras: training cameras.
      images: (N, H, W, 3) float32 training images in [0, 1].
      use_camera_optimizer: adds a (N, 6) SO3xR3 pose-tangent param group.
    """

    config: NerfactoConfig
    cameras: Cameras
    images: np.ndarray
    seed: int = 0
    use_camera_optimizer: bool = False
    optimizer_groups: dict[str, OptimizerGroupConfig] | None = None
    # (N, H, W) bool; True = trainable pixel (nerfstudio mask semantics:
    # the pixel sampler only draws nonzero-mask pixels). None = all pixels.
    masks: np.ndarray | None = None
    # Rematerialize the model forward in the backward pass
    # (jax.checkpoint): trades FLOPs for HBM. Measured need: at reference
    # scale the 16384-ray backward fails to COMPILE (XLA:TPU HBM OOM,
    # 19.96 GB of 15.75 — evidence/step_profile_r5.json); remat makes
    # large-batch training expressible on one chip.
    gradient_checkpointing: bool = False

    def __post_init__(self):
        self.model = NerfactoModel(self.config)
        key = jax.random.PRNGKey(self.seed)
        h, w = self.cameras.height, self.cameras.width
        dummy_rb = RayBundle(
            origins=jnp.zeros((4, 3)),
            directions=jnp.tile(jnp.array([[0.0, 0.0, 1.0]]), (4, 1)),
            nears=jnp.zeros((4,)),
            fars=jnp.ones((4,)),
            camera_indices=jnp.zeros((4,), jnp.int32),
        )
        variables = self.model.init(
            {"params": key, "dropout": key}, dummy_rb, train=False
        )
        params = dict(variables["params"])
        if self.use_camera_optimizer:
            params["camera_opt"] = jnp.zeros((len(self.cameras), 6), jnp.float32)
        self.tx = make_optimizer(params, self.optimizer_groups or DEFAULT_GROUPS)
        self.state = TrainState(
            params=params, opt_state=self.tx.init(params), step=jnp.zeros((), jnp.int32)
        )
        self.images_dev = jnp.asarray(self.images, jnp.float32)
        if self.masks is not None:
            # device-resident list of valid (cam, y, x) triples; masked
            # sampling draws uniformly from it (nerfstudio PixelSampler's
            # torch.nonzero + random-choice semantics) with jax.random —
            # no per-step host RNG roundtrip (VERDICT r2 weak-3)
            valid = np.argwhere(np.asarray(self.masks, bool))
            if len(valid) == 0:
                raise ValueError("masks exclude every pixel")
            self._valid_coords = jnp.asarray(valid, jnp.int32)
        self._train_step = jax.jit(self._train_step_impl)
        # jitted multi-step launches keyed on (scan length, rays/batch) —
        # see _multi_step_fn
        self._multi_step_cache: dict[tuple[int, int], Any] = {}

    # --------------------------------------------------------------- resume
    def restore(self, ckpt: dict) -> None:
        """Resume from a ``{params, opt_state, step}`` checkpoint dict
        (nerfstudio `ns-train --load-dir` semantics, SURVEY §5.4)."""
        self.state = TrainState(
            params=jax.tree.map(jnp.asarray, ckpt["params"]),
            opt_state=jax.tree.map(jnp.asarray, ckpt["opt_state"]),
            step=jnp.asarray(ckpt["step"], jnp.int32),
        )

    def state_dict(self) -> dict:
        return {
            "params": self.state.params,
            "opt_state": self.state.opt_state,
            "step": np.asarray(self.state.step),
        }

    # ------------------------------------------------------------------ data
    def sample_batch(self, key: jax.Array, num_rays: int) -> dict[str, jax.Array]:
        """Uniform pixel sampler over the cached image stack (device-side);
        with masks, uniform over the device-resident valid-pixel list."""
        n, h, w = self.images_dev.shape[:3]
        if self.masks is not None:
            sel = jax.random.randint(
                key, (num_rays,), 0, self._valid_coords.shape[0]
            )
            rows = self._valid_coords[sel]
            cam_idx, py, px = rows[:, 0], rows[:, 1], rows[:, 2]
        else:
            k1, k2, k3 = jax.random.split(key, 3)
            cam_idx = jax.random.randint(k1, (num_rays,), 0, n)
            px = jax.random.randint(k2, (num_rays,), 0, w)
            py = jax.random.randint(k3, (num_rays,), 0, h)
        rgb = self.images_dev[cam_idx, py, px]
        return {
            "camera_indices": cam_idx,
            "pixel_x": px.astype(jnp.float32),
            "pixel_y": py.astype(jnp.float32),
            "image": rgb,
        }

    # ------------------------------------------------------------------ step
    def _loss_fn(self, params, batch, rng, step):
        pose_adj = params.get("camera_opt") if self.use_camera_optimizer else None
        rb = generate_rays(
            self.cameras,
            batch["camera_indices"],
            batch["pixel_x"],
            batch["pixel_y"],
            pose_adjustment=pose_adj,
        )
        anneal = proposal_anneal_factor(step, self.config)
        k_model, k_dropout = jax.random.split(rng)
        model_params = {k: v for k, v in params.items() if k != "camera_opt"}

        def apply_fn(mp, rb_, anneal_):
            return self.model.apply(
                {"params": mp},
                rb_,
                train=True,
                rngs_key=k_model,
                proposal_anneal=anneal_,
                deterministic_dropout=self.config.dropout_rate == 0.0,
                rngs={"dropout": k_dropout},
            )

        if self.gradient_checkpointing:
            apply_fn = jax.checkpoint(apply_fn)
        outputs = apply_fn(model_params, rb, anneal)
        total, losses = nerfacto_loss(outputs, batch, self.config)
        cfg = self.config
        if cfg.face_consistency_mult > 0.0 and cfg.grid_layout in ("cell", "hybrid"):
            fc = cfg.face_consistency_mult * _encoding_face_loss(
                cfg, model_params, jax.random.fold_in(rng, 0xFACE)
            )
            losses["face_consistency_loss"] = fc
            total = total + fc
        return total, losses

    def _train_step_impl(self, state: TrainState, batch, rng):
        (total, losses), grads = jax.value_and_grad(self._loss_fn, has_aux=True)(
            state.params, batch, rng, state.step
        )
        updates, new_opt_state = self.tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = TrainState(new_params, new_opt_state, state.step + 1)
        losses["total_loss"] = total
        return new_state, losses

    def _multi_step_fn(self, length: int, num_rays: int):
        """Jitted `lax.scan` over ``length`` train steps — ONE device launch.

        Per-step host dispatch dominates wall time on remote-attached chips
        (measured 377 ms/step vs ~80 ms of compute over the axon tunnel);
        batching K steps into one launch amortizes it. The scan body carries
        the PRNG key through the SAME ``split(key, 3)`` sequence as the
        per-step loop, so results are bit-identical to ``steps_per_launch=1``
        (tested: tests/test_trainer_multistep.py).
        """
        cache_key = (length, num_rays)
        if cache_key not in self._multi_step_cache:

            def impl(state: TrainState, key: jax.Array):
                def body(carry, _):
                    st, k = carry
                    k, k_batch, k_step = jax.random.split(k, 3)
                    batch = self.sample_batch(k_batch, num_rays)
                    st, losses = self._train_step_impl(st, batch, k_step)
                    return (st, k), losses

                (state, key), stacked = jax.lax.scan(
                    body, (state, key), length=length
                )
                return state, key, stacked

            self._multi_step_cache[cache_key] = jax.jit(impl)
        return self._multi_step_cache[cache_key]

    def train(
        self,
        num_steps: int,
        num_rays_per_batch: int = 4096,
        log_every: int = 0,
        callback: Callable[[int, dict], None] | None = None,
        writer=None,
        steps_per_launch: int = 1,
    ) -> dict[str, float]:
        key = jax.random.PRNGKey(self.seed + 1)
        losses = {}
        if steps_per_launch > 1:
            i = 0
            while i < num_steps:
                length = min(steps_per_launch, num_steps - i)
                fn = self._multi_step_fn(length, num_rays_per_batch)
                self.state, key, stacked = fn(self.state, key)
                stacked = {k: np.asarray(v) for k, v in stacked.items()}
                base_step = int(self.state.step) - length
                for j in range(length):
                    losses = {k: v[j] for k, v in stacked.items()}
                    if writer is not None and (
                        (i + j) % 10 == 0 or i + j == num_steps - 1
                    ):
                        writer.write(
                            base_step + j + 1,
                            {k: float(v) for k, v in losses.items()},
                        )
                    if log_every and (i + j + 1) % log_every == 0:
                        msg = {k: float(v) for k, v in losses.items()}
                        print(
                            f"step {i + j + 1}: "
                            + ", ".join(f"{k}={v:.4f}" for k, v in msg.items())
                        )
                    if callback is not None:
                        callback(i + j, losses)
                i += length
            return {k: float(v) for k, v in losses.items()}
        for i in range(num_steps):
            key, k_batch, k_step = jax.random.split(key, 3)
            batch = self.sample_batch(k_batch, num_rays_per_batch)
            self.state, losses = self._train_step(self.state, batch, k_step)
            if writer is not None and (i % 10 == 0 or i == num_steps - 1):
                writer.write(
                    int(self.state.step), {k: float(v) for k, v in losses.items()}
                )
            if log_every and (i + 1) % log_every == 0:
                msg = {k: float(v) for k, v in losses.items()}
                print(f"step {i + 1}: " + ", ".join(f"{k}={v:.4f}" for k, v in msg.items()))
            if callback is not None:
                callback(i, losses)
        return {k: float(v) for k, v in losses.items()}

    # ------------------------------------------------------------- rendering
    @functools.cached_property
    def _render_chunk(self):
        def impl(params, rb: RayBundle):
            model_params = {k: v for k, v in params.items() if k != "camera_opt"}
            return self.model.apply(
                {"params": model_params}, rb, train=False,
                use_average_appearance=False,
            )

        return jax.jit(impl)

    def render_image(self, camera_idx: int, chunk: int | None = None) -> dict[str, np.ndarray]:
        """Full-image render in fixed-size chunks (static shapes under jit)."""
        from uncertainty_nerf_gs_tpu.cameras.cameras import pixel_grid

        chunk = chunk or self.config.eval_num_rays_per_chunk
        h, w = self.cameras.height, self.cameras.width
        px, py = pixel_grid(h, w)
        total = h * w
        pad = (-total) % chunk
        px = jnp.concatenate([px, jnp.zeros((pad,))])
        py = jnp.concatenate([py, jnp.zeros((pad,))])
        idx = jnp.full((total + pad,), camera_idx, jnp.int32)
        outs: dict[str, list] = {}
        for start in range(0, total + pad, chunk):
            rb = generate_rays(
                self.cameras,
                idx[start : start + chunk],
                px[start : start + chunk],
                py[start : start + chunk],
            )
            chunk_out = self._render_chunk(self.state.params, rb)
            for k, v in chunk_out.items():
                if k in ("weights_list", "sdist_list", "density_mean"):
                    continue
                outs.setdefault(k, []).append(np.asarray(v))
        images = {}
        for k, parts in outs.items():
            flat = np.concatenate(parts, axis=0)[:total]
            images[k] = flat.reshape((h, w) + flat.shape[1:])
        return images
