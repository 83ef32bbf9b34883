"""Training loop for the splatfacto family (full-image batches + refinement).

TPU-native counterpart of nerfstudio's splatfacto training that the
reference rides (`/root/reference/nerfuncertainty/models/activesplatfacto/
activesplatfacto_config.py:39-90`): full-image batches via
FullImageDatamanager, per-Gaussian-attribute Adam groups (means 1.6e-4 with
exp decay, scales 5e-3, quats 1e-3, opacities 5e-2, features_dc 2.5e-3,
features_rest 2.5e-3/20, log_uncertainties 2.5e-3 from
`activesplatfacto_config.py:76-79`), and the densify/split/cull/opacity-
reset schedule executed between jitted train steps.

The jitted step computes loss + grads + the screen-space grad tap in one
launch; refinement (host-scheduled, device-executed masked compaction) runs
every ``refine_every`` steps after warmup. Optimizer moments of slots whose
Gaussian was replaced are zeroed (splatfacto's dup_in_optim semantics).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np
import optax

from uncertainty_nerf_gs_tpu.cameras.cameras import Cameras
from uncertainty_nerf_gs_tpu.engine.optimizers import (
    OptimizerGroupConfig,
    exp_decay_schedule,
)
from uncertainty_nerf_gs_tpu.models import splatfacto as sf

SPLAT_GROUPS: dict[str, OptimizerGroupConfig] = {
    "means": OptimizerGroupConfig(lr=1.6e-4, lr_final=1.6e-6, max_steps=30_000),
    "scales": OptimizerGroupConfig(lr=5e-3, lr_final=5e-3, max_steps=30_000),
    "quats": OptimizerGroupConfig(lr=1e-3, lr_final=1e-3, max_steps=30_000),
    "opacities": OptimizerGroupConfig(lr=5e-2, lr_final=5e-2, max_steps=30_000),
    "features_dc": OptimizerGroupConfig(lr=2.5e-3, lr_final=2.5e-3, max_steps=30_000),
    "features_rest": OptimizerGroupConfig(
        lr=2.5e-3 / 20, lr_final=2.5e-3 / 20, max_steps=30_000
    ),
    # active-splatfacto: own Adam group lr=0.0025 (`activesplatfacto_config.py:76-79`)
    "log_uncertainties": OptimizerGroupConfig(lr=2.5e-3, lr_final=2.5e-3, max_steps=30_000),
}


def make_splat_optimizer(
    params: dict[str, jax.Array],
) -> dict[str, optax.GradientTransformation]:
    """One independent Adam per Gaussian attribute (splatfacto's per-group
    optimizers). A plain dict (not multi_transform) so refinement can zero
    moments of individual groups/slots (dup_in_optim semantics)."""
    return {
        k: optax.adam(exp_decay_schedule(SPLAT_GROUPS[k]), eps=1e-15)
        for k in params
    }


@dataclasses.dataclass
class SplatfactoTrainer:
    """Owns Gaussian params, strategy state, optimizer and the jitted step."""

    config: sf.SplatfactoConfig
    cameras: Cameras
    images: np.ndarray  # (N, H, W, 3) float32 in [0, 1]
    seed: int = 0
    points: np.ndarray | None = None
    point_colors: np.ndarray | None = None
    # camera optimizer (SO3xR3 tangents per image, reference
    # `activesplatfacto_model.py:157-173` applies it before projection)
    use_camera_optimizer: bool = False
    camera_opt_lr: float = 1e-4

    def __post_init__(self):
        key = jax.random.PRNGKey(self.seed)
        self.params, self.splat_state = sf.init_gaussians(
            key, self.config,
            None if self.points is None else jnp.asarray(self.points),
            None if self.point_colors is None else jnp.asarray(self.point_colors),
        )
        if self.config.rasterize_capacity_auto:
            self.config = sf.tune_rasterize_capacity(
                self.config, self.params, self.splat_state.alive, self.cameras
            )
            print(
                f"[auto-capacity] rasterize_capacity="
                f"{self.config.rasterize_capacity} row_capacity="
                f"{self.config.rasterize_row_capacity}"
            )
        self.tx = make_splat_optimizer(self.params)
        self.opt_state = {k: self.tx[k].init(self.params[k]) for k in self.params}
        # camera tangents live outside the fixed-capacity gaussian buffer so
        # refinement compaction never touches them
        self.camera_opt = jnp.zeros((len(self.cameras), 6), jnp.float32)
        self.cam_tx = optax.adam(self.camera_opt_lr, eps=1e-15)
        self.cam_opt_state = self.cam_tx.init(self.camera_opt)
        self.images_dev = jnp.asarray(self.images, jnp.float32)
        self._cam_rng = np.random.default_rng(self.seed + 17)
        self.step = 0
        self._last_opacity_reset = -(10**9)  # no reset yet -> ramp weight 1
        self.scene_extent = float(
            jnp.max(jnp.abs(self.cameras.camera_to_worlds[:, :3, 3]))
        )
        self._step_fn = jax.jit(self._step_impl)

    # --------------------------------------------------------------- resume
    def state_dict(self) -> dict:
        """Full resumable training state (incl. camera optimizer — the
        reference checkpoints its camera_opt param group too)."""
        return {
            "params": self.params,
            "opt_state": self.opt_state,
            "camera_opt": self.camera_opt,
            "cam_opt_state": self.cam_opt_state,
            "splat_alive": np.asarray(self.splat_state.alive),
            "step": np.asarray(self.step),
            "last_opacity_reset": np.asarray(self._last_opacity_reset),
        }

    def restore(self, ckpt: dict) -> None:
        self.params = jax.tree.map(jnp.asarray, ckpt["params"])
        self.opt_state = jax.tree.map(jnp.asarray, ckpt["opt_state"])
        if "camera_opt" in ckpt:
            self.camera_opt = jnp.asarray(ckpt["camera_opt"])
            self.cam_opt_state = jax.tree.map(jnp.asarray, ckpt["cam_opt_state"])
        cap = self.config.capacity
        self.splat_state = sf.SplatState(
            alive=jnp.asarray(ckpt["splat_alive"], bool),
            grad_accum=jnp.zeros((cap,)),
            vis_count=jnp.zeros((cap,), jnp.int32),
            max_radii=jnp.zeros((cap,)),
        )
        self.step = int(ckpt["step"])
        if "last_opacity_reset" in ckpt:
            self._last_opacity_reset = int(ckpt["last_opacity_reset"])

    # ------------------------------------------------------------------ step
    def _step_impl(
        self, params, opt_state, camera_opt, cam_opt_state, alive, cam_idx,
        gt, step, key, nll_weight,
    ):
        cfg = self.config
        cam = jax.tree.map(lambda x: x[cam_idx], self.cameras)
        tap = jnp.zeros_like(params["means"][..., :2])
        sh_deg = sf.active_sh_degree(step, cfg)
        if cfg.background_color == "random":
            background = jax.random.uniform(key, (3,))
        elif cfg.background_color == "black":
            background = jnp.zeros(3)
        else:
            background = jnp.ones(3)

        def loss_fn(p, tap, cam_tangents):
            c2w = cam.camera_to_worlds
            if self.use_camera_optimizer:
                from uncertainty_nerf_gs_tpu.cameras.lie import (
                    compose_poses,
                    exp_map_SO3xR3,
                )

                delta = exp_map_SO3xR3(cam_tangents[cam_idx][None])[0]
                c2w = compose_poses(delta[None], c2w[None])[0]
            out = sf.render_splat(
                p, alive, c2w, cam.fx, cam.fy, cam.cx, cam.cy,
                self.cameras.width, self.cameras.height, cfg,
                sh_deg=sh_deg, background=background, means2d_tap=tap,
            )
            total, losses = sf.splatfacto_loss(out, gt, p, cfg, nll_weight)
            return total, (losses, out["radii"], out["visible"], out["raster_overflow"])

        (total, (losses, radii, visible, overflow)), (grads, tap_grad, cam_grads) = (
            jax.value_and_grad(loss_fn, argnums=(0, 1, 2), has_aux=True)(
                params, tap, camera_opt
            )
        )
        updates = {}
        new_opt_state = {}
        for k in params:
            updates[k], new_opt_state[k] = self.tx[k].update(
                grads[k], opt_state[k], params[k]
            )
        new_params = optax.apply_updates(params, updates)
        if self.use_camera_optimizer:
            cam_updates, new_cam_opt_state = self.cam_tx.update(
                cam_grads, cam_opt_state, camera_opt
            )
            new_camera_opt = optax.apply_updates(camera_opt, cam_updates)
        else:
            new_camera_opt, new_cam_opt_state = camera_opt, cam_opt_state
        losses["total_loss"] = total
        return (
            new_params, new_opt_state, new_camera_opt, new_cam_opt_state,
            losses, tap_grad, radii, visible, overflow,
        )

    def train_step(self, key: jax.Array) -> dict[str, float]:
        cfg = self.config
        k_step = jax.random.fold_in(key, self.step)
        # host-side numpy camera sampling: no device->host sync per step
        # (the previous jax.random.randint round-trip stalled every step)
        cam_idx = int(self._cam_rng.integers(0, len(self.cameras)))
        gt = self.images_dev[cam_idx]
        # NLL ramp after opacity resets (0 steps = reference parity: w == 1)
        if cfg.nll_ramp_after_reset > 0:
            since = self.step - self._last_opacity_reset
            nll_w = min(1.0, max(0.0, since / cfg.nll_ramp_after_reset))
        else:
            nll_w = 1.0
        (
            self.params, self.opt_state, self.camera_opt, self.cam_opt_state,
            losses, tap_grad, radii, visible, overflow,
        ) = self._step_fn(
            self.params, self.opt_state, self.camera_opt, self.cam_opt_state,
            self.splat_state.alive, jnp.int32(cam_idx), gt,
            jnp.int32(self.step), k_step, jnp.float32(nll_w),
        )
        self.splat_state = sf.accumulate_stats(
            self.splat_state, tap_grad, radii, visible,
            self.cameras.width, self.cameras.height,
        )
        self.step += 1

        # refinement schedule (host-side control, device-side compaction)
        if (
            self.step > cfg.warmup_length
            and self.step % cfg.refine_every == 0
            and self.step < cfg.stop_split_at
        ):
            reset_period = cfg.reset_alpha_every * cfg.refine_every
            do_refine = self.step % reset_period > max(
                cfg.warmup_length, cfg.refine_every
            )
            if do_refine:
                self.params, self.splat_state, info = sf.refine_gaussians(
                    jax.random.fold_in(jax.random.PRNGKey(self.seed), self.step),
                    self.params, self.splat_state, cfg, self.step,
                    scene_extent=self.scene_extent,
                )
                losses["num_alive"] = info["num_alive"]
                if int(info["num_dropped_capacity"]) > 0:
                    print(
                        f"[refine] capacity overflow: dropped "
                        f"{int(info['num_dropped_capacity'])} new gaussians"
                    )
                self._zero_moment_slots(info["touched_slots"])
            if self.step % reset_period == 0:
                self.params = sf.reset_opacities(self.params, cfg)
                self._reset_moments(keys=("opacities",))
                self._last_opacity_reset = self.step
        # periodic capacity retune: densification grows per-tile counts; a
        # bump recompiles the step once instead of silently truncating
        if (
            cfg.capacity_retune_every
            and self.step % cfg.capacity_retune_every == 0
        ):
            self.retune_capacity()
        return {k: float(v) for k, v in losses.items()}

    def retune_capacity(self) -> bool:
        """Re-probe true per-tile/per-row maxima and, if the current budget
        is exceeded, grow it (never shrink — shrinking churns compiles for
        no quality win). Returns True when the step function was re-jitted."""
        tuned = sf.tune_rasterize_capacity(
            self.config, self.params, self.splat_state.alive, self.cameras
        )
        if (
            tuned.rasterize_capacity <= self.config.rasterize_capacity
            and (tuned.rasterize_row_capacity or 0)
            <= (self.config.rasterize_row_capacity
                or max(4 * self.config.rasterize_capacity, 1024))
        ):
            return False
        self.config = dataclasses.replace(
            self.config,
            rasterize_capacity=max(
                tuned.rasterize_capacity, self.config.rasterize_capacity
            ),
            rasterize_row_capacity=max(
                tuned.rasterize_row_capacity or 0,
                self.config.rasterize_row_capacity
                or max(4 * self.config.rasterize_capacity, 1024),
            ),
        )
        print(
            f"[auto-capacity] step {self.step}: grew rasterize_capacity="
            f"{self.config.rasterize_capacity} row_capacity="
            f"{self.config.rasterize_row_capacity}"
        )
        self._step_fn = jax.jit(self._step_impl)
        return True

    def _reset_moments(self, keys: tuple[str, ...]) -> None:
        """Reinitialize the named groups' Adam states (splatfacto resets the
        opacities optimizer entirely after each opacity reset)."""
        for k in keys:
            self.opt_state[k] = self.tx[k].init(self.params[k])

    def _zero_moment_slots(self, touched: jax.Array) -> None:
        """Zero Adam mu/nu rows ONLY for slots whose Gaussian was replaced
        during refinement (splatfacto's dup_in_optim); surviving Gaussians
        keep their momentum across refines."""
        cap = touched.shape[0]

        def zero_rows(leaf):
            if hasattr(leaf, "ndim") and leaf.ndim >= 1 and leaf.shape[0] == cap:
                mask = touched.reshape((cap,) + (1,) * (leaf.ndim - 1))
                return jnp.where(mask, jnp.zeros_like(leaf), leaf)
            return leaf

        self.opt_state = {
            k: jax.tree.map(zero_rows, st) for k, st in self.opt_state.items()
        }

    def train(self, num_steps: int, log_every: int = 0, writer=None) -> dict[str, float]:
        key = jax.random.PRNGKey(self.seed + 1)
        losses: dict[str, float] = {}
        for i in range(num_steps):
            losses = self.train_step(key)
            if writer is not None:
                writer.write(self.step, losses)
            if log_every and (i + 1) % log_every == 0:
                print(
                    f"step {self.step}: "
                    + ", ".join(f"{k}={v:.4f}" for k, v in losses.items())
                )
        return losses

    # ------------------------------------------------------------- rendering
    def render_image(self, camera_idx: int, background=None) -> dict[str, np.ndarray]:
        cfg = self.config
        cam = jax.tree.map(lambda x: x[camera_idx], self.cameras)
        out = sf.render_splat(
            self.params, self.splat_state.alive, cam.camera_to_worlds,
            cam.fx, cam.fy, cam.cx, cam.cy,
            self.cameras.width, self.cameras.height, cfg,
            sh_deg=cfg.sh_degree,
            background=(
                jnp.asarray(background) if background is not None
                else sf.fixed_background(cfg)
            ),
        )
        return {
            k: np.asarray(v)
            for k, v in out.items()
            if k not in ("radii", "visible")
        }
