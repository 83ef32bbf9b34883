"""Splatfacto-family 3D Gaussian Splatting model (plain + active).

One model covers the reference's two splat methods (SURVEY §7 design —
uncertainty as a head on a shared core):

  * **splatfacto** — nerfstudio's 3DGS model the reference subclasses;
  * **active-splatfacto** (`uncertainty_channels=1`) — per-Gaussian learned
    log-uncertainty parameter rasterized with softplus+beta_min and black
    background, Gaussian-NLL RGB loss, opacity loss on visible Gaussians
    (`/root/reference/nerfuncertainty/models/activesplatfacto/
    activesplatfacto_model.py:57-61,286-301,392-434`).

TPU-native deviations from the reference's CUDA path:

  * gsplat's 4 rasterize launches per camera (rgb / uncertainty / depth /
    depth-var, `activesplatfacto_model.py:260-356`) collapse into ONE
    multi-channel payload pass through `ops/rasterize.py`;
  * depth variance is composited in-pass as E[d^2]-E[d]^2 under the
    alpha-normalized weight distribution (closed form) instead of the
    reference's fetch-rendered-depth-then-re-rasterize (d_i - D)^2
    indirection (gsplat issue #87 trick, `:322-356`) — same quantity, one
    launch, no gather from a half-rendered framebuffer;
  * the Gaussian set is a **fixed-capacity buffer + alive mask**: densify /
    split / cull (`SplatfactoModel.refine_gaussians` below) compact new
    Gaussians into dead slots with cumsum+scatter under static shapes —
    no dynamic reallocation (SURVEY §7 "hardest part on TPU");
  * screen-space positional gradients for densification come from a zero
    "grad tap" input (gradient wrt an additive means2d offset), the JAX
    equivalent of splatfacto's xys.retain_grad().
"""

from __future__ import annotations

import dataclasses
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp

from uncertainty_nerf_gs_tpu.metrics.image_metrics import ssim
from uncertainty_nerf_gs_tpu.ops import sh as sh_ops
from uncertainty_nerf_gs_tpu.ops.gaussians import (
    Projection,
    project_gaussians,
    quat_to_rotmat,
)
from uncertainty_nerf_gs_tpu.ops.rasterize import (
    rasterize_gaussians,
    tile_hit_counts,
)


@dataclasses.dataclass(frozen=True)
class SplatfactoConfig:
    """Splatfacto hyper-parameters (nerfstudio defaults) + the reference's
    active-splatfacto knobs (`activesplatfacto_config.py`)."""

    capacity: int = 1 << 15  # fixed Gaussian buffer size (alive mask inside)
    sh_degree: int = 3
    sh_degree_interval: int = 1000
    num_random: int = 5000  # random-init count when no SfM points
    random_scale: float = 1.0  # random-init cube half-extent (nerfstudio: 10)
    # refinement schedule
    warmup_length: int = 500
    refine_every: int = 100
    densify_grad_thresh: float = 0.0008
    densify_size_thresh: float = 0.01
    cull_alpha_thresh: float = 0.1
    cull_scale_thresh: float = 0.5
    cull_screen_size: float = 0.15
    split_screen_size: float = 0.05
    stop_screen_size_at: int = 4000
    stop_split_at: int = 15000
    reset_alpha_every: int = 30  # in units of refine_every
    n_split_samples: int = 2
    continue_cull_post_densification: bool = True
    # losses
    ssim_lambda: float = 0.2
    use_scale_regularization: bool = False
    max_gauss_ratio: float = 10.0
    # rendering
    near_plane: float = 0.01
    background_color: str = "random"  # random | white | black
    rasterize_capacity: int = 512
    tile_chunk: int = 64
    rasterize_backend: str = "auto"  # auto | pallas | xla (ops/rasterize.py)
    # per-ROW candidate budget of the two-level cull (ops/rasterize.py;
    # None = max(4*capacity, 1024)). The reported raster_overflow counts
    # drops at BOTH levels; raise this to drive row-level drops to zero
    # (evidence/raster_truncation_r5.json quantifies the quality cost).
    rasterize_row_capacity: int | None = None
    # capacity auto-tuning (no reference counterpart: gsplat's per-tile
    # intersection buffers grow dynamically; our static shapes need a
    # budget). When True, `tune_rasterize_capacity` (called by the trainer
    # at start, or manually) replaces rasterize_capacity/row_capacity with
    # margin-padded TRUE per-tile/per-row maxima measured on probe cameras
    # (exact counts via ops/rasterize.tile_hit_counts), clamped to
    # rasterize_capacity_max. The 16k-soak checkpoint still overflowed at
    # cap 4096 (evidence/raster_truncation_r5.json) — auto-tuning makes the
    # truncation budget per-scene instead of a global guess.
    rasterize_capacity_auto: bool = False
    rasterize_capacity_max: int = 4096
    rasterize_capacity_margin: float = 1.25
    # re-probe cadence during training (0 = off): densification grows
    # per-tile counts over time; a retune recompiles the step (~once per
    # bump) instead of silently truncating
    capacity_retune_every: int = 0
    # tile compaction: "matmul" (one-hot MXU matmul, no index buffers) or
    # "gather" (scatter compaction + row gather) — identical outputs;
    # evidence/raster_pack_ab_r5.json holds the timings
    rasterize_pack_via: str = "gather"
    # depth-variance semantics: "moments" = in-pass E[d^2]-E[d]^2 (one
    # rasterize, the default); "indirection" = the reference's exact
    # two-pass trick — fetch the composited depth D at each Gaussian's
    # floored center, re-rasterize (d_i - D)^2
    # (`activesplatfacto_model.py:322-356`, gsplat issue #87). The two
    # produce essentially UNCORRELATED maps on a trained model (mean map
    # corr 0.03, reference ~20x larger magnitude —
    # evidence/depth_var_compare_r4.json), so runs that must match the
    # reference's depth-AUSE numbers should select "indirection".
    depth_var_mode: str = "moments"  # moments | indirection
    # active-splatfacto (reference `activesplatfacto_model.py:30-46`)
    uncertainty_channels: int = 0
    beta_min: float = 0.01
    rendered_uncertainty_eps: float = 1e-6
    opacity_loss_mult: float = 0.01
    # fixed-capacity guards (no reference counterpart: gsplat's buffer grows
    # dynamically, so the reference never refines at saturation).
    # refine_cap_to_budget: admit densification candidates in descending
    # avg-gradient priority only while their children fit the free-slot
    # budget. Without it, a split whose children are dropped at saturation
    # STILL overwrites its original in place with a 1.6x-shrunk jittered
    # sample — every refine then erodes high-gradient coverage (the 16k-soak
    # PSNR 17.9->4.5 collapse).
    refine_cap_to_budget: bool = True
    # steps after each opacity reset over which the NLL is linearly blended
    # back in from a plain L1 photometric loss (0 = reference loss parity).
    # Right after a reset the render is uniformly wrong and the 1/(2 beta^2)
    # precision term amplifies that error ~1e4x (nll spikes ~7e4 in the
    # soak); plain splatfacto's L1 recovers gracefully from the same reset.
    nll_ramp_after_reset: int = 0


class SplatState(NamedTuple):
    """Non-optimized per-Gaussian strategy state (all (capacity,) leaves)."""

    alive: jax.Array  # bool
    grad_accum: jax.Array  # accumulated ||d loss / d means2d|| (pixels)
    vis_count: jax.Array  # steps this Gaussian was in-frustum since refine
    max_radii: jax.Array  # max screen radius fraction since refine


# nerfstudio's fixed eval background for background_color="random": the
# viewer-default dark navy. At eval the reference composites on
# `self.background_color` (`activesplatfacto_model.py:170-173`), which the
# nerfstudio base model sets to this constant when the config says
# "random" — NOT black. Evaluating a random-background-trained model on
# black against a white-background GT scores ~3 dB on an actually-healthy
# checkpoint (r3 soak false alarm).
EVAL_BACKGROUND_RANDOM = (0.1490, 0.1647, 0.2157)


def fixed_background(config: SplatfactoConfig) -> jnp.ndarray:
    """Deterministic eval/render background for a config (reference
    eval-branch semantics; training still randomizes when "random")."""
    if config.background_color == "white":
        return jnp.ones(3)
    if config.background_color == "black":
        return jnp.zeros(3)
    return jnp.asarray(EVAL_BACKGROUND_RANDOM, jnp.float32)


def opengl_to_viewmat(c2w: jax.Array) -> jax.Array:
    """(3, 4) OpenGL camera-to-world -> (4, 4) OpenCV world-to-camera."""
    flip = jnp.diag(jnp.array([1.0, -1.0, -1.0]))
    r = c2w[:3, :3] @ flip  # now +z forward
    t = c2w[:3, 3]
    w2c = jnp.eye(4)
    w2c = w2c.at[:3, :3].set(r.T)
    w2c = w2c.at[:3, 3].set(-r.T @ t)
    return w2c


def init_gaussians(
    key: jax.Array,
    config: SplatfactoConfig,
    points: jax.Array | None = None,
    colors: jax.Array | None = None,
) -> tuple[dict[str, jax.Array], SplatState]:
    """Fixed-capacity Gaussian buffer from SfM points or random init.

    Matches splatfacto seeding: means from points (or uniform cube), scales
    from mean 3-NN distance, random quats, opacity logit(0.1), SH dc from
    colors. Active-splatfacto adds ``log_uncertainties`` seeded ~N(0, 0.1^2)
    (`activesplatfacto_model.py:57-61`).
    """
    cap = config.capacity
    k_pts, k_col, k_quat, k_unc = jax.random.split(key, 4)
    if points is None:
        n = min(config.num_random, cap)
        points = (
            jax.random.uniform(k_pts, (n, 3), minval=-1.0, maxval=1.0)
            * config.random_scale
        )
        colors = jax.random.uniform(k_col, (n, 3))
    n = min(points.shape[0], cap)
    points = jnp.asarray(points[:n], jnp.float32)
    colors = (
        jnp.asarray(colors[:n], jnp.float32)
        if colors is not None
        else jnp.full((n, 3), 0.5)
    )

    # mean 3-NN distance, chunked O(N^2) so the distance matrix never
    # materializes (65k points would need a 17 GB full matrix)
    chunk = 1024
    pad_n = (-n) % chunk
    pts_pad = jnp.concatenate(
        [points, jnp.full((pad_n, 3), 1e10, points.dtype)], 0
    )

    def chunk_nn3(start):
        blk = jax.lax.dynamic_slice(pts_pad, (start, 0), (chunk, 3))
        d2 = jnp.sum((blk[:, None] - points[None]) ** 2, -1)  # (chunk, n)
        row = jnp.arange(chunk) + start
        d2 = jnp.where(row[:, None] == jnp.arange(n)[None], 1e10, d2)
        return -jax.lax.top_k(-d2, 3)[0]  # (chunk, 3) smallest

    starts = jnp.arange(0, n + pad_n, chunk)
    nn3 = jax.lax.map(chunk_nn3, starts).reshape(-1, 3)[:n]
    avg_dist = jnp.sqrt(jnp.maximum(jnp.mean(nn3, -1), 1e-12))
    log_scales = jnp.log(jnp.maximum(avg_dist, 1e-6))[:, None].repeat(3, axis=1)

    def pad(x, fill=0.0):
        return jnp.concatenate(
            [x, jnp.full((cap - n,) + x.shape[1:], fill, x.dtype)], 0
        )

    nb = sh_ops.num_sh_bases(config.sh_degree)
    dc = (colors - 0.5) / 0.28209479177387814  # inverse SH dc
    quats = jax.random.normal(k_quat, (n, 4))
    quats = quats / jnp.linalg.norm(quats, axis=-1, keepdims=True)

    params = {
        "means": pad(points),
        "scales": pad(log_scales, -10.0),
        "quats": pad(quats, 0.0),
        "opacities": pad(jnp.full((n,), jnp.log(0.1 / 0.9)), -10.0),
        "features_dc": pad(dc),
        "features_rest": pad(jnp.zeros((n, nb - 1, 3))),
    }
    if config.uncertainty_channels:
        params["log_uncertainties"] = pad(
            0.1 * jax.random.normal(k_unc, (n, 1)), 0.0
        )
    state = SplatState(
        alive=jnp.arange(cap) < n,
        grad_accum=jnp.zeros((cap,)),
        vis_count=jnp.zeros((cap,), jnp.int32),
        max_radii=jnp.zeros((cap,)),
    )
    return params, state


def active_sh_degree(step: jax.Array, config: SplatfactoConfig) -> jax.Array:
    return jnp.minimum(
        step // config.sh_degree_interval, config.sh_degree
    ).astype(jnp.int32)


def probe_tile_counts(
    params: dict[str, jax.Array],
    alive: jax.Array,
    c2w: jax.Array,
    fx: float,
    fy: float,
    cx: float,
    cy: float,
    width: int,
    height: int,
    config: SplatfactoConfig,
):
    """Exact per-tile / per-row intersection counts of one camera (the same
    projection prelude as `render_splat`, then `ops.rasterize.
    tile_hit_counts`). Used by `tune_rasterize_capacity`."""
    viewmat = opengl_to_viewmat(c2w)
    proj = project_gaussians(
        params["means"],
        jnp.exp(params["scales"]),
        params["quats"],
        viewmat,
        fx, fy, cx, cy, width, height,
        near=config.near_plane,
    )
    proj = proj._replace(valid=proj.valid & alive)
    return tile_hit_counts(proj, width, height)


def _round_up(x: int, m: int) -> int:
    return ((int(x) + m - 1) // m) * m


def tune_rasterize_capacity(
    config: SplatfactoConfig,
    params: dict[str, jax.Array],
    alive: jax.Array,
    cameras,
    max_probes: int = 8,
) -> SplatfactoConfig:
    """Replace ``rasterize_capacity`` / ``rasterize_row_capacity`` with
    margin-padded TRUE maxima measured over up to ``max_probes`` evenly
    spaced cameras (exact counts — overflow at the probed cameras is zero
    by construction unless ``rasterize_capacity_max`` clamps).

    The reference never needs this: gsplat's CUDA rasterizer allocates its
    per-tile intersection lists dynamically per frame
    (`activesplatfacto_model.py:260-273`); our static-shape design trades
    that for a per-scene probed budget."""
    import numpy as np

    n_cams = len(cameras)
    idxs = sorted(
        {int(i) for i in np.linspace(0, n_cams - 1, min(max_probes, n_cams))}
    )

    @jax.jit
    def probe(cam):
        counts = probe_tile_counts(
            params, alive, cam.camera_to_worlds, cam.fx, cam.fy, cam.cx,
            cam.cy, cameras.width, cameras.height, config,
        )
        return jnp.max(counts.tile), jnp.max(counts.row)

    max_tile = max_row = 0
    for i in idxs:
        t, r = probe(jax.tree.map(lambda x: x[i], cameras))
        max_tile = max(max_tile, int(t))
        max_row = max(max_row, int(r))
    m = config.rasterize_capacity_margin
    cap = min(
        max(_round_up(max_tile * m, 64), 64), config.rasterize_capacity_max
    )
    row_cap = min(
        max(_round_up(max_row * m, 128), 4 * cap, 1024),
        int(params["means"].shape[0]),
    )
    return dataclasses.replace(
        config, rasterize_capacity=cap, rasterize_row_capacity=row_cap
    )


def render_splat(
    params: dict[str, jax.Array],
    alive: jax.Array,
    c2w: jax.Array,
    fx: float,
    fy: float,
    cx: float,
    cy: float,
    width: int,
    height: int,
    config: SplatfactoConfig,
    sh_deg: jax.Array | int | None = None,
    background: jax.Array | None = None,
    means2d_tap: jax.Array | None = None,
) -> dict[str, jax.Array]:
    """Render one camera: rgb / depth / depth_var / accumulation (+
    uncertainty for active) in a single multi-channel rasterize pass.

    ``means2d_tap``: optional (capacity, 2) zeros added to screen positions;
    its cotangent is the densification signal (see module docstring).
    """
    viewmat = opengl_to_viewmat(c2w)
    proj = project_gaussians(
        params["means"],
        jnp.exp(params["scales"]),
        params["quats"],
        viewmat,
        fx, fy, cx, cy, width, height,
        near=config.near_plane,
    )
    proj = proj._replace(valid=proj.valid & alive)
    if means2d_tap is not None:
        proj = proj._replace(means2d=proj.means2d + means2d_tap)

    cam_pos = c2w[:3, 3]
    viewdirs = params["means"] - cam_pos[None]
    nb = sh_ops.num_sh_bases(config.sh_degree)
    coeffs = jnp.concatenate(
        [params["features_dc"][:, None, :], params["features_rest"]], axis=1
    )  # (N, nb, 3)
    if sh_deg is None:
        sh_deg = config.sh_degree
    rgbs = jnp.clip(
        sh_ops.eval_sh_colors(config.sh_degree, coeffs, viewdirs, sh_deg) + 0.5,
        0.0,
        None,
    )  # (N, 3)

    opac = jax.nn.sigmoid(params["opacities"]) * proj.compensation
    depth = proj.depths

    channels = [rgbs, depth[:, None], (depth**2)[:, None]]
    if config.uncertainty_channels:
        unc = (
            jax.nn.softplus(params["log_uncertainties"][:, 0]) + config.beta_min
        )
        channels.append(unc[:, None])
    payload = jnp.concatenate(channels, axis=-1)

    out = rasterize_gaussians(
        proj,
        opac,
        payload,
        width,
        height,
        capacity=config.rasterize_capacity,
        tile_chunk=config.tile_chunk,
        backend=config.rasterize_backend,
        row_capacity=config.rasterize_row_capacity,
        pack_via=config.rasterize_pack_via,
    )
    img = out.image
    alpha = out.alpha
    alpha_safe = jnp.maximum(alpha, 1e-10)

    if background is None:
        background = jnp.zeros(3) if config.background_color == "black" else jnp.ones(3)
    rgb = img[..., :3] + (1.0 - alpha[..., None]) * background
    # alpha-normalized depth (`activesplatfacto_model.py:305-319`); pixels
    # with zero coverage get the max rendered depth like the reference's
    # torch.where(alpha > 0, depth / alpha, depth.max())
    d1 = img[..., 3] / alpha_safe
    d2 = img[..., 4] / alpha_safe
    covered = alpha > 0.0
    far_fill = jnp.max(jnp.where(covered, d1, 0.0))
    d1 = jnp.where(covered, d1, far_fill)
    d2 = jnp.where(covered, d2, far_fill**2)
    if config.depth_var_mode == "indirection":
        # reference's exact two-pass depth variance (see config field):
        # D is already in hand (d1), so one extra rasterize suffices
        xy = jnp.floor(proj.means2d).astype(jnp.int32)
        valid_pix = (
            (xy[:, 0] > 0) & (xy[:, 0] < width)
            & (xy[:, 1] > 0) & (xy[:, 1] < height)
        )  # strictly > 0: reference quirk preserved
        fetched = d1[
            jnp.clip(xy[:, 1], 0, height - 1), jnp.clip(xy[:, 0], 0, width - 1)
        ]
        delta = jnp.where(valid_pix, depth - fetched, depth)
        out2 = rasterize_gaussians(
            proj,
            opac,
            (delta**2)[:, None],
            width,
            height,
            capacity=config.rasterize_capacity,
            tile_chunk=config.tile_chunk,
            backend=config.rasterize_backend,
            row_capacity=config.rasterize_row_capacity,
            pack_via=config.rasterize_pack_via,
        )
        raw2 = out2.image[..., 0]
        # reference fill: uncovered pixels get the RAW composite's max
        depth_var = jnp.where(covered, raw2 / alpha_safe, jnp.max(raw2))
    else:
        depth_var = jnp.maximum(d2 - d1**2, 0.0) + 1e-5

    outputs: dict[str, Any] = {
        "rgb": jnp.clip(rgb, 0.0, 1.0),
        "depth": d1,
        "depth_var": depth_var,
        "depth_std": jnp.sqrt(depth_var),
        "accumulation": alpha,
        "background": background,
        "radii": proj.radii,
        "visible": proj.valid,
        "raster_overflow": out.max_overflow,
    }
    if config.uncertainty_channels:
        # black-background uncertainty map (`activesplatfacto_model.py:
        # 286-301`). Reference semantics: the composited softplus channel is
        # a per-pixel STD (betas), so rgb_std = channel and rgb_var =
        # channel^2 (`activesplatfacto_model.py:358-364`, loss `:392-395`).
        rgb_std = jnp.maximum(img[..., 5], 0.0)
        outputs["uncertainty"] = rgb_std
        outputs["rgb_std"] = rgb_std
        outputs["rgb_var"] = rgb_std**2
    return outputs


def splatfacto_loss(
    outputs: dict[str, jax.Array],
    image: jax.Array,
    params: dict[str, jax.Array],
    config: SplatfactoConfig,
    nll_weight: jax.Array | float = 1.0,
) -> tuple[jax.Array, dict[str, jax.Array]]:
    """Train loss: splatfacto L1+SSIM; active adds Gaussian NLL, scale reg
    and the visible-Gaussian opacity loss (`activesplatfacto_model.py:
    369-441`).

    ``nll_weight`` (traced scalar) blends the active NLL with the plain L1
    photometric term: ``w*nll + (1-w)*l1``. 1.0 (default) is the reference
    loss; the trainer ramps it 0->1 after opacity resets when
    ``config.nll_ramp_after_reset > 0`` (see the config docstring)."""
    pred = outputs["rgb"]
    gt = image
    losses: dict[str, jax.Array] = {}

    simloss = 1.0 - ssim(pred, gt)
    if config.uncertainty_channels:
        var = jnp.maximum(outputs["rgb_var"], config.rendered_uncertainty_eps)
        nll = (
            jnp.mean((pred - gt) ** 2 / (2.0 * var[..., None]))
            + 0.5 * jnp.mean(jnp.log(var))
            + 4.0
        )
        if config.nll_ramp_after_reset > 0:
            l1 = jnp.mean(jnp.abs(pred - gt))
            nll = nll_weight * nll + (1.0 - nll_weight) * l1
        losses["nll_loss"] = (1.0 - config.ssim_lambda) * nll
        # opacity loss on in-frustum Gaussians (`:416-434`)
        vis = outputs["visible"]
        op = jax.nn.sigmoid(params["opacities"])
        losses["opacity_loss"] = config.opacity_loss_mult * (
            jnp.sum(op * vis) / jnp.maximum(jnp.sum(vis), 1.0)
        )
    else:
        l1 = jnp.mean(jnp.abs(pred - gt))
        losses["main_loss"] = (1.0 - config.ssim_lambda) * l1
    losses["ssim_loss"] = config.ssim_lambda * simloss

    if config.use_scale_regularization:
        s = jnp.exp(params["scales"])
        ratio = jnp.max(s, -1) / jnp.maximum(jnp.min(s, -1), 1e-8)
        losses["scale_reg"] = 0.1 * jnp.mean(
            jnp.maximum(ratio, config.max_gauss_ratio) - config.max_gauss_ratio
        )
    total = sum(losses.values())
    return total, losses


# ---------------------------------------------------------------------------
# densification / culling under static shapes
# ---------------------------------------------------------------------------


def accumulate_stats(
    state: SplatState,
    tap_grad: jax.Array,
    radii: jax.Array,
    visible: jax.Array,
    width: int,
    height: int,
) -> SplatState:
    """Per-step strategy-state update from the means2d grad tap."""
    gnorm = jnp.linalg.norm(tap_grad, axis=-1)
    # normalize to resolution-independent units like splatfacto (0.5*max(H,W))
    gnorm = gnorm * 0.5 * max(width, height)
    return state._replace(
        grad_accum=state.grad_accum + jnp.where(visible, gnorm, 0.0),
        vis_count=state.vis_count + visible.astype(jnp.int32),
        max_radii=jnp.maximum(
            state.max_radii, jnp.where(visible, radii / max(width, height), 0.0)
        ),
    )


def _compact_into_free(
    params: dict[str, jax.Array],
    state: SplatState,
    new_params: dict[str, jax.Array],
    want_new: jax.Array,
) -> tuple[dict[str, jax.Array], jax.Array, jax.Array]:
    """Scatter rows of ``new_params`` (masked by ``want_new``) into dead
    slots. Returns (params, alive, num_dropped). Static shapes throughout;
    overflow beyond free capacity is dropped (callers log it)."""
    cap = state.alive.shape[0]
    free = ~state.alive
    free_rank = jnp.cumsum(free) - 1  # rank of each free slot
    num_free = jnp.sum(free)

    new_rank = jnp.cumsum(want_new) - 1  # rank of each new gaussian
    fits = want_new & (new_rank < num_free)
    num_dropped = jnp.sum(want_new) - jnp.sum(fits)

    # dest slot for new gaussian with rank r = index of r-th free slot
    slot_of_rank = jnp.full((cap + 1,), cap, jnp.int32)
    slot_of_rank = slot_of_rank.at[
        jnp.where(free, free_rank, cap)
    ].set(jnp.arange(cap, dtype=jnp.int32), mode="drop")
    dest = jnp.where(fits, slot_of_rank[jnp.clip(new_rank, 0, cap - 1)], cap)

    out = {}
    for k, v in params.items():
        padded = jnp.concatenate([v, jnp.zeros((1,) + v.shape[1:], v.dtype)], 0)
        out[k] = padded.at[dest].set(new_params[k], mode="drop")[:cap]
    alive = (
        jnp.concatenate([state.alive, jnp.zeros((1,), bool)], 0)
        .at[dest]
        .set(True, mode="drop")[:cap]
    )
    written = (
        jnp.zeros((cap + 1,), bool).at[dest].set(True, mode="drop")[:cap]
    )
    return out, alive, num_dropped, written


def refine_gaussians(
    key: jax.Array,
    params: dict[str, jax.Array],
    state: SplatState,
    config: SplatfactoConfig,
    step: int,
    scene_extent: float = 1.0,
) -> tuple[dict[str, jax.Array], SplatState, dict[str, jax.Array]]:
    """One splatfacto refinement pass (call every ``refine_every`` steps
    after warmup): densify (dup small / split large high-gradient
    Gaussians), then cull by opacity / world scale / screen size.

    All decisions are masked ops on the fixed-capacity buffer; split/dup
    children go into dead slots via cumsum compaction. Returns info dict
    with counts for logging (no silent caps).
    """
    cap = config.capacity
    avg_grad = state.grad_accum / jnp.maximum(state.vis_count, 1)
    high_grad = (avg_grad > config.densify_grad_thresh) & state.alive
    scales = jnp.exp(params["scales"])
    max_scale = jnp.max(scales, axis=-1)

    do_densify = step < config.stop_split_at
    check_screen = step > config.stop_screen_size_at

    splits = high_grad & (max_scale > config.densify_size_thresh * scene_extent)
    if check_screen:
        splits = splits | (state.alive & (state.max_radii > config.split_screen_size))
    dups = high_grad & ~splits
    splits = splits & do_densify
    dups = dups & do_densify

    num_budget_capped = jnp.int32(0)
    if config.refine_cap_to_budget:
        # Admit candidates in descending avg-grad priority while their
        # children fit the free-slot budget. A split funds n_samp-1 new rows
        # (sample 0 replaces the original in place), a dup funds 1. Capping
        # BEFORE the in-place overwrite is the point: an unfunded split must
        # leave its original untouched, not shrink it and drop the children.
        num_free = jnp.sum(~state.alive)
        n_child = config.n_split_samples - 1
        cost = jnp.where(splits, n_child, 0) + jnp.where(dups, 1, 0)
        prio = jnp.where(splits | dups, avg_grad, -jnp.inf)
        order = jnp.argsort(-prio)
        fits_sorted = jnp.cumsum(cost[order]) <= num_free
        keep = jnp.zeros((cap,), bool).at[order].set(fits_sorted)
        num_budget_capped = jnp.sum((splits | dups) & ~keep)
        splits = splits & keep
        dups = dups & keep

    # --- children ---------------------------------------------------------
    k_samp, k_quat = jax.random.split(key)
    n_samp = config.n_split_samples
    # split: sample inside the gaussian, shrink scales by 1.6 (splatfacto)
    rot = quat_to_rotmat(params["quats"])  # (N, 3, 3)
    eps = jax.random.normal(k_samp, (n_samp, cap, 3)) * scales[None]
    offsets = jnp.einsum("nij,snj->sni", rot, eps)
    split_means = params["means"][None] + offsets  # (S, N, 3)
    split_scales = jnp.log(jnp.maximum(scales / 1.6, 1e-10))

    def child_rows(mask, means_rows, scales_rows):
        rows = {
            "means": means_rows,
            "scales": scales_rows,
            "quats": params["quats"],
            "opacities": params["opacities"],
            "features_dc": params["features_dc"],
            "features_rest": params["features_rest"],
        }
        if "log_uncertainties" in params:
            # carried through split (`activesplatfacto_model.py:102-140`)
            rows["log_uncertainties"] = params["log_uncertainties"]
        return rows

    # new rows = [dup copies] + [split samples 1..S-1]; the original slot of
    # a split gaussian is overwritten in place with sample 0.
    new_rows = jax.tree.map(
        lambda *xs: jnp.concatenate(xs, 0),
        child_rows(dups, params["means"], params["scales"]),
        *[
            child_rows(splits, split_means[s], split_scales)
            for s in range(1, n_samp)
        ],
    )
    want_new = jnp.concatenate([dups] + [splits] * (n_samp - 1), 0)

    params = dict(params)
    params["means"] = jnp.where(splits[:, None], split_means[0], params["means"])
    params["scales"] = jnp.where(splits[:, None], split_scales, params["scales"])

    params, alive, dropped, written = _compact_into_free(
        params, state, new_rows, want_new
    )

    # --- cull -------------------------------------------------------------
    opac = jax.nn.sigmoid(params["opacities"])
    cull = opac < config.cull_alpha_thresh
    # Non-finite slots are unrenderable AND immortal under the ordinary
    # tests (NaN comparisons are False), so they would hog capacity forever
    # — cull them explicitly. Healthy training never trips this; it is the
    # backstop for any future grad blow-up.
    finite = jnp.ones((cap,), bool)
    for v in params.values():
        finite = finite & jnp.isfinite(v.reshape(cap, -1)).all(axis=1)
    cull = cull | ~finite
    if step > config.refine_every * config.reset_alpha_every:
        cull = cull | (jnp.max(jnp.exp(params["scales"]), -1) > config.cull_scale_thresh * scene_extent)
        if check_screen:
            cull = cull | (state.max_radii > config.cull_screen_size)
    alive = alive & ~cull

    info = {
        "num_alive": jnp.sum(alive),
        "num_split": jnp.sum(splits),
        "num_dup": jnp.sum(dups),
        "num_culled": jnp.sum(cull & state.alive),
        "num_nonfinite": jnp.sum(~finite & state.alive),
        "num_dropped_capacity": dropped,
        "num_budget_capped": num_budget_capped,
        # slots whose Gaussian was replaced this refine (new children +
        # in-place split sample 0) — their Adam moments must be zeroed
        # (splatfacto's dup_in_optim semantics)
        "touched_slots": written | splits,
    }
    new_state = SplatState(
        alive=alive,
        grad_accum=jnp.zeros((cap,)),
        vis_count=jnp.zeros((cap,), jnp.int32),
        max_radii=jnp.zeros((cap,)),
    )
    return params, new_state, info


def reset_opacities(
    params: dict[str, jax.Array], config: SplatfactoConfig
) -> dict[str, jax.Array]:
    """Opacity reset (every reset_alpha_every refines): clamp to 2x cull
    threshold so culling re-evaluates everything."""
    reset_val = jnp.log(
        config.cull_alpha_thresh * 2.0 / (1.0 - config.cull_alpha_thresh * 2.0)
    )
    out = dict(params)
    out["opacities"] = jnp.minimum(params["opacities"], reset_val)
    return out
