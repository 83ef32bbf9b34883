"""Rasterize-capacity auto-tuner: exact tile counts + overflow-free budgets.

The reference's gsplat rasterizer sizes its per-tile intersection lists
dynamically per frame (`activesplatfacto_model.py:260-273`); our
static-shape design replaces that with a probed per-scene budget
(`ops/rasterize.tile_hit_counts` + `models/splatfacto.
tune_rasterize_capacity`). These tests pin (a) the counting op to a
brute-force O(T*N) oracle using the selection's own predicates, and (b)
the tuned budget to zero reported overflow.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from uncertainty_nerf_gs_tpu.cameras.cameras import Cameras
from uncertainty_nerf_gs_tpu.models import splatfacto as sf
from uncertainty_nerf_gs_tpu.ops.gaussians import Projection
from uncertainty_nerf_gs_tpu.ops.rasterize import TILE, tile_hit_counts


def _fake_proj(rng, n, width, height, spread=1.5):
    """Random screen-space Gaussians, some off-screen / invalid / huge."""
    means2d = rng.uniform(
        [-spread * width, -spread * height],
        [(1 + spread) * width, (1 + spread) * height],
        size=(n, 2),
    )
    radii = rng.uniform(0.0, 0.3 * max(width, height), size=(n,))
    valid = rng.uniform(size=(n,)) > 0.2
    return Projection(
        means2d=jnp.asarray(means2d, jnp.float32),
        depths=jnp.asarray(rng.uniform(0.1, 5.0, (n,)), jnp.float32),
        conics=jnp.zeros((n, 3), jnp.float32),
        radii=jnp.asarray(radii, jnp.float32),
        compensation=jnp.ones((n,), jnp.float32),
        valid=jnp.asarray(valid),
    )


def _brute_counts(proj, width, height):
    """O(T*N) oracle using the selection predicates verbatim
    (ops/rasterize._selection row_select/select_fn)."""
    num_tx = -(-width // TILE)
    num_ty = -(-height // TILE)
    m = np.asarray(proj.means2d, np.float64)
    r = np.asarray(proj.radii, np.float64)
    v = np.asarray(proj.valid)
    tile = np.zeros((num_ty, num_tx), np.int64)
    row = np.zeros((num_ty,), np.int64)
    for ty in range(num_ty):
        y0 = ty * TILE
        hit_y = v & (m[:, 1] + r >= y0) & (m[:, 1] - r <= y0 + TILE)
        row[ty] = hit_y.sum()
        for tx in range(num_tx):
            x0 = tx * TILE
            hit = hit_y & (m[:, 0] + r >= x0) & (m[:, 0] - r <= x0 + TILE)
            tile[ty, tx] = hit.sum()
    return tile, row


def test_tile_hit_counts_matches_bruteforce(rng):
    width, height = 72, 40  # non-multiples of TILE: exercises the pad
    proj = _fake_proj(rng, 400, width, height)
    counts = jax.jit(tile_hit_counts, static_argnums=(1, 2))(
        proj, width, height
    )
    tile_ref, row_ref = _brute_counts(proj, width, height)
    np.testing.assert_array_equal(np.asarray(counts.tile), tile_ref)
    np.testing.assert_array_equal(np.asarray(counts.row), row_ref)


def test_tile_hit_counts_exact_tie_boundaries():
    """Gaussians whose bbox lands EXACTLY on tile edges (the >= / <= ties
    the selection treats as hits) — exactly representable float coords."""
    # center on a tile corner with radius = one tile: touches a 3x3 block
    # (ties at both outer edges), plus a zero-radius point on a corner
    means = jnp.asarray(
        [[32.0, 32.0], [16.0, 16.0], [0.0, 0.0], [48.0, 16.0]], jnp.float32
    )
    radii = jnp.asarray([16.0, 0.0, 8.0, 16.0], jnp.float32)
    n = means.shape[0]
    proj = Projection(
        means2d=means,
        depths=jnp.ones((n,)),
        conics=jnp.zeros((n, 3)),
        radii=radii,
        compensation=jnp.ones((n,)),
        valid=jnp.ones((n,), bool),
    )
    width = height = 64
    counts = tile_hit_counts(proj, width, height)
    tile_ref, row_ref = _brute_counts(proj, width, height)
    np.testing.assert_array_equal(np.asarray(counts.tile), tile_ref)
    np.testing.assert_array_equal(np.asarray(counts.row), row_ref)


def _tiny_scene(rng, n_cams=3):
    cfg = sf.SplatfactoConfig(
        capacity=512,
        num_random=400,
        random_scale=1.0,
        rasterize_capacity=64,  # deliberately tiny: the tuner must grow it
        rasterize_capacity_auto=True,
        sh_degree=1,
    )
    params, state = sf.init_gaussians(jax.random.PRNGKey(0), cfg)
    c2ws = []
    for i in range(n_cams):
        th = 2 * np.pi * i / n_cams
        # camera at radius 3 looking at the origin (OpenGL -z forward)
        pos = np.array([3 * np.sin(th), 0.0, 3 * np.cos(th)])
        z = pos / np.linalg.norm(pos)
        x = np.cross([0.0, 1.0, 0.0], z)
        x /= np.linalg.norm(x)
        y = np.cross(z, x)
        c2ws.append(np.stack([x, y, z, pos], axis=-1))
    cams = Cameras(
        camera_to_worlds=jnp.asarray(np.stack(c2ws), jnp.float32),
        fx=jnp.full((n_cams,), 60.0),
        fy=jnp.full((n_cams,), 60.0),
        cx=jnp.full((n_cams,), 32.0),
        cy=jnp.full((n_cams,), 24.0),
        width=64,
        height=48,
    )
    return cfg, params, state, cams


def _probe_maxima(cfg, params, state, cams):
    max_tile = max_row = 0
    for i in range(len(cams)):
        cam = jax.tree.map(lambda x: x[i], cams)
        counts = sf.probe_tile_counts(
            params, state.alive, cam.camera_to_worlds, cam.fx, cam.fy,
            cam.cx, cam.cy, cams.width, cams.height, cfg,
        )
        max_tile = max(max_tile, int(jnp.max(counts.tile)))
        max_row = max(max_row, int(jnp.max(counts.row)))
    return max_tile, max_row


def test_tuned_capacity_renders_overflow_free(rng):
    cfg, params, state, cams = _tiny_scene(rng)
    tuned = sf.tune_rasterize_capacity(cfg, params, state.alive, cams)
    max_tile, max_row = _probe_maxima(cfg, params, state, cams)
    assert tuned.rasterize_capacity >= max_tile
    assert tuned.rasterize_row_capacity >= max_row
    assert tuned.rasterize_capacity % 64 == 0
    for i in range(len(cams)):
        cam = jax.tree.map(lambda x: x[i], cams)
        out = sf.render_splat(
            params, state.alive, cam.camera_to_worlds,
            cam.fx, cam.fy, cam.cx, cam.cy, cams.width, cams.height, tuned,
        )
        assert int(out["raster_overflow"]) == 0, f"camera {i} overflowed"


def test_tuner_respects_capacity_max(rng):
    cfg, params, state, cams = _tiny_scene(rng)
    capped = dataclasses.replace(cfg, rasterize_capacity_max=128)
    tuned = sf.tune_rasterize_capacity(capped, params, state.alive, cams)
    max_tile, _ = _probe_maxima(cfg, params, state, cams)
    want = min(
        max(-(-int(max_tile * cfg.rasterize_capacity_margin) // 64) * 64, 64),
        128,
    )
    assert tuned.rasterize_capacity == want


def test_trainer_auto_capacity_and_retune(rng):
    from uncertainty_nerf_gs_tpu.engine.splat_trainer import SplatfactoTrainer

    cfg, params, state, cams = _tiny_scene(rng)
    images = np.asarray(
        rng.uniform(size=(len(cams), cams.height, cams.width, 3)), np.float32
    )
    trainer = SplatfactoTrainer(config=cfg, cameras=cams, images=images)
    assert trainer.config.rasterize_capacity > 64
    # retune never shrinks and reports no re-jit when the budget still holds
    cap_before = trainer.config.rasterize_capacity
    assert trainer.retune_capacity() is False
    assert trainer.config.rasterize_capacity == cap_before
