"""Tests for the 3DGS stack: projection, SH, tile rasterizer, refinement.

Oracles per SURVEY §4: the tile rasterizer is checked against the slow
O(N*H*W) per-pixel reference blend; projection against hand-computed
cases; refinement against invariants (capacity conservation, alive-mask
consistency).
"""

import dataclasses
import functools
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from uncertainty_nerf_gs_tpu.ops.gaussians import (
    project_gaussians,
    quat_to_rotmat,
    scale_rot_to_cov3d,
)
from uncertainty_nerf_gs_tpu.ops.rasterize import (
    rasterize_gaussians,
    rasterize_reference,
)
from uncertainty_nerf_gs_tpu.ops import sh as sh_ops
from uncertainty_nerf_gs_tpu.models import splatfacto as sf


def test_quat_to_rotmat_identity_and_orthonormal(rng):
    ident = quat_to_rotmat(jnp.array([[1.0, 0, 0, 0]]))
    np.testing.assert_allclose(np.asarray(ident[0]), np.eye(3), atol=1e-6)
    q = jnp.asarray(rng.normal(size=(10, 4)).astype(np.float32))
    R = np.asarray(quat_to_rotmat(q))
    for r in R:
        np.testing.assert_allclose(r @ r.T, np.eye(3), atol=1e-5)
        assert np.linalg.det(r) == pytest.approx(1.0, abs=1e-5)


def test_cov3d_isotropic():
    s = jnp.array([[0.5, 0.5, 0.5]])
    q = jnp.array([[0.7, 0.1, -0.3, 0.2]])  # any rotation
    cov = np.asarray(scale_rot_to_cov3d(s, q))[0]
    np.testing.assert_allclose(cov, 0.25 * np.eye(3), atol=2e-3)  # fp32 quat norm


def _simple_camera(w=64, h=48):
    viewmat = jnp.eye(4)  # camera at origin looking +z
    fx = fy = 50.0
    cx, cy = w / 2, h / 2
    return viewmat, fx, fy, cx, cy, w, h


def test_projection_center_gaussian():
    viewmat, fx, fy, cx, cy, w, h = _simple_camera()
    means = jnp.array([[0.0, 0.0, 2.0], [0.0, 0.0, -1.0]])  # second behind cam
    scales = jnp.full((2, 3), 0.1)
    quats = jnp.tile(jnp.array([[1.0, 0, 0, 0]]), (2, 1))
    proj = project_gaussians(means, scales, quats, viewmat, fx, fy, cx, cy, w, h)
    assert bool(proj.valid[0]) and not bool(proj.valid[1])
    np.testing.assert_allclose(np.asarray(proj.means2d[0]), [cx, cy], atol=1e-4)
    assert float(proj.depths[0]) == pytest.approx(2.0)
    # isotropic world scale 0.1 at z=2 with f=50 -> ~2.5px std, radius ~3 sigma
    assert 5.0 < float(proj.radii[0]) < 12.0
    assert 0.5 < float(proj.compensation[0]) <= 1.0


def _random_scene(rng, n=100, w=64, h=48):
    viewmat, fx, fy, cx, cy, w, h = _simple_camera(w, h)
    means = jnp.asarray(
        np.stack(
            [
                rng.uniform(-1.0, 1.0, n),
                rng.uniform(-0.8, 0.8, n),
                rng.uniform(1.5, 4.0, n),
            ],
            -1,
        ).astype(np.float32)
    )
    scales = jnp.asarray(rng.uniform(0.02, 0.12, (n, 3)).astype(np.float32))
    quats = jnp.asarray(rng.normal(size=(n, 4)).astype(np.float32))
    proj = project_gaussians(means, scales, quats, viewmat, fx, fy, cx, cy, w, h)
    opac = jnp.asarray(rng.uniform(0.2, 0.9, n).astype(np.float32)) * proj.compensation
    payload = jnp.asarray(rng.uniform(0.0, 1.0, (n, 5)).astype(np.float32))
    return proj, opac, payload, w, h


def test_rasterize_matches_reference_oracle(rng):
    proj, opac, payload, w, h = _random_scene(rng)
    fast = rasterize_gaussians(proj, opac, payload, w, h, capacity=128, tile_chunk=4)
    ref_img, ref_alpha = rasterize_reference(proj, opac, payload, w, h)
    assert int(fast.max_overflow) == 0
    np.testing.assert_allclose(np.asarray(fast.image), np.asarray(ref_img), atol=1e-4)
    np.testing.assert_allclose(np.asarray(fast.alpha), np.asarray(ref_alpha), atol=1e-4)
    assert np.all(np.asarray(fast.alpha) <= 1.0 + 1e-5)


def test_rasterize_capacity_overflow_reported(rng):
    proj, opac, payload, w, h = _random_scene(rng, n=100)
    out = rasterize_gaussians(proj, opac, payload, w, h, capacity=8, tile_chunk=4)
    assert int(out.max_overflow) > 0  # 100 gaussians over a 64x48 image


def test_select_and_pack_matmul_matches_gather(rng):
    """The one-hot MXU matmul compaction must reproduce the scatter+gather
    pack exactly: live packed rows, counts, overflows, and the composited
    image + gradients (ops/rasterize.py::pack_fn)."""
    from uncertainty_nerf_gs_tpu.ops.rasterize import select_and_pack

    proj, opac, payload, w, h = _random_scene(rng, n=120)
    a = select_and_pack(proj, opac, payload, w, h, capacity=32,
                        tile_chunk=4, pack_via="gather")
    b = select_and_pack(proj, opac, payload, w, h, capacity=32,
                        tile_chunk=4, pack_via="matmul")
    np.testing.assert_array_equal(np.asarray(a.counts), np.asarray(b.counts))
    np.testing.assert_array_equal(
        np.asarray(a.overflows), np.asarray(b.overflows))
    # only live slots must agree (pad slots differ by construction:
    # gather packs the -1e6 pad row, matmul emits zeros)
    live = np.arange(32)[None, :] < np.asarray(a.counts)[:, None]
    pa, pb = np.asarray(a.packed), np.asarray(b.packed)
    np.testing.assert_allclose(pa[live], pb[live], atol=1e-6, rtol=0)
    np.testing.assert_allclose(np.asarray(a.pix), np.asarray(b.pix))

    def loss(via, means2d, op, pv):
        out = rasterize_gaussians(
            proj._replace(means2d=means2d), op, pv, w, h, capacity=32,
            tile_chunk=4, backend="xla" if via == "ref" else "pallas",
            pack_via=via if via != "ref" else "gather",
        )
        return jnp.sum(out.image**2) + jnp.sum(out.alpha * out.alpha)

    for via in ("gather", "matmul"):
        l, g = jax.value_and_grad(
            functools.partial(loss, via), argnums=(0, 1, 2)
        )(proj.means2d, opac, payload)
        if via == "gather":
            l0, g0 = l, g
        else:
            np.testing.assert_allclose(float(l), float(l0), rtol=1e-6)
            for ga, gb in zip(g0, g):
                np.testing.assert_allclose(
                    np.asarray(ga), np.asarray(gb), atol=1e-5, rtol=1e-5)


def test_rasterize_differentiable(rng):
    proj, opac, payload, w, h = _random_scene(rng, n=30)

    def loss(means2d, op, pv):
        out = rasterize_gaussians(
            proj._replace(means2d=means2d), op, pv, w, h, capacity=64, tile_chunk=4
        )
        return jnp.sum(out.image**2) + jnp.sum(out.alpha)

    g_mu, g_op, g_pv = jax.grad(loss, argnums=(0, 1, 2))(
        proj.means2d, opac, payload
    )
    for g in (g_mu, g_op, g_pv):
        arr = np.asarray(g)
        assert np.isfinite(arr).all()
        assert np.abs(arr).sum() > 0.0


def test_sh_degree0_is_constant(rng):
    coeffs = jnp.asarray(rng.normal(size=(5, 16, 3)).astype(np.float32))
    dirs = jnp.asarray(rng.normal(size=(5, 3)).astype(np.float32))
    rgb = sh_ops.eval_sh_colors(3, coeffs, dirs, active_degree=0)
    expected = 0.28209479177387814 * np.asarray(coeffs[:, 0, :])
    np.testing.assert_allclose(np.asarray(rgb), expected, rtol=1e-5)


def test_sh_basis_orthonormal_mc(rng):
    # MC check: E_{uniform sphere}[Y_i Y_j] = delta_ij / (4 pi)
    d = rng.normal(size=(200_000, 3))
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    basis = np.asarray(sh_ops.sh_basis(2, jnp.asarray(d.astype(np.float32))))
    gram = basis.T @ basis / d.shape[0] * 4 * np.pi
    np.testing.assert_allclose(gram, np.eye(9), atol=0.05)


@pytest.fixture(scope="module")
def splat_setup():
    cfg = sf.SplatfactoConfig(
        capacity=256,
        num_random=64,
        random_scale=0.5,
        rasterize_capacity=64,
        tile_chunk=4,
        sh_degree=1,
        uncertainty_channels=1,
    )
    params, state = sf.init_gaussians(jax.random.PRNGKey(0), cfg)
    return cfg, params, state


def test_init_gaussians_shapes(splat_setup):
    cfg, params, state = splat_setup
    assert params["means"].shape == (256, 3)
    assert params["features_rest"].shape == (256, 3, 3)  # degree 1: 4-1 bases...
    assert params["log_uncertainties"].shape == (256, 1)
    assert int(jnp.sum(state.alive)) == 64


def test_render_splat_outputs(splat_setup):
    cfg, params, state = splat_setup
    c2w = jnp.array(
        [[1.0, 0, 0, 0], [0, 1.0, 0, 0], [0, 0, 1.0, 2.0]]
    )  # at z=+2 looking along -z (OpenGL)
    out = sf.render_splat(
        params, state.alive, c2w, 40.0, 40.0, 32.0, 24.0, 64, 48, cfg,
        background=jnp.zeros(3),
    )
    assert out["rgb"].shape == (48, 64, 3)
    assert out["depth"].shape == (48, 64)
    assert out["uncertainty"].shape == (48, 64)
    for k in ("rgb", "depth", "depth_var", "accumulation", "uncertainty"):
        assert np.isfinite(np.asarray(out[k])).all(), k
    assert float(jnp.max(out["accumulation"])) > 0.01  # something rendered
    # uncertainty map >= 0 (softplus+beta_min composited)
    assert float(jnp.min(out["uncertainty"])) >= 0.0


def test_splat_loss_grads(splat_setup):
    cfg, params, state = splat_setup
    c2w = jnp.array([[1.0, 0, 0, 0], [0, 1.0, 0, 0], [0, 0, 1.0, 2.0]])
    gt = jnp.full((48, 64, 3), 0.5)

    def loss_fn(p):
        out = sf.render_splat(
            p, state.alive, c2w, 40.0, 40.0, 32.0, 24.0, 64, 48, cfg,
            background=jnp.zeros(3),
        )
        total, _ = sf.splatfacto_loss(out, gt, p, cfg)
        return total

    val, grads = jax.value_and_grad(loss_fn)(params)
    assert np.isfinite(float(val))
    for k, g in grads.items():
        assert np.isfinite(np.asarray(g)).all(), k
    assert np.abs(np.asarray(grads["means"])).sum() > 0


def test_refine_conserves_capacity(splat_setup):
    cfg, params, state = splat_setup
    # force some gradient stats: all alive got high grads, large scales split
    state = state._replace(
        grad_accum=jnp.where(state.alive, 1.0, 0.0),
        vis_count=jnp.ones_like(state.vis_count),
    )
    new_params, new_state, info = sf.refine_gaussians(
        jax.random.PRNGKey(1), params, state, cfg, step=1000
    )
    assert new_params["means"].shape == (cfg.capacity, 3)
    assert int(info["num_alive"]) <= cfg.capacity
    assert int(info["num_split"]) + int(info["num_dup"]) > 0
    assert np.isfinite(np.asarray(new_params["means"])).all()


def _refine_toy_params(cap: int):
    """Hand-built buffer where every alive slot is a split candidate
    (unit scales >> densify_size_thresh, opacity ~0.95)."""
    quats = jnp.tile(jnp.array([[1.0, 0.0, 0.0, 0.0]]), (cap, 1))
    return {
        "means": jnp.arange(cap * 3, dtype=jnp.float32).reshape(cap, 3),
        "scales": jnp.zeros((cap, 3)),  # exp -> 1.0, splits at thresh 0.01
        "quats": quats,
        "opacities": jnp.full((cap,), 3.0),
        "features_dc": jnp.zeros((cap, 3)),
        "features_rest": jnp.zeros((cap, 3, 3)),
    }


def test_refine_saturated_leaves_originals_untouched():
    """At full capacity no split can fund its children, so the budget cap
    must leave every original in place (the pre-fix behavior overwrote them
    with 1.6x-shrunk samples while dropping the children — the 16k-soak
    collapse)."""
    cap = 32
    cfg = sf.SplatfactoConfig(capacity=cap, n_split_samples=2)
    params = _refine_toy_params(cap)
    state = sf.SplatState(
        alive=jnp.ones((cap,), bool),
        grad_accum=jnp.ones((cap,)),
        vis_count=jnp.ones((cap,), jnp.int32),
        max_radii=jnp.zeros((cap,)),
    )
    new_params, new_state, info = sf.refine_gaussians(
        jax.random.PRNGKey(0), params, state, cfg, step=1000
    )
    assert int(info["num_split"]) == 0 and int(info["num_dup"]) == 0
    assert int(info["num_budget_capped"]) == cap
    assert int(info["num_dropped_capacity"]) == 0
    np.testing.assert_array_equal(
        np.asarray(new_params["means"]), np.asarray(params["means"])
    )
    np.testing.assert_array_equal(
        np.asarray(new_params["scales"]), np.asarray(params["scales"])
    )
    # legacy behavior check: without the cap the originals get shrunk
    cfg_off = sf.SplatfactoConfig(
        capacity=cap, n_split_samples=2, refine_cap_to_budget=False
    )
    legacy, _, legacy_info = sf.refine_gaussians(
        jax.random.PRNGKey(0), params, state, cfg_off, step=1000
    )
    assert int(legacy_info["num_dropped_capacity"]) > 0
    assert np.abs(np.asarray(legacy["scales"]) - np.asarray(params["scales"])).sum() > 0


def test_refine_budget_cap_admits_highest_gradient():
    """Partially saturated: only the top-num_free candidates by average
    screen-space gradient are admitted; the rest stay untouched."""
    cap, n_alive = 32, 27  # 5 free slots, each split funds 1 child (S=2)
    cfg = sf.SplatfactoConfig(capacity=cap, n_split_samples=2)
    params = _refine_toy_params(cap)
    alive = jnp.arange(cap) < n_alive
    grads = jnp.where(alive, 0.01 * (1.0 + jnp.arange(cap, dtype=jnp.float32)), 0.0)
    state = sf.SplatState(
        alive=alive,
        grad_accum=grads,
        vis_count=jnp.ones((cap,), jnp.int32),
        max_radii=jnp.zeros((cap,)),
    )
    new_params, new_state, info = sf.refine_gaussians(
        jax.random.PRNGKey(0), params, state, cfg, step=1000
    )
    assert int(info["num_split"]) == 5
    assert int(info["num_budget_capped"]) == n_alive - 5
    assert int(info["num_dropped_capacity"]) == 0
    touched = np.asarray(info["touched_slots"])
    # admitted splits = the 5 highest-grad alive slots (22..26)
    assert touched[22:27].all()
    assert not touched[:22].any()
    np.testing.assert_array_equal(
        np.asarray(new_params["means"][:22]), np.asarray(params["means"][:22])
    )


def test_nll_ramp_blends_to_l1(splat_setup):
    cfg, params, state = splat_setup
    cfg_ramp = dataclasses.replace(cfg, nll_ramp_after_reset=200)
    c2w = jnp.array([[1.0, 0, 0, 0], [0, 1.0, 0, 0], [0, 0, 1.0, 2.0]])
    gt = jnp.zeros((48, 64, 3))
    out = sf.render_splat(
        params, state.alive, c2w, 40.0, 40.0, 32.0, 24.0, 64, 48, cfg,
        background=jnp.zeros(3),
    )
    _, losses_w1 = sf.splatfacto_loss(out, gt, params, cfg_ramp, nll_weight=1.0)
    _, losses_ref = sf.splatfacto_loss(out, gt, params, cfg, nll_weight=0.33)
    # weight 1 == reference NLL; with ramping disabled the weight is ignored
    np.testing.assert_allclose(
        float(losses_w1["nll_loss"]), float(losses_ref["nll_loss"]), rtol=1e-6
    )
    _, losses_w0 = sf.splatfacto_loss(out, gt, params, cfg_ramp, nll_weight=0.0)
    l1 = float(jnp.mean(jnp.abs(out["rgb"] - gt)))
    np.testing.assert_allclose(
        float(losses_w0["nll_loss"]), (1.0 - cfg.ssim_lambda) * l1, rtol=1e-5
    )


def test_opacity_reset(splat_setup):
    cfg, params, _ = splat_setup
    out = sf.reset_opacities(params, cfg)
    max_op = float(jnp.max(jax.nn.sigmoid(out["opacities"])))
    assert max_op <= cfg.cull_alpha_thresh * 2.0 + 1e-5


def test_rasterize_pallas_matches_xla(rng):
    """Pallas fused compositing == XLA map path (values and grads)."""
    proj, opac, payload, w, h = _random_scene(rng, n=60)

    kw = dict(capacity=128, tile_chunk=4)
    out_x = rasterize_gaussians(proj, opac, payload, w, h, backend="xla", **kw)
    out_p = rasterize_gaussians(proj, opac, payload, w, h, backend="pallas", **kw)
    np.testing.assert_allclose(
        np.asarray(out_p.image), np.asarray(out_x.image), atol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(out_p.alpha), np.asarray(out_x.alpha), atol=2e-5
    )

    def loss(backend, mu, op, pv):
        out = rasterize_gaussians(
            proj._replace(means2d=mu), op, pv, w, h, backend=backend, **kw
        )
        return jnp.sum(out.image**2) + jnp.sum(out.alpha * 0.3)

    gx = jax.grad(functools.partial(loss, "xla"), argnums=(0, 1, 2))(
        proj.means2d, opac, payload
    )
    gp = jax.grad(functools.partial(loss, "pallas"), argnums=(0, 1, 2))(
        proj.means2d, opac, payload
    )
    for a, b, name in zip(gp, gx, ("means2d", "opac", "payload")):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-4, rtol=1e-3, err_msg=name
        )


def test_depth_var_indirection_matches_oracle(splat_setup):
    """depth_var_mode="indirection" reproduces the reference-indirection
    oracle (experiments/depth_var_oracle.py) on a random scene, and its
    depth output is unchanged from the moments mode."""
    import dataclasses
    import sys as _s
    from pathlib import Path

    _s.path.insert(0, str(Path(__file__).resolve().parents[1] / "experiments"))
    from depth_var_oracle import depth_var_reference_indirection

    cfg, params, state = splat_setup
    cfg_ind = dataclasses.replace(cfg, depth_var_mode="indirection")
    c2w = jnp.asarray(
        [[1.0, 0, 0, 0], [0, 1.0, 0, 0], [0, 0, 1.0, 3.0]], jnp.float32
    )
    args = (params, state.alive, c2w, 40.0, 40.0, 32.0, 24.0, 64, 48)
    out_m = sf.render_splat(*args, cfg)
    out_i = sf.render_splat(*args, cfg_ind)
    oracle = depth_var_reference_indirection(*args, cfg_ind)
    np.testing.assert_allclose(
        np.asarray(out_i["depth"]), np.asarray(out_m["depth"]), atol=1e-6
    )
    covered = np.asarray(out_i["accumulation"]) > 0
    np.testing.assert_allclose(
        np.asarray(out_i["depth_var"])[covered],
        np.asarray(oracle["depth_var"])[covered],
        rtol=1e-4, atol=1e-5,
    )
    # the two semantics genuinely differ (they are near-uncorrelated on
    # trained models — evidence/depth_var_compare_r4.json)
    assert float(np.abs(
        np.asarray(out_i["depth_var"]) - np.asarray(out_m["depth_var"])
    ).max()) > 1e-4


def test_rasterize_matmul_matches_xla(rng):
    """MXU-matmul compositing (log-space transmittance prefix) == XLA map
    path, values and grads."""
    proj, opac, payload, w, h = _random_scene(rng, n=60)

    kw = dict(capacity=128, tile_chunk=4)
    out_x = rasterize_gaussians(proj, opac, payload, w, h, backend="xla", **kw)
    out_m = rasterize_gaussians(
        proj, opac, payload, w, h, backend="matmul", **kw
    )
    np.testing.assert_allclose(
        np.asarray(out_m.image), np.asarray(out_x.image), atol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(out_m.alpha), np.asarray(out_x.alpha), atol=2e-5
    )
    assert int(out_m.max_overflow) == int(out_x.max_overflow)

    def loss(backend, mu, op, pv):
        out = rasterize_gaussians(
            proj._replace(means2d=mu), op, pv, w, h, backend=backend, **kw
        )
        return jnp.sum(out.image**2) + jnp.sum(out.alpha * 0.3)

    gx = jax.grad(functools.partial(loss, "xla"), argnums=(0, 1, 2))(
        proj.means2d, opac, payload
    )
    gm = jax.grad(functools.partial(loss, "matmul"), argnums=(0, 1, 2))(
        proj.means2d, opac, payload
    )
    for a, b, name in zip(gm, gx, ("means2d", "opac", "payload")):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-4, rtol=1e-3, err_msg=name
        )


def test_rasterize_pallas_chunked_saturated(rng):
    """Chunk boundaries + transmittance early-exit: 300 near-opaque
    Gaussians stacked on a small image at capacity 512 crosses multiple
    K-chunks and saturates most pixels; pallas (which SKIPS saturated
    chunks) must still match xla (which composites all K) to fp32 noise,
    values and grads."""
    proj, opac, payload, w, h = _random_scene(rng, n=300, w=32, h=32)
    opac = jnp.minimum(opac * 20.0, 0.995)  # near-opaque: deep saturation

    kw = dict(capacity=512, tile_chunk=4)
    out_x = rasterize_gaussians(proj, opac, payload, w, h, backend="xla", **kw)
    out_p = rasterize_gaussians(proj, opac, payload, w, h, backend="pallas", **kw)
    assert float(jnp.max(out_x.alpha)) > 0.9999  # saturation actually hit
    np.testing.assert_allclose(
        np.asarray(out_p.image), np.asarray(out_x.image), atol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(out_p.alpha), np.asarray(out_x.alpha), atol=2e-5
    )

    def loss(backend, mu, op):
        out = rasterize_gaussians(
            proj._replace(means2d=mu), op, payload, w, h, backend=backend, **kw
        )
        return jnp.sum(out.image**2)

    gx = jax.grad(functools.partial(loss, "xla"), argnums=(0, 1))(
        proj.means2d, opac
    )
    gp = jax.grad(functools.partial(loss, "pallas"), argnums=(0, 1))(
        proj.means2d, opac
    )
    for a, b, name in zip(gp, gx, ("means2d", "opac")):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-4, rtol=1e-3, err_msg=name
        )


def test_rasterize_sharded_matches_single(rng):
    """Tile-band sharding over the 8-device CPU mesh == single-device."""
    from uncertainty_nerf_gs_tpu.parallel.mesh import make_mesh
    from uncertainty_nerf_gs_tpu.parallel.splat_parallel import (
        rasterize_gaussians_sharded,
    )

    proj, opac, payload, w, h = _random_scene(rng, n=80)
    mesh = make_mesh(num_data=len(jax.devices()), num_member=1)
    img_s, alpha_s, _ = rasterize_gaussians_sharded(
        proj, opac, payload, w, h, mesh, capacity=128, tile_chunk=2,
        backend="xla",
    )
    out = rasterize_gaussians(
        proj, opac, payload, w, h, capacity=128, tile_chunk=2, backend="xla"
    )
    np.testing.assert_allclose(
        np.asarray(img_s), np.asarray(out.image), atol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(alpha_s), np.asarray(out.alpha), atol=2e-5
    )


def test_splat_ensemble_single_launch_matches_loop(splat_setup):
    """ensemble_render_splat (one vmapped launch, VERDICT r2 #7) equals the
    sequential per-member loop + combine rule."""
    from uncertainty_nerf_gs_tpu.models.ensemble import (
        combine_ensemble_outputs,
        ensemble_render_splat,
        stack_params,
    )

    cfg, params, state = splat_setup
    # two members: same capacity, different params and alive masks
    p2 = jax.tree.map(lambda x: x + 0.01, params)
    alive2 = jnp.roll(state.alive, 7)
    c2w = jnp.array([[1.0, 0, 0, 0], [0, 1.0, 0, 0], [0, 0, 1.0, 2.0]])
    args = (c2w, 40.0, 40.0, 32.0, 24.0, 64, 48)

    outs = []
    for p, a in ((params, state.alive), (p2, alive2)):
        o = sf.render_splat(
            p, a, *args[:5], args[5], args[6], cfg,
            sh_deg=cfg.sh_degree, background=jnp.zeros(3),
        )
        outs.append(o)
    keys = [k for k in outs[0] if k not in ("radii", "visible", "raster_overflow")]
    expected = combine_ensemble_outputs(
        {k: jnp.stack([o[k] for o in outs]) for k in keys}
    )

    got = ensemble_render_splat(
        stack_params([params, p2]), jnp.stack([state.alive, alive2]),
        *args, cfg, background=jnp.zeros(3),
    )
    assert set(got) == set(expected)
    for k in expected:
        np.testing.assert_allclose(
            np.asarray(got[k]), np.asarray(expected[k]), rtol=1e-5, atol=1e-5,
        )


def test_fixed_eval_background_for_random_config(splat_setup):
    """background_color="random" must eval on nerfstudio's fixed navy, not
    black (reference eval branch, activesplatfacto_model.py:170-173)."""
    cfg, params, state = splat_setup  # background_color defaults to random
    np.testing.assert_allclose(
        np.asarray(sf.fixed_background(cfg)), [0.1490, 0.1647, 0.2157]
    )
    assert np.asarray(
        sf.fixed_background(dataclasses.replace(cfg, background_color="white"))
    ).min() == 1.0
    # a fully-transparent render composites exactly that background
    empty = jnp.zeros_like(state.alive)
    c2w = jnp.array([[1.0, 0, 0, 0], [0, 1.0, 0, 0], [0, 0, 1.0, 2.0]])
    out = sf.render_splat(
        params, empty, c2w, 40.0, 40.0, 32.0, 24.0, 64, 48, cfg,
        background=sf.fixed_background(cfg),
    )
    np.testing.assert_allclose(
        np.asarray(out["rgb"][0, 0]), [0.1490, 0.1647, 0.2157], atol=1e-5
    )


def test_projection_grads_finite_for_collapsed_gaussian():
    """A scale-collapsed Gaussian (det_orig underflows f32) must give FINITE
    gradients: the naive sqrt(maximum(ratio, 0)) compensation backward was
    ct*inf = NaN, which poisoned every geometric param (the r3 soak's 11.7k
    immortal NaN slots)."""
    viewmat, fx, fy, cx, cy, w, h = _simple_camera()
    means = jnp.array([[0.0, 0.0, 2.0], [0.1, 0.0, 2.0]])
    scales = jnp.array([[0.1, 0.1, 0.1], [1e-10, 1e-10, 1e-10]])  # collapsed
    quats = jnp.tile(jnp.array([[1.0, 0, 0, 0]]), (2, 1))

    def loss(m, s, q):
        p = project_gaussians(m, s, q, viewmat, fx, fy, cx, cy, w, h)
        # compensation enters the loss exactly like render_splat does
        # (opacity * compensation), alongside the screen-space terms
        return jnp.sum(p.compensation * 0.7) + jnp.sum(p.means2d) + jnp.sum(p.conics)

    g = jax.grad(loss, argnums=(0, 1, 2))(means, scales, quats)
    for a in g:
        assert np.isfinite(np.asarray(a)).all()
    # healthy gaussian still has a live compensation gradient
    assert np.abs(np.asarray(g[1][0])).sum() > 0
    # and the collapsed one renders invisible (compensation == 0)
    p = project_gaussians(means, scales, quats, viewmat, fx, fy, cx, cy, w, h)
    assert float(p.compensation[1]) == 0.0
    assert float(p.compensation[0]) > 0.9


def test_refine_culls_nonfinite_slots():
    """NaN-param slots compare False in every cull test, making them
    immortal capacity hogs; refine must cull them explicitly."""
    cap = 16
    params = _refine_toy_params(cap)
    params["means"] = params["means"].at[3].set(jnp.nan)
    params["scales"] = params["scales"].at[5].set(jnp.inf)
    cfg = sf.SplatfactoConfig(capacity=cap, num_random=cap)
    state = sf.SplatState(
        alive=jnp.ones((cap,), bool),
        grad_accum=jnp.zeros((cap,)),
        vis_count=jnp.ones((cap,), jnp.int32),
        max_radii=jnp.zeros((cap,)),
    )
    _, new_state, info = sf.refine_gaussians(
        jax.random.PRNGKey(0), params, state, cfg, step=1000
    )
    assert int(info["num_nonfinite"]) == 2
    assert not bool(new_state.alive[3])
    assert not bool(new_state.alive[5])


def test_depth_var_oracle_matches_inpass_semantics(splat_setup):
    """The reference's (d_i - D)^2 re-rasterize indirection
    (`activesplatfacto_model.py:322-356`, JAX oracle in
    experiments/depth_var_oracle.py) vs our in-pass E[d^2]-E[d]^2
    (VERDICT r3 weak #7). They are NOT identical by construction —
    the oracle fetches D at the Gaussian's center pixel — but must
    agree exactly in the single-Gaussian case (variance 0) and be
    strongly rank-correlated on a mixed scene."""
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "experiments"))
    from depth_var_oracle import depth_var_reference_indirection

    cfg, params, state = splat_setup
    c2w = jnp.array([[1.0, 0, 0, 0], [0, 1.0, 0, 0], [0, 0, 1.0, 2.0]])

    # single isolated Gaussian: only slot 0 alive -> both variances ~0
    one = jnp.zeros_like(state.alive).at[0].set(True)
    p1 = dict(params, means=params["means"].at[0].set(jnp.zeros(3)),
              opacities=params["opacities"].at[0].set(4.0))
    ours = sf.render_splat(p1, one, c2w, 40.0, 40.0, 32.0, 24.0, 64, 48,
                           cfg, background=jnp.zeros(3))
    ref = depth_var_reference_indirection(
        p1, one, c2w, 40.0, 40.0, 32.0, 24.0, 64, 48, cfg)
    cov = np.asarray(ref["accumulation"]) > 1e-3
    assert cov.any()
    # in-pass carries a +1e-5 floor; oracle is floorless
    assert np.asarray(ours["depth_var"])[cov].max() < 1e-4
    assert np.asarray(ref["depth_var"])[cov].max() < 1e-4
    np.testing.assert_allclose(np.asarray(ours["depth"])[cov],
                               np.asarray(ref["depth"])[cov], atol=1e-4)

    # mixed scene: both finite, positively correlated where covered
    ours = sf.render_splat(params, state.alive, c2w, 40.0, 40.0, 32.0, 24.0,
                           64, 48, cfg, background=jnp.zeros(3))
    ref = depth_var_reference_indirection(
        params, state.alive, c2w, 40.0, 40.0, 32.0, 24.0, 64, 48, cfg)
    cov = np.asarray(ref["accumulation"]) > 0.1
    assert np.isfinite(np.asarray(ref["depth_var"])).all()
    if cov.sum() > 50:
        a = np.asarray(ours["depth_var"])[cov]
        b = np.asarray(ref["depth_var"])[cov]
        if a.std() > 0 and b.std() > 0:
            assert np.corrcoef(a, b)[0, 1] > 0.5
