"""Kernel-level oracle tests: encodings, ray marching, sampling."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from uncertainty_nerf_gs_tpu.ops.activations import trunc_exp, shifted_softplus
from uncertainty_nerf_gs_tpu.ops.encodings import (
    HashEncoding,
    hash_encoding_lookup,
    hash_grid_resolutions,
    nerf_encoding,
    sh_encoding,
)
from uncertainty_nerf_gs_tpu.ops.raymarch import (
    depth_variance,
    distortion_loss,
    interlevel_loss,
    render_accumulation,
    render_expected_depth,
    render_median_depth,
    render_rgb,
    render_uncertainty,
    render_weights,
    _outer_measure,
)
from uncertainty_nerf_gs_tpu.ops.sampling import (
    RayBundle,
    sample_pdf,
    sample_uniform,
    spacing_piecewise,
    spacing_piecewise_inv,
)
from uncertainty_nerf_gs_tpu.ops.spatial import scene_contraction, contract_to_unit_cube


# ---------------------------------------------------------------- activations


def test_trunc_exp_forward_and_clipped_grad():
    x = jnp.array([-20.0, 0.0, 3.0, 20.0])
    # value clamped above x=15 (overflow guard), exact below
    expected = np.exp(np.minimum(np.asarray(x), 15.0))
    np.testing.assert_allclose(np.asarray(trunc_exp(x)), expected, rtol=1e-5)
    g = jax.grad(lambda v: trunc_exp(v).sum())(x)
    # gradient input clamped to [-15, 15]
    np.testing.assert_allclose(float(g[-1]), np.exp(15.0), rtol=1e-5)
    np.testing.assert_allclose(float(g[0]), np.exp(-15.0), rtol=1e-5)


def test_shifted_softplus_floor():
    x = jnp.array([-100.0, 0.0, 5.0])
    out = shifted_softplus(x, beta_min=0.01)
    assert float(out.min()) >= 0.01 - 1e-7


# ----------------------------------------------------------------- encodings


def test_sh_encoding_constant_and_shape(rng):
    d = rng.normal(size=(50, 3))
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    out = np.asarray(sh_encoding(jnp.asarray(d), levels=4))
    assert out.shape == (50, 16)
    np.testing.assert_allclose(out[:, 0], 0.28209479, rtol=1e-5)


def test_sh_encoding_orthonormal(rng):
    # Monte-Carlo check: int Y_i Y_j dOmega ~ delta_ij (components are
    # orthonormal on the sphere) => 4*pi*mean(Y_i Y_j) ~ I
    n = 200_000
    d = rng.normal(size=(n, 3))
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    y = np.asarray(sh_encoding(jnp.asarray(d), levels=3))
    gram = 4.0 * np.pi * (y.T @ y) / n
    np.testing.assert_allclose(gram, np.eye(9), atol=0.05)


def test_nerf_encoding_shape_and_values():
    x = jnp.array([[0.25, 0.5]])
    out = nerf_encoding(x, num_frequencies=3, min_freq_exp=0.0, max_freq_exp=2.0)
    assert out.shape == (1, 12)
    out_inc = nerf_encoding(x, num_frequencies=3, include_input=True)
    assert out_inc.shape == (1, 14)


def test_hash_encoding_matches_dense_trilinear(rng):
    """On a single dense level, hash lookup == direct trilinear interp."""
    res = 4
    table_size = (res + 1) ** 3  # dense path
    feats = 2
    table = jnp.asarray(rng.normal(size=(1, table_size, feats)).astype(np.float32))
    pts = jnp.asarray(rng.uniform(0, 1, size=(40, 3)).astype(np.float32))
    out = np.asarray(
        hash_encoding_lookup(
            # (1, T, F) -> (1, F, T) lane-major layout
            jnp.transpose(table, (0, 2, 1)), pts, jnp.array([res], jnp.int32), feats
        )
    )

    def dense_lookup(p):
        scaled = np.asarray(p) * res
        base = np.floor(scaled).astype(int)
        frac = scaled - base
        acc = np.zeros(feats, np.float32)
        for dx in (0, 1):
            for dy in (0, 1):
                for dz in (0, 1):
                    cx, cy, cz = base + np.array([dx, dy, dz])
                    w = (
                        (frac[0] if dx else 1 - frac[0])
                        * (frac[1] if dy else 1 - frac[1])
                        * (frac[2] if dz else 1 - frac[2])
                    )
                    idx = cx + (res + 1) * 0 + (cy + cz * (res + 1)) * (res + 1)
                    # dense index: x + res*(y + res*z) per implementation
                    idx = cx + res * (cy + res * cz)
                    acc += w * np.asarray(table[0, idx % table_size])
        return acc

    expected = np.stack([dense_lookup(p) for p in np.asarray(pts)])
    np.testing.assert_allclose(out, expected, rtol=1e-4, atol=1e-6)


def test_hash_encoding_module_grads(rng):
    enc = HashEncoding(num_levels=4, min_res=4, max_res=32, log2_hashmap_size=8)
    pts = jnp.asarray(rng.uniform(0.1, 0.9, size=(16, 3)).astype(np.float32))
    params = enc.init(jax.random.PRNGKey(0), pts)
    out = enc.apply(params, pts)
    assert out.shape == (16, 8)

    def loss(p):
        return jnp.sum(enc.apply(p, pts) ** 2)

    g = jax.grad(loss)(params)
    table_grad = g["params"]["table"]
    assert np.isfinite(np.asarray(table_grad)).all()
    assert float(jnp.abs(table_grad).sum()) > 0


def test_hash_grid_resolutions_growth():
    res = np.asarray(hash_grid_resolutions(16, 16, 2048))
    assert res[0] == 16 and res[-1] == 2048
    assert (np.diff(res) >= 0).all()


# ------------------------------------------------------------------- spatial


def test_scene_contraction_inside_identity_outside_bounded(rng):
    inside = jnp.asarray(rng.uniform(-0.5, 0.5, (10, 3)).astype(np.float32))
    np.testing.assert_allclose(np.asarray(scene_contraction(inside)), np.asarray(inside))
    far = jnp.asarray(rng.uniform(10, 100, (10, 3)).astype(np.float32))
    out = np.asarray(scene_contraction(far))
    assert (np.abs(out) < 2.0).all()
    cube = np.asarray(contract_to_unit_cube(far))
    assert (cube >= 0).all() and (cube <= 1).all()


# ------------------------------------------------------------------ raymarch


def test_render_weights_matches_bruteforce(rng):
    R, S = 6, 32
    dens = jnp.asarray(rng.uniform(0, 3, (R, S)).astype(np.float32))
    deltas = jnp.asarray(rng.uniform(0.01, 0.1, (R, S)).astype(np.float32))
    w = np.asarray(render_weights(dens, deltas))

    tau = np.asarray(dens) * np.asarray(deltas)
    expected = np.zeros((R, S), np.float32)
    for r in range(R):
        T = 1.0
        for i in range(S):
            a = 1 - np.exp(-tau[r, i])
            expected[r, i] = a * T
            T *= np.exp(-tau[r, i])
    np.testing.assert_allclose(w, expected, rtol=1e-3, atol=1e-5)
    assert (w.sum(-1) <= 1.0 + 1e-5).all()


def test_renderers(rng):
    R, S = 4, 16
    w = rng.uniform(0, 1, (R, S)).astype(np.float32)
    w /= w.sum(-1, keepdims=True) * 1.5  # acc < 1
    rgbs = rng.uniform(0, 1, (R, S, 3)).astype(np.float32)
    steps = np.sort(rng.uniform(0.1, 5, (R, S)).astype(np.float32), axis=-1)
    bg = np.ones(3, np.float32)

    comp = np.asarray(render_rgb(jnp.asarray(w), jnp.asarray(rgbs), jnp.asarray(bg)))
    acc = w.sum(-1, keepdims=True)
    np.testing.assert_allclose(
        comp, (w[..., None] * rgbs).sum(1) + (1 - acc) * bg, rtol=1e-5
    )

    np.testing.assert_allclose(
        np.asarray(render_accumulation(jnp.asarray(w))), w.sum(-1), rtol=1e-6
    )

    d = np.asarray(render_expected_depth(jnp.asarray(w), jnp.asarray(steps)))
    np.testing.assert_allclose(
        d, (w * steps).sum(-1) / (w.sum(-1) + 1e-10), rtol=1e-5
    )

    md = np.asarray(render_median_depth(jnp.asarray(w), jnp.asarray(steps)))
    assert ((md >= steps[:, 0]) & (md <= steps[:, -1])).all()

    unc = np.asarray(render_uncertainty(jnp.asarray(rgbs[..., 0]), jnp.asarray(w**2)))
    np.testing.assert_allclose(unc, (rgbs[..., 0] * w**2).sum(-1), rtol=1e-5)

    dv = np.asarray(depth_variance(jnp.asarray(w), jnp.asarray(steps), jnp.asarray(d)))
    np.testing.assert_allclose(
        dv, (w * (steps - d[:, None]) ** 2).sum(-1) + 1e-5, rtol=1e-4
    )


def test_distortion_loss_matches_quadratic_reference(rng):
    R, S = 3, 24
    edges = np.sort(rng.uniform(0, 1, (R, S + 1)).astype(np.float32), axis=-1)
    w = rng.uniform(0, 1, (R, S)).astype(np.float32) * 0.05
    got = float(distortion_loss(jnp.asarray(edges), jnp.asarray(w)))

    mids = 0.5 * (edges[:, 1:] + edges[:, :-1])
    deltas = edges[:, 1:] - edges[:, :-1]
    expected = 0.0
    for r in range(R):
        pair = np.abs(mids[r][:, None] - mids[r][None, :])
        expected += (w[r][:, None] * w[r][None, :] * pair).sum()
        expected += (w[r] ** 2 * deltas[r]).sum() / 3.0
    expected /= R
    np.testing.assert_allclose(got, expected, rtol=1e-4)


def test_outer_measure_bruteforce(rng):
    R = 2
    t1 = np.sort(rng.uniform(0, 1, (R, 9)).astype(np.float32), axis=-1)
    w1 = rng.uniform(0, 1, (R, 8)).astype(np.float32)
    t0 = np.sort(rng.uniform(0, 1, (R, 6)).astype(np.float32), axis=-1)
    got = np.asarray(_outer_measure(jnp.asarray(t0), None, jnp.asarray(t1), jnp.asarray(w1)))

    expected = np.zeros((R, 5), np.float32)
    for r in range(R):
        for i in range(5):
            lo, hi = t0[r, i], t0[r, i + 1]
            # sum of w1 bins [t1_j, t1_{j+1}] overlapping [lo, hi] per the
            # inner/outer cumulative formulation
            idx_lo = np.clip(np.searchsorted(t1[r], lo, side="right") - 1, 0, 8)
            idx_hi = np.clip(np.searchsorted(t1[r], hi, side="left"), 0, 8)
            expected[r, i] = w1[r, idx_lo:idx_hi].sum()
    np.testing.assert_allclose(got, expected, rtol=1e-5, atol=1e-6)


def test_interlevel_loss_zero_when_covered(rng):
    R, S = 4, 16
    edges = jnp.broadcast_to(jnp.linspace(0, 1, S + 1), (R, S + 1))
    w = jnp.asarray(rng.uniform(0, 0.05, (R, S)).astype(np.float32))
    # proposal == final histogram -> fully covers -> zero loss
    loss = float(interlevel_loss(edges, w, [edges], [w]))
    assert loss < 1e-10


# ------------------------------------------------------------------ sampling


def _bundle(num_rays=8, near=0.05, far=10.0):
    o = jnp.zeros((num_rays, 3))
    d = jnp.tile(jnp.array([[0.0, 0.0, 1.0]]), (num_rays, 1))
    return RayBundle(
        origins=o,
        directions=d,
        nears=jnp.full((num_rays,), near),
        fars=jnp.full((num_rays,), far),
        camera_indices=jnp.zeros((num_rays,), jnp.int32),
    )


def test_spacing_roundtrip(rng):
    t = jnp.asarray(rng.uniform(0.01, 100, 50).astype(np.float32))
    np.testing.assert_allclose(
        np.asarray(spacing_piecewise_inv(spacing_piecewise(t))), np.asarray(t), rtol=1e-4
    )


def test_uniform_sampler_monotone_and_in_range():
    rb = _bundle()
    rs = sample_uniform(rb, 32)
    starts, ends = np.asarray(rs.starts), np.asarray(rs.ends)
    assert (ends > starts).all()
    assert starts.min() >= 0.05 - 1e-5 and ends.max() <= 10.0 + 1e-4
    rs_j = sample_uniform(rb, 32, key=jax.random.PRNGKey(0))
    assert (np.asarray(rs_j.ends) > np.asarray(rs_j.starts)).all()


def test_pdf_sampler_concentrates_mass():
    rb = _bundle(num_rays=4)
    rs = sample_uniform(rb, 64)
    # weight histogram peaked in bins 20..24
    w = np.zeros((4, 64), np.float32)
    w[:, 20:25] = 1.0
    rs2 = sample_pdf(rb, rs.spacing_edges, jnp.asarray(w), 32)
    mids_s = np.asarray(0.5 * (rs2.spacing_edges[:, 1:] + rs2.spacing_edges[:, :-1]))
    lo = 20 / 64.0
    hi = 25 / 64.0
    frac_inside = ((mids_s >= lo - 0.02) & (mids_s <= hi + 0.02)).mean()
    assert frac_inside > 0.7
    # edges sorted
    assert (np.diff(np.asarray(rs2.spacing_edges), axis=-1) >= 0).all()


def test_trunc_exp_finite_at_extreme_inputs():
    """Value clamp: exp overflow (x ~ 88+) must not produce inf density —
    inf * zero-width PDF bin = NaN weights (observed late-training NaN
    collapse)."""
    import jax

    from uncertainty_nerf_gs_tpu.ops.activations import trunc_exp

    x = jnp.asarray([-100.0, 0.0, 20.0, 100.0, 1000.0])
    y = np.asarray(trunc_exp(x))
    assert np.isfinite(y).all()
    g = jax.grad(lambda v: trunc_exp(v).sum())(x)
    assert np.isfinite(np.asarray(g)).all()


def test_cumsum_lanes_matches_jnp(rng):
    """MXU-blocked prefix sum == jnp.cumsum for f32/int/bool, any length
    (incl. the recursion path > 128 and the rasterizer's 1-D counting scan).
    Regression: the tri constant must be a host constant, not a cached
    tracer (a functools.cache'd jnp array poisoned later traces, r3)."""
    import jax

    from uncertainty_nerf_gs_tpu.ops.prefix import cumsum_lanes, cumsum_lanes_f32

    for shape in ((7,), (64,), (256,), (1000,), (4, 300), (3, 2, 129)):
        x = rng.normal(size=shape).astype(np.float32)
        np.testing.assert_allclose(
            np.asarray(cumsum_lanes_f32(jnp.asarray(x))),
            np.cumsum(x, axis=-1), rtol=1e-5, atol=1e-5,
        )
    # integer counting scan is exact
    hits = rng.integers(0, 2, size=(70_000,)).astype(bool)
    got = np.asarray(cumsum_lanes_f32(jnp.asarray(hits, jnp.float32)))
    np.testing.assert_array_equal(got.astype(np.int64), np.cumsum(hits))
    # two different jits reusing the cached tri constant (tracer-leak check)
    f1 = jax.jit(lambda a: cumsum_lanes_f32(a).sum())
    f2 = jax.jit(lambda a: cumsum_lanes_f32(a * 2).sum())
    x = jnp.asarray(rng.normal(size=(8, 256)).astype(np.float32))
    assert np.isfinite(float(f1(x))) and np.isfinite(float(f2(x)))
    # dispatcher: bool input returns int-typed cumsum (jnp semantics)
    out = cumsum_lanes(jnp.asarray(hits))
    np.testing.assert_array_equal(np.asarray(out), np.cumsum(hits))


# ---------------------------------------------------------------------------
# face-consistency regularizer
# ---------------------------------------------------------------------------


def _shared_cell_rows(res, feats=2, fn=None):
    """Pack cell rows where every cell's corner features come from one
    global per-vertex function -> adjacent cells agree exactly."""
    if fn is None:
        fn = lambda v: np.stack([v.sum(-1) * 0.1, v[..., 0] * 0.2], -1)
    block = 8 * feats
    cpr = 128 // block
    n_cells = res**3
    n_rows = (n_cells + cpr - 1) // cpr
    rows = np.zeros((n_rows, 128), np.float32)
    for z in range(res):
        for y in range(res):
            for x in range(res):
                idx = x + res * (y + res * z)
                for o in range(8):
                    ox, oy, oz = (o >> 2) & 1, (o >> 1) & 1, o & 1
                    v = np.array([x + ox, y + oy, z + oz], np.float32)
                    f = fn(v)
                    lane0 = (idx % cpr) * block + o * feats
                    rows[idx // cpr, lane0 : lane0 + feats] = f
    return jnp.asarray(rows)


def test_face_consistency_zero_when_shared():
    from uncertainty_nerf_gs_tpu.ops.encodings import face_consistency_loss

    res, table = 4, 128  # dense addressing (res^3 <= table)
    rows = _shared_cell_rows(res)
    loss = face_consistency_loss(rows, res, table, jax.random.PRNGKey(0), 256)
    assert float(loss) < 1e-12


def test_face_consistency_positive_on_disagreement():
    from uncertainty_nerf_gs_tpu.ops.encodings import face_consistency_loss

    res, table = 4, 128
    rows = np.asarray(_shared_cell_rows(res)).copy()
    rows[0, :16] += 1.0  # cell 0 disagrees with its neighbors everywhere
    loss = face_consistency_loss(
        jnp.asarray(rows), res, table, jax.random.PRNGKey(0), 4096
    )
    assert float(loss) > 1e-4
    # and it is differentiable w.r.t. the rows
    g = jax.grad(
        lambda r: face_consistency_loss(
            r, res, table, jax.random.PRNGKey(0), 4096
        )
    )(jnp.asarray(rows))
    assert float(jnp.abs(g).sum()) > 0


def test_face_consistency_trainer_wiring(rng):
    """NerfactoTrainer with face_consistency_mult > 0 reports the loss and
    training reduces cross-face disagreement."""
    from uncertainty_nerf_gs_tpu.engine.trainer import (
        NerfactoTrainer,
        _encoding_face_loss,
    )
    from uncertainty_nerf_gs_tpu.models.nerfacto import NerfactoConfig
    from uncertainty_nerf_gs_tpu.cameras.cameras import Cameras

    n, h, w = 2, 8, 8
    c2w = np.tile(np.eye(3, 4, dtype=np.float32)[None], (n, 1, 1))
    c2w[:, 2, 3] = 2.0
    cams = Cameras(
        camera_to_worlds=jnp.asarray(c2w),
        fx=jnp.full((n,), 8.0), fy=jnp.full((n,), 8.0),
        cx=jnp.full((n,), w / 2), cy=jnp.full((n,), h / 2),
        width=w, height=h,
    )
    images = np.random.default_rng(0).uniform(size=(n, h, w, 3)).astype(np.float32)
    cfg = NerfactoConfig(
        num_images=n, num_levels=2, base_res=4, max_res=8,
        log2_hashmap_size=6, hidden_dim=8, hidden_dim_color=8, geo_feat_dim=4,
        use_appearance_embedding=False, use_scene_contraction=False,
        near_plane=0.5, far_plane=4.0, grid_layout="cell",
        num_proposal_samples=(8,), num_nerf_samples=4,
        proposal_net_args=(dict(num_levels=2, max_res=8, log2_hashmap_size=6, hidden_dim=8),),
        face_consistency_mult=1.0, face_consistency_samples=128,
    )
    tr = NerfactoTrainer(config=cfg, cameras=cams, images=images, seed=0)
    fc0 = float(
        _encoding_face_loss(cfg, tr.state.params, jax.random.PRNGKey(7))
    )
    losses = tr.train(30, num_rays_per_batch=64)
    assert "face_consistency_loss" in losses
    assert np.isfinite(losses["face_consistency_loss"])
    fc1 = float(
        _encoding_face_loss(cfg, tr.state.params, jax.random.PRNGKey(7))
    )
    assert fc1 <= fc0 + 1e-6  # penalty drives cross-face agreement


def test_fused_resampler_matches_xla_path():
    """resample_edges_tpu (interpret mode on CPU) == the XLA fallback math
    in sample_pdf, including the all-zero-weights eps renormalization."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from uncertainty_nerf_gs_tpu.ops.pdf_pallas import resample_edges_tpu

    rng = np.random.default_rng(0)
    for s, n in ((256, 97), (96, 49), (24, 13)):
        r = 7  # non-multiple of the ray block: exercises padding
        w = jnp.asarray(rng.uniform(0, 1, (r, s)).astype(np.float32)) ** 4
        w = w.at[2].set(0.0)  # all-zero histogram row (eps path)
        edges = jnp.sort(
            jnp.asarray(rng.uniform(0, 1, (r, s + 1)).astype(np.float32)),
            axis=1,
        )
        u = jnp.clip(
            (jnp.arange(n, dtype=jnp.float32)[None] + 0.5) / n, 0, 1 - 1e-6
        )
        u = jnp.broadcast_to(u, (r, n))

        got = np.asarray(resample_edges_tpu(w, edges, u))

        # the XLA fallback math, verbatim (sample_pdf's else branch)
        hp, eps = 0.01, 1e-5
        ww = w + hp
        w_sum = jnp.sum(ww, axis=-1, keepdims=True)
        padding = jnp.clip(eps - w_sum, 0.0, None)
        ww = ww + padding / s
        w_sum = w_sum + padding
        pdf = ww / w_sum
        cdf = jnp.concatenate([jnp.zeros((r, 1)), jnp.cumsum(pdf, -1)], -1)
        cdf = jnp.clip(cdf, 0.0, 1.0)
        idx = jnp.sum((cdf[:, :, None] <= u[:, None, :]).astype(jnp.int32), 1) - 1
        idx = jnp.clip(idx, 0, s - 1)
        c0 = jnp.take_along_axis(cdf, idx, -1)
        c1 = jnp.take_along_axis(cdf, idx + 1, -1)
        e0 = jnp.take_along_axis(edges, idx, -1)
        e1 = jnp.take_along_axis(edges, idx + 1, -1)
        frac = jnp.where(c1 > c0, (u - c0) / jnp.maximum(c1 - c0, 1e-12), 0.0)
        want = np.asarray(e0 + frac * (e1 - e0))

        np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-4)
        assert (np.diff(got, axis=1) >= -1e-6).all()  # sorted edges


def test_cumsum_lanes_bf16_and_mxu_render_weights(rng, monkeypatch):
    """bf16 inputs take the MXU prefix path (f32 round-trip, dtype
    preserved), and render_weights on the forced-TPU path matches the
    jnp.cumsum fallback to f32 tolerance — value AND gradient."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    import uncertainty_nerf_gs_tpu.ops.backend as backend
    from uncertainty_nerf_gs_tpu.ops import raymarch
    from uncertainty_nerf_gs_tpu.ops.prefix import cumsum_lanes

    x = jnp.asarray(rng.uniform(0, 1, (5, 200)).astype(np.float32))

    monkeypatch.setattr(backend, "on_tpu", lambda: True)
    got_bf16 = cumsum_lanes(x.astype(jnp.bfloat16))
    assert got_bf16.dtype == jnp.bfloat16
    ref = jnp.cumsum(x, axis=-1).astype(jnp.bfloat16)
    np.testing.assert_allclose(
        np.asarray(got_bf16, np.float32), np.asarray(ref, np.float32),
        rtol=2e-2, atol=2e-2,
    )

    dens = jnp.asarray(rng.uniform(0, 30, (9, 100)).astype(np.float32))
    deltas = jnp.asarray(rng.uniform(0.01, 0.05, (9, 100)).astype(np.float32))

    def loss_mxu(d):
        return jnp.sum(raymarch.render_weights(d, deltas) ** 2)

    v_mxu, g_mxu = jax.value_and_grad(loss_mxu)(dens)
    monkeypatch.setattr(backend, "on_tpu", lambda: False)
    v_ref, g_ref = jax.value_and_grad(loss_mxu)(dens)
    np.testing.assert_allclose(float(v_mxu), float(v_ref), rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(g_mxu), np.asarray(g_ref), rtol=1e-4, atol=1e-6
    )
