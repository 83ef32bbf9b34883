"""Tests for the cell-major hash grid and the fused shared-gather ensemble
render (round-2 throughput path)."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from uncertainty_nerf_gs_tpu.models.nerfacto import NerfactoConfig, NerfactoModel
from uncertainty_nerf_gs_tpu.ops.encodings import (
    CellHashEncoding,
    cell_indices,
    cell_lookup,
    hash_grid_resolutions,
    pack_member_cell_tables,
    packed_cell_lookup,
)
from uncertainty_nerf_gs_tpu.ops.sampling import RayBundle
from uncertainty_nerf_gs_tpu.parallel.ensemble_fused import (
    build_fused_ensemble_render,
    pack_ensemble_tables,
)
from uncertainty_nerf_gs_tpu.parallel.ensemble_parallel import init_ensemble_params


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def _tiny_config(**over):
    base = dict(
        num_images=2,
        near_plane=0.5,
        far_plane=6.0,
        background_color="white",
        use_appearance_embedding=False,
        num_proposal_samples=(24, 12),
        num_nerf_samples=8,
        num_levels=4,
        max_res=64,
        log2_hashmap_size=10,
        proposal_net_args=(
            dict(num_levels=2, max_res=32, log2_hashmap_size=9, hidden_dim=16),
            dict(num_levels=2, max_res=64, log2_hashmap_size=9, hidden_dim=16),
        ),
    )
    base.update(over)
    return NerfactoConfig(**base)


def _bundle(rng, n=32):
    d = rng.normal(size=(n, 3))
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return RayBundle(
        origins=jnp.asarray(rng.uniform(-0.1, 0.1, (n, 3)), jnp.float32),
        directions=jnp.asarray(d, jnp.float32),
        nears=jnp.full((n,), 0.5),
        fars=jnp.full((n,), 6.0),
        camera_indices=jnp.zeros((n,), jnp.int32),
    )


# ------------------------------------------------------------- cell layout


def test_cell_lookup_matches_manual_trilerp(rng):
    """Dense level: cell lookup equals hand-computed trilinear interp of the
    cell's own 8 stored corners."""
    res, feats, table_size = 4, 2, 512  # res^3=64 <= 512: dense
    cpr = 128 // (8 * feats)
    n_rows = (table_size + cpr - 1) // cpr
    rows = jnp.asarray(rng.normal(size=(1, n_rows, 128)).astype(np.float32))
    pts = jnp.asarray(rng.uniform(0.02, 0.98, (40, 3)).astype(np.float32))
    out = np.asarray(cell_lookup(rows, pts, [res], table_size, feats))

    rows_np = np.asarray(rows)
    for p, o in zip(np.asarray(pts), out):
        scaled = p * res
        base = np.minimum(np.floor(scaled).astype(int), res - 1)
        frac = scaled - base
        idx = base[0] + res * (base[1] + res * base[2])
        cell = rows_np[0, idx // cpr].reshape(cpr, 8, feats)[idx % cpr]
        acc = np.zeros(feats)
        for c in range(8):
            a, b, cbit = (c >> 2) & 1, (c >> 1) & 1, c & 1
            w = (
                (frac[0] if a else 1 - frac[0])
                * (frac[1] if b else 1 - frac[1])
                * (frac[2] if cbit else 1 - frac[2])
            )
            acc += w * cell[c]
        np.testing.assert_allclose(o, acc, rtol=1e-5, atol=1e-6)


def test_cell_lookup_continuous_inside_cell(rng):
    """Trilerp within one cell is smooth: small position deltas -> small
    output deltas."""
    enc = CellHashEncoding(num_levels=3, min_res=4, max_res=16, log2_hashmap_size=9)
    params = enc.init(jax.random.PRNGKey(0), jnp.zeros((1, 3)))
    p0 = jnp.asarray([[0.31, 0.52, 0.77]])
    p1 = p0 + 1e-4
    o0 = enc.apply(params, p0)
    o1 = enc.apply(params, p1)
    assert float(jnp.abs(o1 - o0).max()) < 1e-4


def test_cell_encoding_grads_flow(rng):
    enc = CellHashEncoding(num_levels=4, min_res=4, max_res=32, log2_hashmap_size=8)
    pts = jnp.asarray(rng.uniform(0, 1, (64, 3)).astype(np.float32))
    params = enc.init(jax.random.PRNGKey(0), pts)

    def loss(p):
        return jnp.sum(enc.apply(p, pts) ** 2)

    g = jax.grad(loss)(params)["params"]["cells"]
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).sum()) > 0


def test_packed_lookup_matches_per_member(rng):
    """The member-packed single gather equals M independent cell lookups."""
    feats, table_size, m = 2, 512, 3
    res_list = hash_grid_resolutions(3, 4, 32)
    cpr = 128 // (8 * feats)
    n_rows = (table_size + cpr - 1) // cpr
    stacked = jnp.asarray(
        rng.normal(size=(m, 3, n_rows, 128)).astype(np.float32)
    )
    pts = jnp.asarray(rng.uniform(0, 1, (50, 3)).astype(np.float32))

    packed = pack_member_cell_tables(stacked, table_size, feats)
    fused = np.asarray(
        packed_cell_lookup(packed, pts, res_list, table_size, m, feats)
    )
    for j in range(m):
        ref = np.asarray(
            cell_lookup(stacked[j], pts, res_list, table_size, feats)
        )
        np.testing.assert_allclose(fused[j], ref, rtol=1e-5, atol=1e-6)


# ----------------------------------------------------------- hybrid layout


def test_hybrid_dense_level_matches_canonical_trilerp(rng):
    """A hybrid dense level is an EXACT trilinear interpolation of its
    canonical (res+1)^3 corner grid — corner sharing restored."""
    from uncertainty_nerf_gs_tpu.ops.encodings import HybridHashEncoding

    enc = HybridHashEncoding(
        num_levels=1, min_res=5, max_res=5, log2_hashmap_size=9,
        features_per_level=2,
    )
    pts = jnp.asarray(rng.uniform(0.0, 1.0, (60, 3)).astype(np.float32))
    variables = enc.init(jax.random.PRNGKey(0), pts)
    grid = np.asarray(
        rng.normal(size=(6, 6, 6 * 2)).astype(np.float32)
    )  # (z, y, x*F)
    variables = {"params": {"corners_0": jnp.asarray(grid)}}
    out = np.asarray(enc.apply(variables, pts))

    g = grid.reshape(6, 6, 6, 2)
    res = 5
    for p, o in zip(np.asarray(pts), out):
        scaled = p * res
        base = np.minimum(np.floor(scaled).astype(int), res - 1)
        f = scaled - base
        acc = np.zeros(2)
        for c in range(8):
            a, b, cc = (c >> 2) & 1, (c >> 1) & 1, c & 1
            w = (
                (f[0] if a else 1 - f[0])
                * (f[1] if b else 1 - f[1])
                * (f[2] if cc else 1 - f[2])
            )
            acc += w * g[base[2] + cc, base[1] + b, base[0] + a]
        np.testing.assert_allclose(o, acc, rtol=1e-5, atol=1e-6)


def test_hybrid_continuous_across_cell_faces(rng):
    """Corner sharing makes the dense-level field CONTINUOUS across cell
    boundaries (the cell layout's defining discontinuity is gone)."""
    from uncertainty_nerf_gs_tpu.ops.encodings import HybridHashEncoding

    enc = HybridHashEncoding(
        num_levels=2, min_res=4, max_res=8, log2_hashmap_size=12,
        init_scale=1.0,
    )
    pts0 = jnp.asarray([[0.25 - 1e-5, 0.4, 0.6]], jnp.float32)  # left of face
    pts1 = jnp.asarray([[0.25 + 1e-5, 0.4, 0.6]], jnp.float32)  # right of it
    variables = enc.init(jax.random.PRNGKey(3), pts0)
    o0, o1 = enc.apply(variables, pts0), enc.apply(variables, pts1)
    assert float(jnp.abs(o1 - o0).max()) < 1e-3  # continuous (lerp-smooth)


def test_hybrid_grads_shared_corners(rng):
    """Gradients from samples in ADJACENT cells accumulate into the same
    canonical corner (the sharing prior the sparse-view configs need)."""
    from uncertainty_nerf_gs_tpu.ops.encodings import HybridHashEncoding

    enc = HybridHashEncoding(
        num_levels=1, min_res=2, max_res=2, log2_hashmap_size=9
    )
    # two points in different cells sharing the face x=0.5
    pts = jnp.asarray([[0.4, 0.3, 0.3], [0.6, 0.3, 0.3]], jnp.float32)
    variables = enc.init(jax.random.PRNGKey(0), pts)

    def loss(v):
        return jnp.sum(enc.apply(v, pts))

    g = jax.grad(loss)(variables)["params"]["corners_0"]
    g = np.asarray(g).reshape(3, 3, 3, 2)
    # shared corners on the x=1 plane (grid x index 1) get weight from BOTH
    # points: 0.8 (= 0.8 from left cell) + 0.2... each point contributes
    # trilinear weights; corner (x=1,y=0,z=0) weight from p0: fx=0.8,
    # from p1: 1-fx=0.8 -> total 2 * 0.8 * 0.4 * 0.4 = 0.256
    np.testing.assert_allclose(g[0, 0, 1], 0.256, rtol=1e-4)


def test_hybrid_mixed_dense_hashed_plan(rng):
    """Levels split dense/hashed by res^3 <= table; both lookup paths run
    and produce finite grads."""
    from uncertainty_nerf_gs_tpu.ops.encodings import HybridHashEncoding

    enc = HybridHashEncoding(
        num_levels=3, min_res=4, max_res=32, log2_hashmap_size=9
    )  # dense while (res+1)^3 <= 8*512=4096: res 4, 11; hashed: 32
    _, is_dense = enc.level_plan()
    assert is_dense == [True, True, False]
    pts = jnp.asarray(rng.uniform(0, 1, (64, 3)).astype(np.float32))
    variables = enc.init(jax.random.PRNGKey(0), pts)
    assert "corners_0" in variables["params"]
    assert "corners_1" in variables["params"]
    assert variables["params"]["cells"].shape[0] == 1

    def loss(v):
        return jnp.sum(enc.apply(v, pts) ** 2)

    g = jax.grad(loss)(variables)["params"]
    for k, v in g.items():
        assert np.isfinite(np.asarray(v)).all(), k
    assert float(jnp.abs(g["corners_0"]).sum()) > 0
    assert float(jnp.abs(g["cells"]).sum()) > 0


def test_hybrid_packed_lookup_matches_per_member(rng):
    """Fused hybrid pack + packed lookup == per-member encoding applies."""
    from uncertainty_nerf_gs_tpu.ops.encodings import HybridHashEncoding
    from uncertainty_nerf_gs_tpu.parallel.ensemble_fused import (
        _grid_sizes,
        _pack_encoding,
    )
    from uncertainty_nerf_gs_tpu.ops.encodings import packed_cell_lookup

    m, feats = 3, 2
    enc = HybridHashEncoding(
        num_levels=3, min_res=4, max_res=32, log2_hashmap_size=9
    )
    pts = jnp.asarray(rng.uniform(0, 1, (40, 3)).astype(np.float32))
    members = [
        enc.init(jax.random.PRNGKey(i), pts)["params"] for i in range(m)
    ]
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *members)
    res = hash_grid_resolutions(3, 4, 32)
    packed = _pack_encoding(stacked, res, 512, feats, "hybrid", None)
    sizes = _grid_sizes(res, 512, "hybrid")
    fused = np.asarray(
        packed_cell_lookup(packed, pts, res, sizes, m, feats)
    )
    for j in range(m):
        ref = np.asarray(enc.apply({"params": members[j]}, pts))
        np.testing.assert_allclose(fused[j], ref, rtol=1e-5, atol=1e-6)


def test_fused_render_hybrid_matches_standard_for_identical_members(rng):
    """Full fused render with grid_layout='hybrid' == the standard single-
    model render when all members are identical."""
    from uncertainty_nerf_gs_tpu.models.ensemble import ensemble_render

    cfg = _tiny_config(grid_layout="hybrid", uncertainty_channels=1)
    model = NerfactoModel(cfg)
    rb = _bundle(rng, n=16)
    single = init_ensemble_params(model, 1)
    stacked = jax.tree.map(
        lambda x: jnp.concatenate([x, x, x], axis=0), single
    )
    packed = pack_ensemble_tables(model, stacked)
    fused = build_fused_ensemble_render(model)(stacked, packed, rb)
    params0 = jax.tree.map(lambda x: x[0], single)
    ref = model.apply(
        {"params": params0}, rb, train=False, use_average_appearance=True
    )
    np.testing.assert_allclose(
        np.asarray(fused["rgb"]), np.asarray(ref["rgb"]), rtol=2e-4, atol=2e-4
    )
    # identical members: epistemic variance ~ 0
    assert float(jnp.max(fused["rgb_var_epi"])) < 1e-8


# --------------------------------------------------------- fused ensemble


def test_fused_render_matches_standard_for_identical_members(rng):
    """With identical member params the shared proposal chain IS each
    member's own chain, so the fused render must equal the standard
    single-model render and epistemic variance must vanish."""
    cfg = _tiny_config(uncertainty_channels=1)
    model = NerfactoModel(cfg)
    rb = _bundle(rng)
    one = init_ensemble_params(model, 1)
    # 3 identical members
    stacked = jax.tree.map(lambda x: jnp.repeat(x, 3, axis=0), one)
    packed = pack_ensemble_tables(model, stacked)
    render = build_fused_ensemble_render(model)
    fused = render(stacked, packed, rb)

    single = jax.tree.map(lambda x: x[0], one)
    ref = model.apply({"params": single}, rb, train=False,
                      use_average_appearance=True)

    np.testing.assert_allclose(
        np.asarray(fused["rgb"]), np.asarray(ref["rgb"]), rtol=1e-4, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(fused["depth"]), np.asarray(ref["depth"]), rtol=1e-4, atol=1e-5
    )
    assert float(fused["rgb_var_epi"].max()) < 1e-9


def test_fused_render_distinct_members_have_epistemic_variance(rng):
    cfg = _tiny_config(uncertainty_channels=1)
    model = NerfactoModel(cfg)
    rb = _bundle(rng)
    stacked = init_ensemble_params(model, 3)
    packed = pack_ensemble_tables(model, stacked)
    render = build_fused_ensemble_render(model)
    out = render(stacked, packed, rb)
    for k, v in out.items():
        assert np.isfinite(np.asarray(v)).all(), k
    assert float(out["rgb_var_epi"].mean()) > 0
    # reference parity combine: rgb_var stays the member-mean aleatoric
    assert float(out["rgb_var_combined"].mean()) >= float(
        out["rgb_var_epi"].mean()
    )


def test_fused_render_close_to_per_member_ensemble(rng):
    """Shared-proposal deviation check: fused combine vs the round-1
    per-member ensemble render agree closely on mean RGB (untrained params;
    trained-scene PSNR validation lives in the overfit suite)."""
    from uncertainty_nerf_gs_tpu.models.ensemble import ensemble_render

    cfg = _tiny_config(uncertainty_channels=1)
    model = NerfactoModel(cfg)
    rb = _bundle(rng)
    stacked = init_ensemble_params(model, 3)
    packed = pack_ensemble_tables(model, stacked)
    fused = build_fused_ensemble_render(model)(stacked, packed, rb)
    ref = ensemble_render(model, stacked, rb)
    # same members, different proposal chains -> close but not identical
    diff = float(jnp.abs(fused["rgb"] - ref["rgb"]).mean())
    assert diff < 0.05, diff


def test_fused_render_bf16_tables_close_to_f32(rng):
    cfg = _tiny_config(uncertainty_channels=1)
    model = NerfactoModel(cfg)
    rb = _bundle(rng)
    stacked = init_ensemble_params(model, 2)
    p32 = pack_ensemble_tables(model, stacked)
    p16 = pack_ensemble_tables(model, stacked, table_dtype=jnp.bfloat16)
    render = build_fused_ensemble_render(model)
    o32 = render(stacked, p32, rb)
    o16 = render(stacked, p16, rb)
    assert float(jnp.abs(o32["rgb"] - o16["rgb"]).max()) < 0.02


def test_fused_render_int8_tables_close_to_f32(rng):
    """int8-quantized eval tables (per-level scale folded into the trilerp
    weights — the 2.8x-faster gather path) must render close to f32."""
    cfg = _tiny_config(uncertainty_channels=1)
    model = NerfactoModel(cfg)
    rb = _bundle(rng)
    stacked = init_ensemble_params(model, 2)
    p32 = pack_ensemble_tables(model, stacked)
    p8 = pack_ensemble_tables(model, stacked, table_dtype=jnp.int8)
    assert isinstance(p8["field"], dict) and p8["field"]["tables"].dtype == jnp.int8
    render = build_fused_ensemble_render(model)
    o32 = render(stacked, p32, rb)
    o8 = render(stacked, p8, rb)
    assert float(jnp.abs(o32["rgb"] - o8["rgb"]).max()) < 0.05
    assert float(jnp.abs(o32["depth"] - o8["depth"]).max()) < 0.2


def test_fused_render_table_split_exact(rng):
    """Lane-split eval tables (split_packed_tables: sub-34MB sub-gathers,
    pad lanes dropped) must render EXACTLY like the unsplit tables of the
    same dtype — it is pure addressing, not approximation."""
    from uncertainty_nerf_gs_tpu.ops.encodings import (
        packed_cell_lookup, split_packed_tables,
    )

    cfg = _tiny_config(uncertainty_channels=1)
    model = NerfactoModel(cfg)
    rb = _bundle(rng)
    stacked = init_ensemble_params(model, 2)
    render = build_fused_ensemble_render(model)
    for dt in (jnp.bfloat16, jnp.int8):
        p = pack_ensemble_tables(model, stacked, table_dtype=dt)
        # tiny tables are far under the 32 MB rule -> auto split is a
        # pass-through (narrow single-part gathers measured pathological)
        ps = pack_ensemble_tables(model, stacked, table_dtype=dt,
                                  table_split=True)
        # force real 2-way splits through the fused render (the TPU-scale
        # auto case) with a tiny max_bytes on the main field
        f = ps["field"]
        tabs = f["tables"] if isinstance(f, dict) else f
        n_lvl = len(tabs) if isinstance(tabs, list) else tabs.shape[0]
        t0 = tabs[0]
        half = t0.shape[-2] * 32 * t0.dtype.itemsize / 2  # -> 2 parts
        ps = dict(ps, field=split_packed_tables(
            f, n_lvl, real_lanes=32, max_bytes=half))
        entry = ps["field"]["tables"][0]
        assert isinstance(entry, tuple) and len(entry) == 2
        assert sum(t.shape[-1] for t in entry) == 32  # pad dropped on split
        a = render(stacked, p, rb)
        b = render(stacked, ps, rb)
        np.testing.assert_allclose(
            np.asarray(a["rgb"], np.float32), np.asarray(b["rgb"], np.float32),
            atol=1e-6)
        np.testing.assert_allclose(
            np.asarray(a["depth"], np.float32),
            np.asarray(b["depth"], np.float32), atol=1e-6)

    # multi-part split (tiny max_bytes forces several sub-tables)
    k = jax.random.PRNGKey(3)
    packed = jax.random.normal(k, (2, 64, 128), jnp.float32)
    pos = jax.random.uniform(jax.random.PRNGKey(4), (40, 3))
    whole = packed_cell_lookup(packed, pos, [4, 8], 64, num_members=2)
    sp = split_packed_tables(packed, 2, real_lanes=32, max_bytes=2048,
                             max_parts=4)
    assert all(isinstance(t, tuple) and len(t) == 4
               for t in sp["tables"])
    parts = packed_cell_lookup(sp, pos, [4, 8], 64, num_members=2)
    np.testing.assert_allclose(np.asarray(whole), np.asarray(parts),
                               atol=1e-6)


def test_fused_render_int8_hybrid_and_stride(rng):
    """int8 dict-form tables must thread through the hybrid per-level-list
    path and the strided lookup (both unpack {tables, scales})."""
    cfg = _tiny_config(uncertainty_channels=0, grid_layout="hybrid")
    model = NerfactoModel(cfg)
    rb = _bundle(rng)
    stacked = init_ensemble_params(model, 2)
    p32 = pack_ensemble_tables(model, stacked)
    p8 = pack_ensemble_tables(model, stacked, table_dtype=jnp.int8)
    assert isinstance(p8["field"], dict)
    assert all(t.dtype == jnp.int8 for t in p8["field"]["tables"])
    render32 = build_fused_ensemble_render(model, main_stride_scale=4.0)
    render8 = build_fused_ensemble_render(model, main_stride_scale=4.0)
    o32 = render32(stacked, p32, rb)
    o8 = render8(stacked, p8, rb)
    assert float(jnp.abs(o32["rgb"] - o8["rgb"]).max()) < 0.05


def test_packed_lookup_folded_exact(rng):
    """Folded rows (fold cells/row, lane-group select by idx%fold) are an
    EXACT layout change: lookups match the unfolded tables bitwise-close,
    for raw, bf16, and int8 dict forms."""
    from uncertainty_nerf_gs_tpu.ops.encodings import (
        fold_packed_tables,
        quantize_cell_tables_int8,
    )

    feats, table_size, m = 2, 512, 3
    res_list = hash_grid_resolutions(3, 4, 32)
    cpr = 128 // (8 * feats)
    n_rows = (table_size + cpr - 1) // cpr
    stacked = jnp.asarray(
        rng.normal(size=(m, 3, n_rows, 128)).astype(np.float32)
    )
    pts = jnp.asarray(rng.uniform(0, 1, (50, 3)).astype(np.float32))
    packed = pack_member_cell_tables(stacked, table_size, feats)
    base = np.asarray(
        packed_cell_lookup(packed, pts, res_list, table_size, m, feats)
    )
    for fold in (2, 4):
        folded = fold_packed_tables(packed, fold)
        assert all(
            t.shape[-1] == fold * packed.shape[-1] for t in folded["tables"]
        )
        out = np.asarray(
            packed_cell_lookup(folded, pts, res_list, table_size, m, feats)
        )
        np.testing.assert_allclose(out, base, rtol=1e-6, atol=1e-7)
    # int8 dict form: fold the quantized tables, scales ride along
    q = quantize_cell_tables_int8(packed)
    base8 = np.asarray(
        packed_cell_lookup(q, pts, res_list, table_size, m, feats)
    )
    q4 = fold_packed_tables(q, 4)
    out8 = np.asarray(
        packed_cell_lookup(q4, pts, res_list, table_size, m, feats)
    )
    np.testing.assert_allclose(out8, base8, rtol=1e-6, atol=1e-7)


def test_fused_render_folded_tables_exact(rng):
    """pack_ensemble_tables(table_fold=4) renders identically (fold is a
    pure addressing change), including through the strided proposal path."""
    cfg = _tiny_config(uncertainty_channels=1)
    model = NerfactoModel(cfg)
    rb = _bundle(rng)
    stacked = init_ensemble_params(model, 2)
    p1 = pack_ensemble_tables(model, stacked)
    p4 = pack_ensemble_tables(model, stacked, table_fold=4)
    render = build_fused_ensemble_render(model)
    o1 = render(stacked, p1, rb)
    o4 = render(stacked, p4, rb)
    assert float(jnp.abs(o1["rgb"] - o4["rgb"]).max()) < 1e-5
    assert float(jnp.abs(o1["rgb_var"] - o4["rgb_var"]).max()) < 1e-5


def test_fused_render_ray_sharded_matches_single_device(rng):
    """VERDICT r1 item 7: the fused ensemble render sharded over the ray
    axis of the 8-device CPU mesh must equal the single-device render
    (packed tables replicate; rays shard over "data")."""
    from uncertainty_nerf_gs_tpu.parallel.mesh import make_mesh

    cfg = _tiny_config(uncertainty_channels=1)
    model = NerfactoModel(cfg)
    stacked = init_ensemble_params(model, 3)
    packed = pack_ensemble_tables(model, stacked)
    rb = _bundle(rng, n=len(jax.devices()) * 16)

    single = build_fused_ensemble_render(model)(stacked, packed, rb)
    mesh = make_mesh(num_data=len(jax.devices()), num_member=1)
    sharded_fn = build_fused_ensemble_render(model, mesh=mesh)
    sharded = sharded_fn(stacked, packed, rb)

    for k in ("rgb", "depth", "rgb_std", "rgb_var_epi"):
        np.testing.assert_allclose(
            np.asarray(sharded[k]), np.asarray(single[k]), rtol=1e-4, atol=1e-5,
        )


def test_strided_lookup_close_to_exact(rng):
    """Anchor-strided coarse-level lookup approximates the exact per-sample
    lookup closely (exact within a cell; smoothing across boundaries)."""
    from uncertainty_nerf_gs_tpu.ops.encodings import (
        packed_cell_lookup_strided,
    )

    feats, table_size, m = 2, 512, 2
    res = [4]  # coarse level: stride engages (k = S // (2*4))
    cpr = 128 // (8 * feats)
    n_rows = (table_size + cpr - 1) // cpr
    # LINEAR feature field: cell corners store w . corner_coords — then the
    # exact trilerp reproduces the linear function everywhere and lerping
    # along the ray is exact too, so strided must equal exact to f32 eps.
    # (Learned coarse levels are smooth; random tables would overstate the
    # cross-cell error.)
    r4 = 4
    w_lin = np.array([[0.7, -0.3], [0.2, 0.9], [-0.5, 0.4]], np.float32)
    rows_np = np.zeros((m, 1, n_rows, 128), np.float32)
    for cz in range(r4):
        for cy in range(r4):
            for cx in range(r4):
                cell = cx + r4 * (cy + r4 * cz)
                for corner in range(8):
                    a, b, c = (corner >> 2) & 1, (corner >> 1) & 1, corner & 1
                    coords = np.array(
                        [(cx + a) / r4, (cy + b) / r4, (cz + c) / r4]
                    )
                    val = coords @ w_lin  # (feats,)
                    lane0 = (cell % cpr) * 8 * feats + corner * feats
                    rows_np[:, 0, cell // cpr, lane0 : lane0 + feats] = val
    stacked = jnp.asarray(rows_np)
    packed = pack_member_cell_tables(stacked, table_size, feats)

    # straight rays: positions move smoothly through [0,1]^3
    R, S = 8, 64
    t = jnp.linspace(0.05, 0.95, S)[None, :].repeat(R, 0)  # (R, S)
    origins = jnp.asarray(rng.uniform(0.1, 0.3, (R, 3)).astype(np.float32))
    dirs = jnp.asarray(rng.uniform(0.3, 0.7, (R, 3)).astype(np.float32))
    pos = origins[:, None] + dirs[:, None] * t[..., None] * 0.7  # in [0,1]

    exact = packed_cell_lookup(
        packed, pos.reshape(-1, 3), res, table_size, m, feats
    ).reshape(m, R, S, feats)
    strided = packed_cell_lookup_strided(
        packed, pos, t, res, table_size, m, feats
    )
    np.testing.assert_allclose(
        np.asarray(strided), np.asarray(exact), rtol=1e-4, atol=1e-5
    )
    # fine level (k == 1) must be bit-exact
    res_fine = [64]
    exact_f = packed_cell_lookup(
        packed, pos.reshape(-1, 3), res_fine, table_size, m, feats
    ).reshape(m, R, S, feats)
    strided_f = packed_cell_lookup_strided(
        packed, pos, t, res_fine, table_size, m, feats
    )
    np.testing.assert_allclose(
        np.asarray(strided_f), np.asarray(exact_f), rtol=1e-6, atol=1e-7
    )


def test_strided_lookup_anchor_divisible_boundary(rng):
    """Regression (ADVICE r2): (S-1) % K == 0 used to leave the repeated
    anchor arrays one sample short (broadcast crash). S=65, res=4 ->
    k = clamp(65//8, 1, 8) = 8 and 64 % 8 == 0 engages the case."""
    from uncertainty_nerf_gs_tpu.ops.encodings import (
        packed_cell_lookup_strided,
    )

    feats, table_size, m = 2, 512, 2
    cpr = 128 // (8 * feats)
    n_rows = (table_size + cpr - 1) // cpr
    stacked = jnp.asarray(
        rng.normal(size=(m, 1, n_rows, 128)).astype(np.float32)
    )
    packed = pack_member_cell_tables(stacked, table_size, feats)
    for S in (65, 121):  # 121/res-20 is the original ADVICE repro shape
        res = [4] if S == 65 else [20]
        R = 4
        t = jnp.linspace(0.05, 0.95, S)[None, :].repeat(R, 0)
        origins = jnp.asarray(rng.uniform(0.1, 0.3, (R, 3)).astype(np.float32))
        dirs = jnp.asarray(rng.uniform(0.3, 0.7, (R, 3)).astype(np.float32))
        pos = origins[:, None] + dirs[:, None] * t[..., None] * 0.7
        out = packed_cell_lookup_strided(
            packed, pos, t, res, table_size, m, feats
        )
        assert out.shape == (m, R, S, feats)
        assert np.isfinite(np.asarray(out)).all()
        # the final sample must equal the exact lookup (its anchor is
        # clamped to s-1, so the lerp weight there is exactly 0)
        exact_last = packed_cell_lookup(
            packed, pos[:, -1].reshape(-1, 3), res, table_size, m, feats
        ).reshape(m, R, feats)
        np.testing.assert_allclose(
            np.asarray(out[:, :, -1]), np.asarray(exact_last),
            rtol=1e-5, atol=1e-6,
        )


def test_fused_render_with_engaged_stride_is_close_to_exact(rng):
    """Full fused render with coarse proposals where the anchor stride
    actually engages (k > 1): strided and exact renders must agree closely
    (deviation is proposal-placement only; the main field is exact)."""
    cfg = _tiny_config(
        uncertainty_channels=1,
        num_proposal_samples=(64, 24),
        num_nerf_samples=8,
        proposal_net_args=(
            dict(num_levels=2, max_res=8, log2_hashmap_size=9, hidden_dim=16),
            dict(num_levels=2, max_res=16, log2_hashmap_size=9, hidden_dim=16),
        ),
    )
    model = NerfactoModel(cfg)
    rb = _bundle(rng, n=16)
    stacked = init_ensemble_params(model, 2)
    packed = pack_ensemble_tables(model, stacked)
    exact = build_fused_ensemble_render(
        model, proposal_anchor_stride=False
    )(stacked, packed, rb)
    strided = build_fused_ensemble_render(
        model, proposal_anchor_stride=True
    )(stacked, packed, rb)
    # stride engages: S=64 at res 8 -> k = 64 // 16 = 4
    diff = float(jnp.abs(exact["rgb"] - strided["rgb"]).mean())
    assert diff < 0.02, diff
    for k in ("rgb", "depth", "rgb_std"):
        assert np.isfinite(np.asarray(strided[k])).all(), k


def test_fused_render_main_stride_close_to_exact(rng):
    """Opt-in main-field anchor stride: engaged coarse levels lerp along
    the ray; render must stay close to exact and finite (quality gate on
    trained models lives in experiments; this is the plumbing test)."""
    cfg = _tiny_config(
        uncertainty_channels=1,
        num_nerf_samples=32,  # stride_scale 8 -> k = 8*32 // (2*res)
        num_levels=3,
        max_res=32,
    )
    model = NerfactoModel(cfg)
    rb = _bundle(rng, n=16)
    stacked = init_ensemble_params(model, 2)
    packed = pack_ensemble_tables(model, stacked)
    exact = build_fused_ensemble_render(model)(stacked, packed, rb)
    strided = build_fused_ensemble_render(model, main_stride_scale=8.0)(
        stacked, packed, rb
    )
    diff = float(jnp.abs(exact["rgb"] - strided["rgb"]).mean())
    assert diff < 0.05, diff
    for k in ("rgb", "depth", "rgb_std"):
        assert np.isfinite(np.asarray(strided[k])).all(), k


def test_fused_render_hybrid_with_proposal_stride(rng):
    """Hybrid layout + engaged proposal stride compose (per-level tables
    through the strided lookup)."""
    cfg = _tiny_config(
        grid_layout="hybrid",
        uncertainty_channels=1,
        num_proposal_samples=(64, 24),
        num_nerf_samples=8,
        proposal_net_args=(
            dict(num_levels=2, max_res=8, log2_hashmap_size=9, hidden_dim=16),
            dict(num_levels=2, max_res=16, log2_hashmap_size=9, hidden_dim=16),
        ),
    )
    model = NerfactoModel(cfg)
    rb = _bundle(rng, n=16)
    stacked = init_ensemble_params(model, 2)
    packed = pack_ensemble_tables(model, stacked)
    exact = build_fused_ensemble_render(model, proposal_anchor_stride=False)(
        stacked, packed, rb
    )
    strided = build_fused_ensemble_render(model, proposal_anchor_stride=True)(
        stacked, packed, rb
    )
    diff = float(jnp.abs(exact["rgb"] - strided["rgb"]).mean())
    assert diff < 0.02, diff
    assert np.isfinite(np.asarray(strided["rgb_std"])).all()
