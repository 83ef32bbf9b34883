"""End-to-end CLI tests: train a tiny run per family, checkpoint, eval.

Mirrors the reference's empirical validation path (SURVEY §4): the
`ns-train -> ns-eval-unc` round trip, shrunk to seconds (tiny model, few
steps, tiny images)."""

import json
from pathlib import Path

import numpy as np
import pytest

from uncertainty_nerf_gs_tpu.data.synthetic import write_blender_dataset

TINY_OVERRIDES = {
    "num_proposal_samples": (24, 12),
    "num_nerf_samples": 8,
    "num_levels": 4,
    "max_res": 64,
    "log2_hashmap_size": 10,
    "hidden_dim": 16,
    "hidden_dim_color": 16,
    "geo_feat_dim": 7,
    "use_appearance_embedding": False,
    "near_plane": 0.5,
    "far_plane": 4.5,
    "background_color": "white",
    "use_scene_contraction": False,
    "eval_num_rays_per_chunk": 256,
    "proposal_net_args": (
        dict(num_levels=2, max_res=32, log2_hashmap_size=8, hidden_dim=8),
    ),
}

TINY_SPLAT_OVERRIDES = {
    "capacity": 128,
    "num_random": 64,
    "random_scale": 0.8,
    "rasterize_capacity": 64,
    "tile_chunk": 2,
    "sh_degree": 1,
    "warmup_length": 3,
    "refine_every": 4,
    "background_color": "white",
}


@pytest.fixture(scope="module")
def tiny_blender(tmp_path_factory):
    root = tmp_path_factory.mktemp("scene")
    write_blender_dataset(root, num_train=4, num_test=2, height=24, width=24)
    return root


def _train(method, tiny_blender, tmp_path, overrides, iters=6):
    from uncertainty_nerf_gs_tpu.scripts.train import main as train_main

    out_dir = tmp_path / f"run_{method}"
    train_main([
        method,
        "--data", str(tiny_blender),
        "--dataparser", "blender-data",
        "--output-dir", str(out_dir),
        "--max-num-iterations", str(iters),
        "--steps-per-save", str(iters),
        "--seed", "0",
        "--log-every", "0",
        "--overrides", json.dumps(overrides),
    ])
    return out_dir


def test_train_eval_active_nerfacto(tiny_blender, tmp_path):
    out_dir = _train(
        "active-nerfacto", tiny_blender, tmp_path, TINY_OVERRIDES, iters=5
    )
    assert (out_dir / "config.json").exists()
    ckpts = list(out_dir.glob("step-*.ckpt"))
    assert len(ckpts) == 1

    from uncertainty_nerf_gs_tpu.scripts.eval_uncertainty import main as eval_main

    metrics_path = tmp_path / "metrics.json"
    out = eval_main([
        "--load-config", str(out_dir),
        "--output-path", str(metrics_path),
    ])
    res = out["results"]
    assert np.isfinite(res["psnr"])
    assert "nll_rgb" in res  # active head produced rgb_std
    payload = json.load(open(metrics_path))
    assert payload["method_name"] == "active-nerfacto"
    # benchmark JSON is self-describing about eval-time approximations
    # (VERDICT r3 #8): a single-run parity eval records exact settings
    approx = payload["approximations"]
    assert approx["main_stride_scale"] == 0.0
    assert approx["n_members"] == 1


def test_train_eval_splatfacto(tiny_blender, tmp_path):
    out_dir = _train(
        "active-splatfacto", tiny_blender, tmp_path, TINY_SPLAT_OVERRIDES, iters=5
    )
    from uncertainty_nerf_gs_tpu.scripts.eval_uncertainty import main as eval_main

    metrics_path = tmp_path / "m.json"
    out = eval_main([
        "--load-config", str(out_dir),
        "--output-path", str(metrics_path),
    ])
    res = out["results"]
    assert np.isfinite(res["psnr"])
    assert "nll_rgb" in res
    # capacity truncation is never silent: the splat eval reports the worst
    # per-tile overflow beyond rasterize_capacity (VERDICT r3 weak #2)
    assert "raster_overflow_max" in res
    assert res["raster_overflow_max"] >= 0.0

    # --raster-capacity auto probes TRUE per-tile maxima on the eval
    # cameras (tune_rasterize_capacity): overflow-free by construction
    out = eval_main([
        "--load-config", str(out_dir),
        "--output-path", str(tmp_path / "m_auto.json"),
        "--raster-capacity", "auto",
    ])
    assert out["results"]["raster_overflow_max"] == 0.0


def test_checkpoint_roundtrip(tmp_path):
    import jax.numpy as jnp

    from uncertainty_nerf_gs_tpu.engine import checkpointing as ck

    state = {"params": {"w": jnp.arange(4.0)}, "step": np.int32(7)}
    ck.save_checkpoint(tmp_path, 7, state)
    ck.save_checkpoint(tmp_path, 12, state)
    assert ck.latest_checkpoint(tmp_path).name == "step-000000012.ckpt"
    loaded, step = ck.load_latest(tmp_path)
    assert step == 12
    np.testing.assert_allclose(np.asarray(loaded["params"]["w"]), [0, 1, 2, 3])


def test_ggn_cache_roundtrip(tmp_path):
    import jax.numpy as jnp

    from uncertainty_nerf_gs_tpu.engine import checkpointing as ck
    from uncertainty_nerf_gs_tpu.models.laplace import LaplacePosterior

    post = LaplacePosterior(
        density_head={"kernel": jnp.ones((4, 1)), "bias": jnp.ones((1,))},
        rgb_head={"kernel": jnp.ones((4, 3)), "bias": jnp.ones((3,))},
    )
    assert ck.load_ggn_cache(tmp_path, 300, post) is None
    ck.save_ggn_cache(tmp_path, 300, post)
    loaded = ck.load_ggn_cache(tmp_path, 300, post)
    np.testing.assert_allclose(
        np.asarray(loaded.rgb_head["kernel"]), np.ones((4, 3))
    )


def test_eval_mcdropout_and_ensemble(tiny_blender, tmp_path):
    """MC-dropout eval path + 2-member ensemble fan-out through the CLI."""
    import json as _json

    overrides = dict(TINY_OVERRIDES)
    run_a = _train("nerfacto-mcdropout", tiny_blender, tmp_path, overrides, iters=4)

    from uncertainty_nerf_gs_tpu.scripts.eval_uncertainty import main as eval_main

    out = eval_main([
        "--load-config", str(run_a),
        "--output-path", str(tmp_path / "mc.json"),
        "--mc-samples", "3",
    ])
    res = out["results"]
    assert np.isfinite(res["psnr"])
    assert "nll_rgb" in res  # MC std produced rgb_std

    # second member with a different seed -> ensemble eval
    from uncertainty_nerf_gs_tpu.scripts.train import main as train_main

    run_b = tmp_path / "run_member_b"
    train_main([
        "nerfacto-mcdropout", "--data", str(tiny_blender),
        "--dataparser", "blender-data", "--output-dir", str(run_b),
        "--max-num-iterations", "4", "--steps-per-save", "4",
        "--seed", "1", "--log-every", "0",
        "--overrides", _json.dumps(overrides),
    ])
    out2 = eval_main([
        "--load-config", str(run_a),
        "--load-config", str(run_b),
        "--output-path", str(tmp_path / "ens.json"),
    ])
    res2 = out2["results"]
    assert np.isfinite(res2["psnr"])
    assert "nll_rgb" in res2  # cross-member std
    payload = json.load(open(tmp_path / "ens.json"))
    assert payload["method_name"] == "ensemble"

    # --main-stride-scale: strided fused render stays close to the exact one
    out3 = eval_main([
        "--load-config", str(run_a),
        "--load-config", str(run_b),
        "--output-path", str(tmp_path / "ens_stride.json"),
        "--main-stride-scale", "4.0",
    ])
    res3 = out3["results"]
    assert np.isfinite(res3["psnr"])
    assert abs(res3["psnr"] - res2["psnr"]) < 1.0


def test_eval_laplace_cli(tiny_blender, tmp_path):
    """Laplace eval path: GGN fit (tiny iters), cache file, predictive render."""
    out_dir = _train("nerfacto-laplace", tiny_blender, tmp_path, TINY_OVERRIDES, iters=4)

    from uncertainty_nerf_gs_tpu.scripts.eval_uncertainty import main as eval_main

    out = eval_main([
        "--load-config", str(out_dir),
        "--output-path", str(tmp_path / "lap.json"),
        "--laplace-iters", "2",
        "--laplace-samples", "8",
    ])
    res = out["results"]
    assert np.isfinite(res["psnr"])
    assert "nll_rgb" in res
    from uncertainty_nerf_gs_tpu.engine.checkpointing import ggn_cache_path

    assert ggn_cache_path(out_dir, 2).exists()  # cache written


def test_pose_gradient_maps(tiny_blender, tmp_path):
    """6-DoF pose-sensitivity maps via one jacrev per chunk."""
    out_dir = _train("nerfacto", tiny_blender, tmp_path, TINY_OVERRIDES, iters=3)
    from uncertainty_nerf_gs_tpu.scripts.pose_gradient import main as pg_main

    pg_dir = tmp_path / "pg"
    pg_main([
        "--load-config", str(out_dir),
        "--output-dir", str(pg_dir),
        "--camera-idx", "0",
        "--magnitude-trans", "0.01",
        "--direction", "0",
        "--chunk", "192",
    ])
    jac = np.load(pg_dir / "jacobian_0.npy")
    assert jac.shape == (24, 24, 3, 6)
    assert np.isfinite(jac).all()
    assert np.abs(jac).sum() > 0
    assert (pg_dir / "sensitivity_0.png").exists()


def test_eval_depth_metrics_path(tiny_blender, tmp_path):
    """Depth uncertainty eval: GT npy + scale_parameters.txt wiring."""
    out_dir = _train("active-nerfacto", tiny_blender, tmp_path / "d", TINY_OVERRIDES, iters=3)

    # fabricate GT depth files for the 2 test images
    ds = tmp_path / "depth_ds"
    ds.mkdir()
    rng = np.random.default_rng(0)
    for i in range(2):
        np.save(ds / f"depth_gt_{i:02d}.npy", rng.uniform(1.0, 3.0, (24, 24)).astype(np.float32))
    np.savetxt(ds / "scale_parameters.txt", [1.5])

    from uncertainty_nerf_gs_tpu.scripts.eval_uncertainty import main as eval_main

    out = eval_main([
        "--load-config", str(out_dir),
        "--output-path", str(tmp_path / "dm.json"),
        "--eval-depth-unc",
        "--dataset-path", str(ds),
    ])
    res = out["results"]
    assert "nll_depth" in res and np.isfinite(res["nll_depth"])
    assert "depth_ause_rmse" in res


def test_dotted_model_flags_roundtrip(tiny_blender, tmp_path):
    """Tyro-style dotted flags (`--model.beta-min 0.02`, the reference's
    `--pipeline.model.X` surface, README:122) parse against the method's
    model-config dataclass, persist into config.json AND config.yml, and
    round-trip through eval (VERDICT r3 #7)."""
    from uncertainty_nerf_gs_tpu.scripts.train import main as train_main

    out_dir = tmp_path / "run_dotted"
    train_main([
        "active-nerfacto",
        "--data", str(tiny_blender),
        "--dataparser", "blender-data",
        "--output-dir", str(out_dir),
        "--max-num-iterations", "2",
        "--steps-per-save", "2",
        "--log-every", "0",
        "--overrides", json.dumps(TINY_OVERRIDES),
        "--model.beta-min", "0.02",
        "--pipeline.model.log2-hashmap-size=9",
        "--model.camera-optimizer.mode", "off",
    ])
    cfg = json.load(open(out_dir / "config.json"))
    assert cfg["overrides"]["beta_min"] == 0.02
    assert cfg["overrides"]["log2_hashmap_size"] == 9
    assert cfg["camera_opt"] == "off"

    # eval reloads through the YAML config alone (reference round-trips
    # config.yml, `ensemble_utils.py:131`) and the model carries the flag
    (out_dir / "config.json").unlink()
    from uncertainty_nerf_gs_tpu.scripts.eval_uncertainty import _load_run

    trainer, spec, run_cfg, _ = _load_run(out_dir)
    assert run_cfg["overrides"]["beta_min"] == 0.02
    assert trainer.config.beta_min == 0.02
    assert trainer.config.log2_hashmap_size == 9


def test_dotted_model_flags_reject_unknown_field(tiny_blender, tmp_path):
    from uncertainty_nerf_gs_tpu.scripts.train import main as train_main

    with pytest.raises(SystemExit, match="unknown model-config field"):
        train_main([
            "active-nerfacto",
            "--data", str(tiny_blender),
            "--dataparser", "blender-data",
            "--output-dir", str(tmp_path / "x"),
            "--max-num-iterations", "1",
            "--model.not-a-field", "1.0",
        ])


def test_train_resume_continues_from_step(tiny_blender, tmp_path):
    """`--load-dir` resume restores params+opt_state+step and continues
    (nerfstudio `ns-train --load-dir` semantics, VERDICT r1 item 6)."""
    from uncertainty_nerf_gs_tpu.scripts.train import main as train_main

    out_dir = _train(
        "active-nerfacto", tiny_blender, tmp_path, TINY_OVERRIDES, iters=4
    )
    assert (out_dir / "step-000000004.ckpt").exists()
    out_dir2 = tmp_path / "resumed"
    train_main([
        "active-nerfacto",
        "--data", str(tiny_blender),
        "--dataparser", "blender-data",
        "--output-dir", str(out_dir2),
        "--load-dir", str(out_dir),
        "--max-num-iterations", "8",
        "--steps-per-save", "4",
        "--seed", "0",
        "--log-every", "0",
        "--overrides", json.dumps(TINY_OVERRIDES),
    ])
    # resumed run continues 4 -> 8: exactly one new checkpoint at step 8
    names = sorted(p.name for p in out_dir2.glob("step-*.ckpt"))
    assert names == ["step-000000008.ckpt"]

    from uncertainty_nerf_gs_tpu.engine.checkpointing import load_latest

    state, step = load_latest(out_dir2)
    assert step == 8
    assert int(np.asarray(state["step"])) == 8


def test_splat_train_resume(tiny_blender, tmp_path):
    from uncertainty_nerf_gs_tpu.scripts.train import main as train_main

    out_dir = _train(
        "active-splatfacto", tiny_blender, tmp_path, TINY_SPLAT_OVERRIDES, iters=3
    )
    out_dir2 = tmp_path / "resumed_splat"
    train_main([
        "active-splatfacto",
        "--data", str(tiny_blender),
        "--dataparser", "blender-data",
        "--output-dir", str(out_dir2),
        "--load-dir", str(out_dir),
        "--max-num-iterations", "6",
        "--steps-per-save", "3",
        "--seed", "0",
        "--log-every", "0",
        "--overrides", json.dumps(TINY_SPLAT_OVERRIDES),
    ])
    from uncertainty_nerf_gs_tpu.engine.checkpointing import load_latest

    state, step = load_latest(out_dir2)
    assert step == 6
    assert "camera_opt" in state  # splat ckpt carries camera optimizer state


def test_camera_optimizer_on_by_default_for_nerfacto_family():
    """Reference trains nerfacto-family methods with SO3xR3 camera
    optimization ON (`laplace_config.py:37`); the method registry must
    reproduce that and expose the camera_opt optimizer group."""
    from uncertainty_nerf_gs_tpu.configs.methods import METHODS

    for name, spec in METHODS.items():
        if spec.family == "nerfacto":
            assert spec.use_camera_optimizer, name
        else:
            assert not spec.use_camera_optimizer, name


def test_camera_opt_param_group_layout(tiny_blender, tmp_path):
    from uncertainty_nerf_gs_tpu.data.dataparsers import DATAPARSERS
    from uncertainty_nerf_gs_tpu.data.datasets import load_images
    from uncertainty_nerf_gs_tpu.engine.trainer import NerfactoTrainer
    from uncertainty_nerf_gs_tpu.models.nerfacto import NerfactoConfig

    outputs = DATAPARSERS["blender-data"](tiny_blender, "train")
    images = load_images(outputs)
    import dataclasses

    cfg = dataclasses.replace(
        NerfactoConfig(), num_images=len(outputs.cameras), **TINY_OVERRIDES
    )
    tr = NerfactoTrainer(
        config=cfg, cameras=outputs.cameras, images=images,
        use_camera_optimizer=True,
    )
    assert tr.state.params["camera_opt"].shape == (len(outputs.cameras), 6)
    # gradient flows into the pose tangents after one step
    import jax

    key = jax.random.PRNGKey(0)
    batch = tr.sample_batch(key, 64)
    tr.state, _ = tr._train_step(tr.state, batch, key)
    assert float(np.abs(np.asarray(tr.state.params["camera_opt"])).sum()) > 0


def test_masked_pixel_sampling_device_side(tiny_blender):
    """Masked sampling draws only nonzero-mask pixels (nerfstudio mask
    semantics), covers the whole valid set, and runs device-side — the
    valid-coordinate table is a device array and sampling consumes the JAX
    key, no host RNG (VERDICT r2 weak-3)."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from uncertainty_nerf_gs_tpu.data.dataparsers import DATAPARSERS
    from uncertainty_nerf_gs_tpu.data.datasets import load_images
    from uncertainty_nerf_gs_tpu.engine.trainer import NerfactoTrainer
    from uncertainty_nerf_gs_tpu.models.nerfacto import NerfactoConfig

    outputs = DATAPARSERS["blender-data"](tiny_blender, "train")
    images = load_images(outputs)
    n, h, w = images.shape[:3]
    masks = np.zeros((n, h, w), bool)
    masks[:, : h // 2, : w // 2] = True  # only the top-left quadrant valid
    masks[0] = False  # camera 0 fully excluded
    cfg = dataclasses.replace(
        NerfactoConfig(), num_images=n, **TINY_OVERRIDES
    )
    tr = NerfactoTrainer(
        config=cfg, cameras=outputs.cameras, images=images, masks=masks
    )
    assert isinstance(tr._valid_coords, jnp.ndarray)
    batch = tr.sample_batch(jax.random.PRNGKey(3), 2048)
    cam = np.asarray(batch["camera_indices"])
    py = np.asarray(batch["pixel_y"]).astype(int)
    px = np.asarray(batch["pixel_x"]).astype(int)
    assert masks[cam, py, px].all()  # every draw is a valid pixel
    assert (cam != 0).all()  # excluded camera never sampled
    # uniform over the valid list: with 2048 draws over n-1 cameras every
    # remaining camera should appear
    assert set(np.unique(cam)) == set(range(1, n))
    # identical key -> identical batch (pure function of the key)
    batch2 = tr.sample_batch(jax.random.PRNGKey(3), 2048)
    np.testing.assert_array_equal(cam, np.asarray(batch2["camera_indices"]))


def test_sparse_parser_defaults_hybrid_facereg(tiny_blender, tmp_path):
    """Sparse-view dataparsers flip the nerfacto grid layout to hybrid +
    face-consistency (measured best at 12 views, see build_trainer); an
    explicit grid_layout override suppresses the flip."""
    from uncertainty_nerf_gs_tpu.scripts.train import build_trainer

    # fabricate a 100-frame blender set (sparse-blender's fixed perms
    # index into 100 train frames) by repeating frame 0
    with open(tiny_blender / "transforms_train.json") as f:
        meta = json.load(f)
    root = tmp_path / "b100"
    (root / "train").mkdir(parents=True)
    import shutil

    first = Path(meta["frames"][0]["file_path"]).name + ".png"
    shutil.copy(tiny_blender / "train" / first, root / "train" / first)
    meta100 = {
        "camera_angle_x": meta["camera_angle_x"],
        "frames": [dict(meta["frames"][0]) for _ in range(100)],
    }
    with open(root / "transforms_train.json", "w") as f:
        json.dump(meta100, f)

    kw = {"seed_name": "seed1", "num_images": 5}
    tr, _, _ = build_trainer(
        "nerfacto", root, "sparse-blender", parser_kwargs=kw,
        config_overrides=dict(TINY_OVERRIDES),
    )
    assert tr.config.grid_layout == "hybrid"
    assert tr.config.face_consistency_mult == 1.0

    tr2, _, _ = build_trainer(
        "nerfacto", root, "sparse-blender", parser_kwargs=kw,
        config_overrides=dict(TINY_OVERRIDES, grid_layout="cell"),
    )
    assert tr2.config.grid_layout == "cell"
    assert tr2.config.face_consistency_mult == 0.0


def test_ensemble_per_member_mode_and_fold_guard(tiny_blender, tmp_path):
    """--ensemble-mode per-member runs the reference's sequential semantics
    (per-member proposal chains, `ensemble_pipeline.py:155-157`) and the
    benchmark JSON records shared_proposal_chain accordingly; --table-fold
    2/4 is rejected up front (it crashes the TPU compiler,
    evidence/fold_incontext_r4.json)."""
    import json as _json

    overrides = dict(TINY_OVERRIDES)
    run_a = _train("active-nerfacto", tiny_blender, tmp_path, overrides,
                   iters=4)
    from uncertainty_nerf_gs_tpu.scripts.train import main as train_main
    from uncertainty_nerf_gs_tpu.scripts.eval_uncertainty import (
        main as eval_main,
    )

    run_b = tmp_path / "run_member_b"
    train_main([
        "active-nerfacto", "--data", str(tiny_blender),
        "--dataparser", "blender-data", "--output-dir", str(run_b),
        "--max-num-iterations", "4", "--steps-per-save", "4",
        "--seed", "1", "--log-every", "0",
        "--overrides", _json.dumps(overrides),
    ])

    out_f = eval_main([
        "--load-config", str(run_a), "--load-config", str(run_b),
        "--output-path", str(tmp_path / "ens_fused.json"),
    ])
    out_p = eval_main([
        "--load-config", str(run_a), "--load-config", str(run_b),
        "--output-path", str(tmp_path / "ens_pm.json"),
        "--ensemble-mode", "per-member",
    ])
    ap_f = json.load(open(tmp_path / "ens_fused.json"))["approximations"]
    ap_p = json.load(open(tmp_path / "ens_pm.json"))["approximations"]
    assert ap_f["shared_proposal_chain"] is True
    assert ap_f["proposal_anchor_stride"] is True
    assert ap_p["shared_proposal_chain"] is False
    assert ap_p["proposal_anchor_stride"] is False
    assert ap_p["table_dtype"] == "f32"  # no packed tables on this path
    # both modes produce finite metrics on the same substrate; at 4 train
    # iters they need not match, but they must be same order of magnitude
    assert np.isfinite(out_f["results"]["psnr"])
    assert np.isfinite(out_p["results"]["psnr"])
    assert abs(out_f["results"]["psnr"] - out_p["results"]["psnr"]) < 6.0

    with pytest.raises(SystemExit):
        eval_main([
            "--load-config", str(run_a), "--load-config", str(run_b),
            "--output-path", str(tmp_path / "x.json"),
            "--table-fold", "2",
        ])


# ---------------------------------------------------------------------------
# real-capture (COLMAP-processed nerfstudio tree) end-to-end
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def tiny_capture(tmp_path_factory):
    from uncertainty_nerf_gs_tpu.data.synthetic import write_nerfstudio_dataset

    root = tmp_path_factory.mktemp("capture_e2e") / "scene"
    write_nerfstudio_dataset(root, num_frames=10, height=24, width=24)
    return root


def test_train_eval_nerfstudio_capture(tiny_capture, tmp_path):
    """The real-capture pipeline end-to-end (VERDICT r4 missing #3's
    buildable slice): a COLMAP-processed nerfstudio tree — OPENCV
    distortion, per-frame focals, applied_transform + binary PLY — through
    `unc-train --dataparser nerfstudio-data` and the eval CLI. The GT
    images are rendered THROUGH the distortion model, so rays generated
    from the parsed (distorted) cameras are self-consistent with the
    pixels they supervise."""
    from uncertainty_nerf_gs_tpu.scripts.train import main as train_main

    out_dir = tmp_path / "run_capture"
    train_main([
        "active-nerfacto",
        "--data", str(tiny_capture),
        "--dataparser", "nerfstudio-data",
        "--output-dir", str(out_dir),
        "--max-num-iterations", "5",
        "--steps-per-save", "5",
        "--seed", "0",
        "--log-every", "0",
        "--camera-opt", "off",
        "--overrides", json.dumps(TINY_OVERRIDES),
    ])

    from uncertainty_nerf_gs_tpu.scripts.eval_uncertainty import main as eval_main

    metrics_path = tmp_path / "capture_metrics.json"
    out = eval_main([
        "--load-config", str(out_dir),
        "--output-path", str(metrics_path),
    ])
    res = out["results"]
    assert np.isfinite(res["psnr"])
    payload = json.load(open(metrics_path))
    assert payload["dataparser"] == "nerfstudio-data"


def test_splatfacto_seeds_from_capture_ply(tiny_capture):
    """SfM seeding parity (splatfacto `means` initialize from the parsed
    points3D, `init_gaussians`): building the splat trainer on the capture
    tree must place the PLY seed points verbatim at the head of the means
    buffer."""
    from uncertainty_nerf_gs_tpu.data import dataparsers as dp
    from uncertainty_nerf_gs_tpu.scripts.train import build_trainer

    trainer, spec, outputs = build_trainer(
        "active-splatfacto", tiny_capture, "nerfstudio-data",
        config_overrides=dict(TINY_SPLAT_OVERRIDES, capacity=512),
        camera_opt="off",
    )
    pts = outputs.metadata["points3D_xyz"]
    means = np.asarray(trainer.params["means"][: len(pts)])
    np.testing.assert_allclose(means, pts, atol=1e-6)
