"""Tests for dataparsers (split policies + transforms parsing) and the
corruption harness. Uses the procedural Blender writer so no external
datasets are needed."""

import json
from pathlib import Path

import numpy as np
import pytest

from uncertainty_nerf_gs_tpu.data import corruption as cr
from uncertainty_nerf_gs_tpu.data import dataparsers as dp
from uncertainty_nerf_gs_tpu.data.synthetic import write_blender_dataset


# ---------------------------------------------------------------------------
# pure split policies
# ---------------------------------------------------------------------------


def test_split_fraction_matches_nerfstudio_semantics():
    i_train, i_eval = dp.get_train_eval_split_fraction(10, 0.9)
    assert len(i_train) == 9 and len(i_eval) == 1
    assert i_train[0] == 0 and i_train[-1] == 9
    # disjoint + covering
    assert len(np.union1d(i_train, i_eval)) == 10


def test_split_sparse_nerfstudio_scenes():
    i_train, i_val, scale = dp.split_sparse_nerfstudio("basket")
    assert list(i_train) == [43, 45, 47, 49]
    assert scale == 50.0
    i_train, i_val, scale = dp.split_sparse_nerfstudio("scene_079")
    assert len(i_train) == 35 and len(i_val) == 5
    assert not set(i_train) & set(i_val)


def test_split_sparse_mipnerf360_proportion():
    full_train, _ = dp.get_train_eval_split_fraction(100, 0.9)
    i_train, i_eval = dp.split_sparse_mipnerf360(100, 0.5)
    assert len(i_train) == round(len(full_train) * 0.5)
    assert set(i_train) <= set(full_train)
    # deterministic (seed 2024)
    i_train2, _ = dp.split_sparse_mipnerf360(100, 0.5)
    assert list(i_train) == list(i_train2)


def test_split_ood_halves_by_translation():
    rng = np.random.default_rng(0)
    poses = np.tile(np.eye(4)[None, :3], (40, 1, 1)).copy()
    poses[:, 0, 3] = rng.uniform(-1, 1, 40)
    i_train, i_eval = dp.split_ood_mipnerf360(poses, scene="garden")
    assert all(poses[i, 0, 3] >= 0 for i in i_train)
    assert all(poses[i, 0, 3] < 0 for i in i_eval)
    # room uses z
    poses_z = poses.copy()
    poses_z[:, 2, 3] = -poses[:, 0, 3]
    i_train_z, _ = dp.split_ood_mipnerf360(poses_z, scene="room")
    assert all(poses_z[i, 2, 3] >= 0 for i in i_train_z)


def test_split_robustnerf_yoda_ratio():
    names = (
        [f"0_clean_{i}.png" for i in range(10)]
        + [f"1_clutter_{i}.png" for i in range(10)]
        + [f"2_extra_{i}.png" for i in range(5)]
    )
    names.sort()
    i_train, i_eval = dp.split_robustnerf(names, "yoda", 1.0)
    assert len(i_train) == 10 and len(i_eval) == 5
    assert all("clutter" in names[i] for i in i_train)
    i_train, _ = dp.split_robustnerf(names, "yoda", 0.0)
    assert all("clean" in names[i] for i in i_train)
    i_train, _ = dp.split_robustnerf(names, "yoda", 0.5)
    n_clutter = sum("clutter" in names[i] for i in i_train)
    assert len(i_train) == 10 and n_clutter == 5
    # deterministic seeded mixing
    i_train2, _ = dp.split_robustnerf(names, "yoda", 0.5)
    assert list(i_train) == list(i_train2)


def test_split_robustnerf_other_scenes():
    names = [f"IMG_1{i:03d}.jpg" for i in range(5)] + [
        f"IMG_2{i:03d}.jpg" for i in range(7)
    ]
    i_train, i_eval = dp.split_robustnerf(names, "and-bot")
    assert len(i_train) == 7 and len(i_eval) == 5
    names = [f"f_{i}.png" for i in range(30)]
    i_train, i_eval = dp.split_robustnerf(names, "t_balloon_statue")
    assert list(i_eval) == list(range(19))
    names = [f"frame_train_{i}" for i in range(3)] + [f"frame_eval_{i}" for i in range(2)]
    i_train, i_eval = dp.split_robustnerf(names, "crab")
    assert len(i_train) == 3 and len(i_eval) == 2


def test_split_sparse_blender_prefix():
    idx = dp.split_sparse_blender("seed1", 5)
    assert list(idx) == [79, 37, 65, 54, 15]
    assert len(dp.split_sparse_blender("seed3", 10)) == 10


def test_split_hh_blender():
    poses = np.tile(np.eye(4)[None], (10, 1, 1)).copy()
    poses[:, 0, 3] = np.linspace(-1, 1, 10)
    tr = dp.split_hh_blender(poses, "train")
    te = dp.split_hh_blender(poses, "test")
    assert all(poses[i, 0, 3] <= 0 for i in tr)
    assert all(poses[i, 0, 3] > 0 for i in te)
    assert len(tr) + len(te) == 10


def test_auto_orient_and_center():
    rng = np.random.default_rng(1)
    poses = np.tile(np.eye(4)[None, :3], (6, 1, 1)).copy()
    poses[:, :3, 3] = rng.uniform(-2, 2, (6, 3)) + 5.0
    oriented, transform = dp.auto_orient_and_center_poses(poses)
    # centered
    np.testing.assert_allclose(oriented[:, :3, 3].mean(0), 0.0, atol=1e-5)
    # mean up is +z
    up = oriented[:, :3, 1].mean(0)
    np.testing.assert_allclose(up / np.linalg.norm(up), [0, 0, 1], atol=1e-5)


# ---------------------------------------------------------------------------
# end-to-end parsing on the procedural blender tree
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def blender_tree(tmp_path_factory):
    root = tmp_path_factory.mktemp("blender")
    write_blender_dataset(root, num_train=8, num_test=3, height=32, width=32)
    return root


def test_parse_blender(blender_tree):
    out = dp.parse_blender(blender_tree, "train")
    assert len(out.image_filenames) == 8
    assert out.cameras.width == 32
    assert all(Path(p).exists() for p in out.image_filenames)
    test = dp.parse_blender(blender_tree, "test", with_depth=True)
    assert test.depth_filenames is not None
    assert all(Path(p).exists() for p in test.depth_filenames)


def test_sparse_blender_parser(tmp_path, blender_tree):
    # reference sparse-blender assumes 100-frame Blender sets: fabricate one
    # by repeating an existing frame 100x (image content irrelevant here)
    with open(blender_tree / "transforms_train.json") as f:
        meta = json.load(f)
    base = meta["frames"][0]
    meta100 = {
        "camera_angle_x": meta["camera_angle_x"],
        "frames": [dict(base) for _ in range(100)],
    }
    root = tmp_path / "b100"
    (root / "train").mkdir(parents=True)
    import shutil

    shutil.copy(
        blender_tree / "train" / "r_0.png", root / "train" / "r_0.png"
    )
    with open(root / "transforms_train.json", "w") as f:
        json.dump(meta100, f)
    out = dp.sparse_blender(root, "train", seed_name="seed1", num_images=5)
    assert len(out.image_filenames) == 5


def test_hh_blender_parser(blender_tree):
    out_tr = dp.hh_blender(blender_tree, "train")
    out_te = dp.hh_blender(blender_tree, "test")
    assert len(out_tr.image_filenames) + len(out_te.image_filenames) <= 11


def test_parse_nerfstudio_roundtrip(tmp_path, blender_tree):
    # build a minimal transforms.json (nerfstudio-style) from the blender set
    with open(blender_tree / "transforms_train.json") as f:
        meta = json.load(f)
    frames = []
    for fr in meta["frames"]:
        frames.append(
            {
                "file_path": fr["file_path"][2:] + ".png",
                "transform_matrix": fr["transform_matrix"],
            }
        )
    ns_meta = {
        "fl_x": 40.0, "fl_y": 40.0, "cx": 16.0, "cy": 16.0, "w": 32, "h": 32,
        "frames": frames,
    }
    with open(blender_tree / "transforms.json", "w") as f:
        json.dump(ns_meta, f)
    out = dp.parse_nerfstudio(blender_tree, "train")
    assert out.cameras.width == 32
    assert len(out.image_filenames) + 1 >= 7  # 0.9 split of 8
    assert np.isfinite(np.asarray(out.cameras.camera_to_worlds)).all()
    assert out.dataparser_scale > 0
    # poses centered+scaled into unit box
    assert np.abs(np.asarray(out.cameras.camera_to_worlds)[:, :3, 3]).max() <= 1.0 + 1e-5


# ---------------------------------------------------------------------------
# corruption harness
# ---------------------------------------------------------------------------


def test_corruption_train_only(tmp_path, blender_tree):
    src = blender_tree / "train"
    dst = tmp_path / "noisy"
    done = cr.process_images(src, dst, "noise", std_dev=0.2, seed=0)
    n = len(done["train"]) + len(done["eval"])
    assert n == 8
    # 0.9 split of 8 -> ceil(7.2)=8 train? np.ceil(8*0.9)=8 -> all train
    assert len(done["train"]) == 8
    from PIL import Image

    for name in done["train"]:
        a = np.asarray(Image.open(src / name))
        b = np.asarray(Image.open(dst / name))
        assert a.shape == b.shape
        assert np.abs(a.astype(int) - b.astype(int)).mean() > 1.0  # noise applied


def test_corruption_eval_passthrough(tmp_path):
    from PIL import Image

    src = tmp_path / "imgs"
    src.mkdir()
    rng = np.random.default_rng(0)
    for i in range(20):
        Image.fromarray(
            rng.integers(0, 255, (16, 16, 3), dtype=np.uint8), "RGB"
        ).save(src / f"img_{i:03d}.png")
    dst = tmp_path / "out"
    done = cr.process_images(src, dst, "blur", kernel_size=5)
    assert len(done["train"]) == 18 and len(done["eval"]) == 2
    for name in done["eval"]:
        a = np.asarray(Image.open(src / name))
        b = np.asarray(Image.open(dst / name))
        np.testing.assert_array_equal(a, b)  # eval untouched


def test_blur_matches_separable_gaussian():
    img = np.zeros((11, 11, 1), np.uint8)
    img[5, 5, 0] = 255
    out = cr.add_gaussian_blur(img, kernel_size=5).astype(np.float64)
    # impulse response symmetric & mass-preserving (up to rounding)
    assert abs(out.sum() - 255.0) < 5.0
    np.testing.assert_allclose(out[:, :, 0], out[::-1, :, 0], atol=1.0)
    np.testing.assert_allclose(out[:, :, 0], out[:, ::-1, 0], atol=1.0)


def test_auto_downscale_rule_matches_nerfstudio(tmp_path):
    """nerfstudio semantics: smallest power-of-two factor bringing
    max(w, h) <= 1600 — a ~2000px or ~3118px (Mip-NeRF 360) image must
    auto-parse at factor 2 (ADVICE r1: the old rule was off by one level)."""
    from PIL import Image

    from uncertainty_nerf_gs_tpu.data.dataparsers import _get_fname

    img_dir = tmp_path / "images"
    img_dir.mkdir()
    Image.new("RGB", (2000, 1400)).save(img_dir / "probe.png")
    _, factor = _get_fname(Path("images/probe.png"), tmp_path, None)
    assert factor == 2

    Image.new("RGB", (3118, 2078)).save(img_dir / "probe360.png")
    _, factor = _get_fname(Path("images/probe360.png"), tmp_path, None)
    assert factor == 2

    Image.new("RGB", (1600, 1200)).save(img_dir / "small.png")
    _, factor = _get_fname(Path("images/small.png"), tmp_path, None)
    assert factor == 1

    Image.new("RGB", (6500, 4000)).save(img_dir / "huge.png")
    _, factor = _get_fname(Path("images/huge.png"), tmp_path, None)
    assert factor == 8  # 6500/4 = 1625 > 1600, so one more halving


def test_focus_center_method():
    """Cameras looking at a common point: focus centering recovers it."""
    from uncertainty_nerf_gs_tpu.data.dataparsers import (
        auto_orient_and_center_poses,
    )

    focus = np.array([0.3, -0.2, 0.5])
    rng = np.random.default_rng(0)
    poses = []
    for _ in range(12):
        origin = focus + rng.normal(size=3) * 2.0
        forward = focus - origin
        forward /= np.linalg.norm(forward)
        up = np.array([0.0, 0.0, 1.0])
        right = np.cross(forward, up)
        right /= np.linalg.norm(right)
        true_up = np.cross(right, forward)
        c2w = np.eye(4)[:3]
        # OpenGL convention: -z forward
        c2w[:, 0], c2w[:, 1], c2w[:, 2], c2w[:, 3] = right, true_up, -forward, origin
        poses.append(c2w)
    poses = np.stack(poses)
    oriented, transform = auto_orient_and_center_poses(
        poses, method="none", center_method="focus"
    )
    # with no rotation, the focus point should land at the origin
    np.testing.assert_allclose(
        transform[:, :3] @ focus + transform[:, 3], 0.0, atol=1e-5
    )


def test_fisheye_rays_equidistant_analytic():
    """Equidistant fisheye: a pixel at radius r from the principal point
    maps to angle theta = r/f off the optical axis (VERDICT r1 item 10)."""
    import jax.numpy as jnp

    from uncertainty_nerf_gs_tpu.cameras.cameras import (
        FISHEYE,
        Cameras,
        generate_rays,
    )

    f = 100.0
    cams = Cameras(
        camera_to_worlds=jnp.eye(4)[None, :3],  # identity pose, -z forward
        fx=jnp.array([f]), fy=jnp.array([f]),
        cx=jnp.array([50.0]), cy=jnp.array([50.0]),
        width=100, height=100,
        camera_type=FISHEYE,
    )
    # principal point -> exactly the optical axis (-z)
    rb = generate_rays(cams, jnp.zeros((1,), jnp.int32),
                       jnp.array([49.5]), jnp.array([49.5]))
    np.testing.assert_allclose(
        np.asarray(rb.directions[0]), [0.0, 0.0, -1.0], atol=1e-6
    )
    # pixel at +30 px along x: theta = 30/f = 0.3 rad off axis, in the x/-z
    # plane with positive x
    rb = generate_rays(cams, jnp.zeros((1,), jnp.int32),
                       jnp.array([49.5 + 30.0]), jnp.array([49.5]))
    d = np.asarray(rb.directions[0])
    theta = np.arccos(np.clip(-d[2], -1, 1))
    np.testing.assert_allclose(theta, 30.0 / f, atol=1e-6)
    assert d[0] > 0 and abs(d[1]) < 1e-7
    np.testing.assert_allclose(np.linalg.norm(d), 1.0, atol=1e-6)


# ---------------------------------------------------------------------------
# COLMAP-processed nerfstudio capture tree (real-capture surface)
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def capture_tree(tmp_path_factory):
    from uncertainty_nerf_gs_tpu.data.synthetic import write_nerfstudio_dataset

    root = tmp_path_factory.mktemp("capture") / "a"
    write_nerfstudio_dataset(root, num_frames=10, height=16, width=16)
    return root


def test_nerfstudio_capture_tree_parses(capture_tree):
    """The ns-process-data-style tree (single transforms.json, images/ dir
    with extensions, global OPENCV distortion + per-frame focal overrides,
    binary PLY seeds) drives the full parse_nerfstudio surface the Blender
    trees never touch (`robustnerf_dataparser.py:98-158`)."""
    out = dp.parse_nerfstudio(capture_tree, "train")
    ev = dp.parse_nerfstudio(capture_tree, "test")
    # nerfstudio fraction split: ceil(10 * 0.9) = 9 train / 1 eval
    assert len(out.cameras) == 9 and len(ev.cameras) == 1
    # global distortion made it onto every camera (k1, p1 slots)
    d = np.asarray(out.cameras.distortion_params)
    assert d.shape == (9, 6) and (d[:, 0] > 0).all() and (d[:, 4] > 0).all()
    # per-frame fl_x overrides survive (all focals distinct)
    assert len(np.unique(np.asarray(out.cameras.fx))) == 9
    # auto_scale_poses: camera centers land in the unit ball
    t = np.asarray(out.cameras.camera_to_worlds[:, :3, 3])
    assert np.abs(t).max() <= 1.0 + 1e-5
    # binary-PLY SfM seeds parsed, finite, colored from the spheres
    pts = out.metadata["points3D_xyz"]
    assert pts.shape == (240, 3) and np.isfinite(pts).all()
    cols = out.metadata["points3D_rgb"]
    assert cols.min() >= 0.0 and cols.max() <= 1.0 and len(np.unique(cols, axis=0)) == 3
    # seeds lie inside the camera shell after the same orient/scale
    assert np.linalg.norm(pts, axis=-1).max() < np.linalg.norm(t, axis=-1).max()


def test_applied_transform_chaining_invariance(tmp_path, capture_tree):
    """applied_transform chaining (`robustnerf_dataparser.py:379-386`):
    a tree recording applied_transform A with PLY points stored in the
    pre-applied (COLMAP) frame must parse to the SAME world points as a
    tree with no applied_transform and the PLY already in world frame —
    the chaining must exactly undo A."""
    from uncertainty_nerf_gs_tpu.data.synthetic import write_nerfstudio_dataset

    plain = write_nerfstudio_dataset(
        tmp_path / "b", num_frames=10, height=16, width=16,
        applied_transform=False,
    )
    oa = dp.parse_nerfstudio(capture_tree, "train")
    ob = dp.parse_nerfstudio(plain, "train")
    np.testing.assert_allclose(
        oa.metadata["points3D_xyz"], ob.metadata["points3D_xyz"], atol=1e-5
    )
    assert oa.dataparser_scale == ob.dataparser_scale
