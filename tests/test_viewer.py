"""Interactive viewer (`ut-viewer`): pose rendering + HTTP surface.

Covers the reference's `vis="viewer"` capability
(`laplace_config.py:55`) — our stdlib-HTTP re-design renders arbitrary
poses through the same predictive paths as the eval CLI."""

import json
import threading
import urllib.request

import numpy as np
import pytest

from tests.test_cli import TINY_OVERRIDES, TINY_SPLAT_OVERRIDES, _train, tiny_blender  # noqa: F401


@pytest.fixture(scope="module")
def nerfacto_run(tiny_blender, tmp_path_factory):  # noqa: F811
    return _train(
        "active-nerfacto", tiny_blender,
        tmp_path_factory.mktemp("viewer_nerf"), TINY_OVERRIDES, iters=5,
    )


def _orbit_pose(center, radius, az=0.5, el=0.3):
    o = np.array(center) + radius * np.array(
        [np.cos(az) * np.cos(el), np.sin(az) * np.cos(el), np.sin(el)]
    )
    f = (np.array(center) - o)
    f /= np.linalg.norm(f)
    r = np.array([f[1], -f[0], 0.0])
    r /= max(np.linalg.norm(r), 1e-8)
    u = np.cross(r, f)
    return np.stack([r, u, -f, o], axis=1).astype(np.float32)


def test_viewer_state_renders_modes(nerfacto_run):
    from uncertainty_nerf_gs_tpu.scripts.viewer import ViewerState

    state = ViewerState(nerfacto_run, downscale=2)
    info = state.info()
    assert "rgb" in info["modes"] and "depth" in info["modes"]
    assert "rgb_std" in info["modes"]  # active method exposes its std map

    c2w = _orbit_pose(info["center"], info["radius"])
    outs = state.render_pose(c2w)
    assert outs["rgb"].shape == (info["height"], info["width"], 3)
    for k in info["modes"]:
        assert np.isfinite(outs[k]).all(), k

    png = state.render_png(c2w, "rgb")
    assert png[:4] == b"\x89PNG"
    with pytest.raises(KeyError):
        state.render_png(c2w, "nope")


def test_viewer_http_roundtrip(nerfacto_run):
    from uncertainty_nerf_gs_tpu.scripts.viewer import ViewerState, serve

    state = ViewerState(nerfacto_run, downscale=2)
    server = serve(state, port=0)  # ephemeral port
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        base = f"http://127.0.0.1:{server.server_address[1]}"
        page = urllib.request.urlopen(base + "/", timeout=60).read()
        assert b"ut-viewer" in page
        info = json.loads(
            urllib.request.urlopen(base + "/info", timeout=60).read()
        )
        assert info["modes"][0] == "rgb"

        c2w = _orbit_pose(info["center"], info["radius"]).tolist()
        req = urllib.request.Request(
            base + "/render",
            data=json.dumps({"c2w": c2w, "mode": "depth"}).encode(),
            headers={"content-type": "application/json"},
        )
        png = urllib.request.urlopen(req, timeout=120).read()
        assert png[:4] == b"\x89PNG"

        bad = urllib.request.Request(
            base + "/render", data=json.dumps({"mode": "rgb"}).encode(),
            headers={"content-type": "application/json"},
        )
        with pytest.raises(urllib.error.HTTPError):
            urllib.request.urlopen(bad, timeout=60)
    finally:
        server.shutdown()


def test_viewer_state_ensemble(tiny_blender, tmp_path):  # noqa: F811
    """M run dirs -> combined ensemble render with epi/alea modes."""
    from uncertainty_nerf_gs_tpu.scripts.viewer import ViewerState

    runs = []
    for seed_tag in ("a", "b"):
        d = _train(
            "active-nerfacto", tiny_blender, tmp_path / seed_tag,
            TINY_OVERRIDES, iters=4,
        )
        runs.append(d)
    state = ViewerState(runs, downscale=2)
    info = state.info()
    assert info["num_members"] == 2
    assert "rgb_var_epi" in info["modes"]
    outs = state.render_pose(_orbit_pose(info["center"], info["radius"]))
    assert outs["rgb"].shape == (info["height"], info["width"], 3)
    assert np.isfinite(outs["rgb_var_epi"]).all()
    assert state.render_png(
        _orbit_pose(info["center"], info["radius"]), "rgb_var_epi"
    )[:4] == b"\x89PNG"


def test_viewer_state_splat(tiny_blender, tmp_path):  # noqa: F811
    from uncertainty_nerf_gs_tpu.scripts.viewer import ViewerState

    run = _train(
        "active-splatfacto", tiny_blender, tmp_path,
        TINY_SPLAT_OVERRIDES, iters=5,
    )
    state = ViewerState(run, downscale=2)
    info = state.info()
    assert "uncertainty" in info["modes"]  # active-splat std map
    outs = state.render_pose(_orbit_pose(info["center"], info["radius"]))
    assert outs["rgb"].shape == (info["height"], info["width"], 3)
    assert np.isfinite(outs["uncertainty"]).all()


def test_live_viewer_tracks_training(tiny_blender):  # noqa: F811
    """Training-time live viewer (reference `vis="viewer"` during training,
    `laplace_config.py:55`): serves the CURRENT params — the reported step
    advances and the rendered frame changes as training progresses."""
    from uncertainty_nerf_gs_tpu.scripts.train import build_trainer
    from uncertainty_nerf_gs_tpu.scripts.viewer import LiveViewerState, serve

    trainer, spec, _ = build_trainer(
        "active-nerfacto", tiny_blender, "blender-data", 0, None,
        TINY_OVERRIDES, camera_opt="off",
    )
    state = LiveViewerState(trainer, spec, downscale=2)
    info = state.info()
    assert info["step"] == 0
    c2w = _orbit_pose(info["center"], info["radius"])
    before = state.render_pose(c2w)["rgb"]

    server = serve(state, port=0)
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        trainer.train(4, num_rays_per_batch=64, log_every=0)
        base = f"http://127.0.0.1:{server.server_address[1]}"
        live = json.loads(
            urllib.request.urlopen(base + "/info", timeout=60).read()
        )
        assert live["step"] == 4  # live step, not a checkpoint snapshot
        after = state.render_pose(c2w)["rgb"]
        assert np.isfinite(after).all()
        assert not np.allclose(before, after)  # params actually moved
    finally:
        server.shutdown()
