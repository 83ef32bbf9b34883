"""Integration tests: nerfacto-family training + uncertainty mechanisms.

Tiny configs keep CPU compile times tolerable; the assertions are the §4
test-strategy oracles: overfit PSNR thresholds, statistical sanity of the
uncertainty heads (ensemble var == 0 for identical members, MC-dropout var
> 0 with dropout enabled, aleatoric NLL training runs).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from uncertainty_nerf_gs_tpu.data.synthetic import make_dataset
from uncertainty_nerf_gs_tpu.engine.trainer import NerfactoTrainer
from uncertainty_nerf_gs_tpu.metrics import psnr
from uncertainty_nerf_gs_tpu.models.ensemble import (
    combine_ensemble_outputs,
    ensemble_render,
    stack_params,
)
from uncertainty_nerf_gs_tpu.models.mcdropout import mc_dropout_render
from uncertainty_nerf_gs_tpu.models.nerfacto import NerfactoConfig
from uncertainty_nerf_gs_tpu.ops.sampling import RayBundle


TINY = dict(
    num_proposal_samples=(32, 16),
    num_nerf_samples=12,
    num_levels=6,
    max_res=128,
    log2_hashmap_size=13,
    proposal_net_args=(
        dict(num_levels=3, max_res=32, log2_hashmap_size=11, hidden_dim=16),
        dict(num_levels=3, max_res=64, log2_hashmap_size=11, hidden_dim=16),
    ),
    near_plane=0.5,
    far_plane=4.5,
    background_color="white",
    use_appearance_embedding=False,
    eval_num_rays_per_chunk=1024,
)


@pytest.fixture(scope="module")
def tiny_dataset():
    return make_dataset(4, 24, 24)


@pytest.fixture(scope="module")
def trained(tiny_dataset):
    cams, images, _ = tiny_dataset
    cfg = NerfactoConfig(num_images=4, **TINY)
    trainer = NerfactoTrainer(cfg, cams, images)
    trainer.train(150, num_rays_per_batch=512)
    return trainer


def _bundle(n=8):
    return RayBundle(
        origins=jnp.tile(jnp.array([[0.0, 0.0, -2.2]]), (n, 1)),
        directions=jnp.tile(jnp.array([[0.0, 0.0, 1.0]]), (n, 1)),
        nears=jnp.full((n,), 0.5),
        fars=jnp.full((n,), 4.5),
        camera_indices=jnp.zeros((n,), jnp.int32),
    )


def test_nerfacto_overfits(trained, tiny_dataset):
    cams, images, _ = tiny_dataset
    out = trained.render_image(0)
    assert out["rgb"].shape == (24, 24, 3)
    p = float(psnr(jnp.asarray(out["rgb"]), jnp.asarray(images[0])))
    assert p > 14.0, f"overfit PSNR too low: {p}"
    assert np.isfinite(out["depth"]).all()
    assert (out["accumulation"] >= 0).all()


def test_active_nerfacto_trains_and_outputs_variance(tiny_dataset):
    cams, images, _ = tiny_dataset
    cfg = NerfactoConfig(num_images=4, uncertainty_channels=1, **TINY)
    trainer = NerfactoTrainer(cfg, cams, images)
    losses = trainer.train(30, num_rays_per_batch=512)
    assert "nll_loss" in losses and np.isfinite(losses["nll_loss"])
    assert "density_l1_loss" in losses
    out = trainer.render_image(0)
    assert "rgb_var" in out and "rgb_std" in out
    assert (out["rgb_var"] >= 0).all()
    assert np.isfinite(out["rgb_var"]).all()
    # depth variance present for all nerfacto variants
    assert (out["depth_var"] > 0).all()


def test_mc_dropout_variance_positive(tiny_dataset):
    cams, images, _ = tiny_dataset
    cfg = NerfactoConfig(
        num_images=4,
        density_dropout_layers=(-1,),
        rgb_dropout_layers=(-1,),
        dropout_rate=0.2,
        **TINY,
    )
    trainer = NerfactoTrainer(cfg, cams, images)
    trainer.train(5, num_rays_per_batch=256)
    rb = _bundle(16)
    out = mc_dropout_render(
        trainer.model,
        {k: v for k, v in trainer.state.params.items() if k != "camera_opt"},
        rb,
        mc_samples=4,
        key=jax.random.PRNGKey(0),
    )
    assert out["rgb"].shape == (16, 3)
    assert "rgb_std" in out and "depth_std" in out and "expected_depth_std" in out
    # dropout must actually perturb the forwards
    assert float(jnp.max(out["rgb_std"])) > 0.0
    # different keys -> different stochastic renders
    out2 = mc_dropout_render(
        trainer.model,
        {k: v for k, v in trainer.state.params.items() if k != "camera_opt"},
        rb,
        mc_samples=4,
        key=jax.random.PRNGKey(1),
    )
    assert not np.allclose(np.asarray(out["rgb"]), np.asarray(out2["rgb"]))


def test_ensemble_identical_members_zero_variance(tiny_dataset):
    cams, images, _ = tiny_dataset
    cfg = NerfactoConfig(num_images=4, **TINY)
    trainer = NerfactoTrainer(cfg, cams, images)
    params = {k: v for k, v in trainer.state.params.items() if k != "camera_opt"}
    stacked = stack_params([params, params, params])
    out = ensemble_render(trainer.model, stacked, _bundle(8))
    assert float(jnp.max(out["rgb_std"])) < 1e-6
    assert out["rgb"].shape == (8, 3)


def test_ensemble_distinct_members_positive_variance(tiny_dataset):
    cams, images, _ = tiny_dataset
    cfg = NerfactoConfig(num_images=4, **TINY)
    t1 = NerfactoTrainer(cfg, cams, images, seed=0)
    t2 = NerfactoTrainer(cfg, cams, images, seed=1)
    p1 = {k: v for k, v in t1.state.params.items() if k != "camera_opt"}
    p2 = {k: v for k, v in t2.state.params.items() if k != "camera_opt"}
    out = ensemble_render(t1.model, stack_params([p1, p2]), _bundle(8))
    assert float(jnp.max(out["rgb_std"])) > 0.0


def test_combine_ensemble_active_members_parity_and_combined(rng):
    m, r = 4, 32
    stacked = {
        "rgb": jnp.asarray(rng.uniform(0, 1, (m, r, 3)).astype(np.float32)),
        "depth": jnp.asarray(rng.uniform(1, 3, (m, r)).astype(np.float32)),
        "rgb_var": jnp.asarray(rng.uniform(0, 0.1, (m, r)).astype(np.float32)),
        "rgb_std": None,
        "depth_var": jnp.asarray(rng.uniform(0, 0.5, (m, r)).astype(np.float32)),
        "depth_std": None,
    }
    stacked["rgb_std"] = jnp.sqrt(stacked["rgb_var"])
    stacked["depth_std"] = jnp.sqrt(stacked["depth_var"])
    out = combine_ensemble_outputs(stacked, parity_mode=True)
    # parity: *_std is the member mean of the stds (reference clobbering)
    np.testing.assert_allclose(
        np.asarray(out["rgb_std"]), np.asarray(jnp.mean(stacked["rgb_std"], 0)), rtol=1e-6
    )
    # combined keys carry epi+alea
    var_alea = np.asarray(jnp.mean(stacked["rgb_var"], 0))
    var_epi = np.asarray(jnp.var(stacked["rgb"], 0, ddof=1).mean(-1))
    np.testing.assert_allclose(
        np.asarray(out["rgb_var_combined"]), var_epi + var_alea, rtol=1e-5
    )
    out2 = combine_ensemble_outputs(stacked, parity_mode=False)
    np.testing.assert_allclose(
        np.asarray(out2["rgb_var"]), var_epi + var_alea, rtol=1e-5
    )


def test_camera_optimizer_param_group(tiny_dataset):
    cams, images, _ = tiny_dataset
    cfg = NerfactoConfig(num_images=4, **TINY)
    trainer = NerfactoTrainer(cfg, cams, images, use_camera_optimizer=True)
    assert "camera_opt" in trainer.state.params
    before = np.asarray(trainer.state.params["camera_opt"]).copy()
    trainer.train(3, num_rays_per_batch=256)
    after = np.asarray(trainer.state.params["camera_opt"])
    assert not np.allclose(before, after), "camera poses did not receive gradients"


def test_mlp_proposal_field_variant(tiny_dataset):
    """proposal_field_type='mlp': gather-free proposal densities produce a
    working forward with NO hash tables in the proposal params."""
    import jax

    cams, images, _ = tiny_dataset
    cfg = NerfactoConfig(num_images=4, proposal_field_type="mlp", **TINY)
    from uncertainty_nerf_gs_tpu.engine.trainer import NerfactoTrainer as _T

    tr = _T(cfg, cams, images)
    flat = jax.tree_util.tree_leaves_with_path(tr.state.params)
    prop_keys = [jax.tree_util.keystr(p) for p, _ in flat if "proposal" in jax.tree_util.keystr(p)]
    assert prop_keys and all("table" not in k for k in prop_keys)
    losses = tr.train(2, num_rays_per_batch=128)
    assert np.isfinite(losses["total_loss"])
