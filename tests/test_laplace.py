"""Laplace posterior tests.

Key oracle: output-space Gaussian sampling must match the reference's
weight-space sampling (`laplace_field.py:528-567`) in distribution — checked
by explicit weight-draw Monte Carlo on a linear layer.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from uncertainty_nerf_gs_tpu.data.synthetic import make_dataset
from uncertainty_nerf_gs_tpu.engine.trainer import NerfactoTrainer
from uncertainty_nerf_gs_tpu.models.laplace import (
    LaplacePosterior,
    _linear_posterior_moments,
    _pushforward_moments,
    fit_laplace,
    laplace_render,
)
from uncertainty_nerf_gs_tpu.models.nerfacto import NerfactoConfig
from uncertainty_nerf_gs_tpu.ops.sampling import RayBundle

from tests.test_models import TINY


def test_linear_posterior_matches_weight_space_sampling(rng):
    d, o, n = 8, 3, 200_000
    x = rng.normal(size=(5, d)).astype(np.float32)
    kernel = rng.normal(size=(d, o)).astype(np.float32)
    bias = rng.normal(size=(o,)).astype(np.float32)
    ggn_k = rng.uniform(0.5, 5.0, (d, o)).astype(np.float32)
    ggn_b = rng.uniform(0.5, 5.0, (o,)).astype(np.float32)
    prior_prec, eps = 1.0, 1e-9

    mu, var = _linear_posterior_moments(
        jnp.asarray(x),
        {"kernel": jnp.asarray(kernel), "bias": jnp.asarray(bias)},
        {"kernel": jnp.asarray(ggn_k), "bias": jnp.asarray(ggn_b)},
        prior_prec,
        eps,
    )

    # reference-style weight-space sampling
    std_k = 1.0 / np.sqrt(ggn_k + prior_prec + eps)
    std_b = 1.0 / np.sqrt(ggn_b + prior_prec + eps)
    ws = kernel[None] + rng.normal(size=(n, d, o)).astype(np.float32) * std_k
    bs = bias[None] + rng.normal(size=(n, o)).astype(np.float32) * std_b
    ys = np.einsum("pd,ndo->npo", x, ws) + bs[:, None, :]
    np.testing.assert_allclose(np.asarray(mu), ys.mean(0), atol=0.02)
    np.testing.assert_allclose(np.asarray(var), ys.var(0), rtol=0.05)


def test_pushforward_moments_sigmoid(rng):
    mu = jnp.asarray(rng.normal(size=(50,)).astype(np.float32))
    var = jnp.asarray(rng.uniform(0.01, 1.0, 50).astype(np.float32))
    m, v = _pushforward_moments(mu, var, jax.nn.sigmoid, jax.random.PRNGKey(0), 4000)
    # oracle via dense numpy MC
    samples = np.asarray(mu)[None] + np.sqrt(np.asarray(var))[None] * rng.normal(
        size=(200_000, 50)
    )
    s = 1.0 / (1.0 + np.exp(-samples))
    np.testing.assert_allclose(np.asarray(m), s.mean(0), atol=0.02)
    np.testing.assert_allclose(np.asarray(v), s.var(0), rtol=0.2, atol=2e-3)
    # zero variance -> deterministic activation
    m0, v0 = _pushforward_moments(mu, jnp.zeros_like(var), jax.nn.sigmoid,
                                  jax.random.PRNGKey(1), 64)
    np.testing.assert_allclose(np.asarray(m0), np.asarray(jax.nn.sigmoid(mu)), rtol=1e-5)
    # fp32 MC residue: sample std of identical values is ~eps, var ~eps^2-ish
    assert float(jnp.max(jnp.abs(v0))) < 1e-6


@pytest.fixture(scope="module")
def laplace_setup():
    cams, images, _ = make_dataset(4, 24, 24)
    cfg = NerfactoConfig(num_images=4, **TINY)
    trainer = NerfactoTrainer(cfg, cams, images)
    trainer.train(60, num_rays_per_batch=512)
    params = {k: v for k, v in trainer.state.params.items() if k != "camera_opt"}

    def batch_iter(i):
        key = jax.random.PRNGKey(100 + i)
        batch = trainer.sample_batch(key, 256)
        from uncertainty_nerf_gs_tpu.cameras.cameras import generate_rays

        return generate_rays(
            trainer.cameras, batch["camera_indices"], batch["pixel_x"], batch["pixel_y"]
        )

    posterior = fit_laplace(trainer.model, params, batch_iter, cfg, n_iters=5)
    return trainer, params, posterior, cfg


def test_fit_laplace_finite_positive(laplace_setup):
    _, _, posterior, _ = laplace_setup
    for leaf in jax.tree.leaves(posterior):
        arr = np.asarray(leaf)
        assert np.isfinite(arr).all()
        assert (arr >= 0).all()
    # density head must receive GGN mass (it drives the loss via weights)
    assert float(jnp.sum(posterior.density_head["kernel"])) > 0
    assert float(jnp.sum(posterior.rgb_head["kernel"])) > 0


def _bundle(n=16):
    return RayBundle(
        origins=jnp.tile(jnp.array([[0.0, 0.0, -2.2]]), (n, 1)),
        directions=jnp.tile(jnp.array([[0.0, 0.0, 1.0]]), (n, 1)),
        nears=jnp.full((n,), 0.5),
        fars=jnp.full((n,), 4.5),
        camera_indices=jnp.zeros((n,), jnp.int32),
    )


def test_laplace_render_outputs(laplace_setup):
    trainer, params, posterior, cfg = laplace_setup
    out = laplace_render(
        trainer.model, params, posterior, _bundle(16), jax.random.PRNGKey(0), cfg,
        n_samples=32, num_density_draws=32,
    )
    for k in ("rgb", "rgb_std", "depth", "depth_std", "accumulation", "expected_depth"):
        assert k in out, k
        assert np.isfinite(np.asarray(out[k])).all(), k
    assert (np.asarray(out["rgb_std"]) >= 0).all()
    assert float(jnp.max(out["rgb_std"])) > 0


def test_ggn_is_sum_reduction_over_rays(laplace_setup):
    """The reference fits the GGN of MSELoss(reduction=\"sum\")
    (`laplace_model.py:364`): seeing a batch twice must DOUBLE the GGN
    (round-2 regression: a 1/(R*C) normalization left the posterior ~3000x
    too wide and blurred the predictive render to PSNR ~22)."""
    import jax.tree_util as jtu

    trainer, params, _, cfg = laplace_setup
    from uncertainty_nerf_gs_tpu.cameras.cameras import generate_rays

    key = jax.random.PRNGKey(5)
    batch = trainer.sample_batch(key, 128)
    rb = generate_rays(
        trainer.cameras, batch["camera_indices"], batch["pixel_x"],
        batch["pixel_y"],
    )
    rb2 = jax.tree.map(lambda a: jnp.concatenate([a, a], 0), rb)
    p1 = fit_laplace(trainer.model, params, lambda i: rb, cfg, n_iters=1)
    p2 = fit_laplace(trainer.model, params, lambda i: rb2, cfg, n_iters=1)
    for a, b in zip(jtu.tree_leaves(p1), jtu.tree_leaves(p2)):
        np.testing.assert_allclose(
            2.0 * np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-8
        )


def test_laplace_variance_shrinks_with_prior_precision(laplace_setup):
    trainer, params, posterior, cfg = laplace_setup
    rb = _bundle(16)
    out_lo = laplace_render(
        trainer.model, params, posterior, rb, jax.random.PRNGKey(0), cfg,
        n_samples=64, prior_prec=1.0, num_density_draws=16,
    )
    out_hi = laplace_render(
        trainer.model, params, posterior, rb, jax.random.PRNGKey(0), cfg,
        n_samples=64, prior_prec=1e6, num_density_draws=16,
    )
    assert float(jnp.mean(out_hi["rgb_std"])) < float(jnp.mean(out_lo["rgb_std"]))
