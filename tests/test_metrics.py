"""Oracle tests for AUSE / AUCE / NLL / PSNR / SSIM.

Oracles are direct numpy transcriptions of the reference math
(`/root/reference/nerfuncertainty/metrics/ause.py`, `auce.py`, and
`scripts/eval_uncertainty.py:404-412`).
"""

import jax.numpy as jnp
import numpy as np
import pytest
import scipy.stats

from uncertainty_nerf_gs_tpu.metrics import ause, auce, gaussian_nll, psnr, ssim


def ause_oracle(unc_vec, err_vec, err_type="rmse"):
    ratio_removed = np.linspace(0, 1, 100, endpoint=False)
    err_sorted = np.sort(err_vec)
    n = len(err_vec)
    curve = []
    for r in ratio_removed:
        s = err_sorted[0 : int((1 - r) * n)]
        curve.append(np.sqrt(s.mean()) if err_type == "rmse" else s.mean())
    by_var_order = np.argsort(unc_vec, kind="stable")
    err_by_var = err_vec[by_var_order]
    curve_v = []
    for r in ratio_removed:
        s = err_by_var[0 : int((1 - r) * n)]
        curve_v.append(np.sqrt(s.mean()) if err_type == "rmse" else s.mean())
    curve, curve_v = np.array(curve), np.array(curve_v)
    m = max(curve.max(), curve_v.max())
    curve, curve_v = curve / m, curve_v / m
    return np.trapezoid(curve_v - curve, ratio_removed)


def auce_oracle(mean, sigma, target):
    alphas = np.arange(0.01, 1.0, 0.01)
    n = float(np.prod(target.shape))
    cov, length = [], []
    for a in alphas:
        z = scipy.stats.norm.ppf(1.0 - a / 2)
        lo, hi = mean - z * sigma, mean + z * sigma
        cov.append(np.count_nonzero((target >= lo) & (target <= hi)) / n)
        length.append(np.mean(hi - lo))
    cov_err = np.array(cov) - (1.0 - alphas)
    return {
        "coverage_values": np.array(cov),
        "avg_length_values": np.array(length),
        "auc_abs_error_values": np.trapezoid(np.abs(cov_err), alphas),
        "auc_length_values": np.trapezoid(length, alphas),
        "auc_neg_error_values": np.trapezoid((np.abs(cov_err) - cov_err) / 2, alphas),
    }


@pytest.mark.parametrize("err_type", ["rmse", "mae", "mse"])
def test_ause_matches_reference_math(rng, err_type):
    n = 1000
    unc = rng.uniform(0.01, 1.0, n).astype(np.float32)
    err = (unc * rng.uniform(0.5, 1.5, n) + rng.normal(0, 0.05, n) ** 2).astype(
        np.float32
    )
    err = np.abs(err)
    ratios, oracle_c, by_var_c, value = ause(unc, err, err_type=err_type)
    expected = ause_oracle(unc, err, err_type)
    assert ratios.shape == (100,) and oracle_c.shape == (100,) and by_var_c.shape == (100,)
    np.testing.assert_allclose(float(value), expected, atol=2e-4)


def test_ause_perfect_uncertainty_is_zero(rng):
    err = rng.uniform(0, 1, 500).astype(np.float32)
    # uncertainty == error -> sparsification by variance equals oracle
    _, _, _, value = ause(err, err, err_type="mse")
    assert abs(float(value)) < 1e-6


def test_ause_bad_uncertainty_positive(rng):
    err = np.sort(rng.uniform(0, 1, 500)).astype(np.float32)
    anti = -err  # inverted ranking: worst possible
    _, _, _, value = ause(anti, err, err_type="mse")
    assert float(value) > 0.1


def test_auce_matches_reference_math(rng):
    n = 2000
    mean = rng.normal(0, 1, n).astype(np.float32)
    sigma = rng.uniform(0.05, 2.0, n).astype(np.float32)
    target = (mean + sigma * rng.normal(0, 1, n)).astype(np.float32)
    got = auce(mean, sigma, target)
    expected = auce_oracle(mean, sigma, target)
    np.testing.assert_allclose(
        np.asarray(got["coverage_values"]), expected["coverage_values"], atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(got["avg_length_values"]),
        expected["avg_length_values"],
        rtol=1e-4,
    )
    for k in ("auc_abs_error_values", "auc_length_values", "auc_neg_error_values"):
        np.testing.assert_allclose(float(got[k]), expected[k], rtol=1e-4, atol=1e-5)


def test_auce_calibrated_gaussian_near_zero(rng):
    n = 200_000
    mean = np.zeros(n, np.float32)
    sigma = np.ones(n, np.float32)
    target = rng.normal(0, 1, n).astype(np.float32)
    got = auce(mean, sigma, target)
    assert float(got["auc_abs_error_values"]) < 0.01


def test_nll_matches_scipy(rng):
    n = 300
    preds = rng.normal(0, 1, (n, 3)).astype(np.float32)
    targets = rng.normal(0, 1, (n, 3)).astype(np.float32)
    stds = rng.uniform(0.001, 2.0, n).astype(np.float32)
    eps = 3e-2
    got = np.asarray(gaussian_nll(preds, targets, stds, eps=eps))
    floored = np.maximum(stds, eps)[:, None]
    expected = -scipy.stats.norm.logpdf(targets, loc=preds, scale=floored)
    np.testing.assert_allclose(got, expected, rtol=1e-3, atol=1e-4)


def test_psnr_known_value():
    a = np.zeros((8, 8, 3), np.float32)
    b = np.full((8, 8, 3), 0.1, np.float32)
    # mse = 0.01 -> psnr = 20
    np.testing.assert_allclose(float(psnr(a, b)), 20.0, rtol=1e-5)


def test_ssim_identity_and_bounds(rng):
    img = rng.uniform(0, 1, (32, 32, 3)).astype(np.float32)
    assert float(ssim(img, img)) == pytest.approx(1.0, abs=1e-5)
    noisy = np.clip(img + rng.normal(0, 0.3, img.shape), 0, 1).astype(np.float32)
    val = float(ssim(img, noisy))
    assert 0.0 < val < 1.0


def test_ssim_matches_skimage_if_available(rng):
    skimage = pytest.importorskip("skimage.metrics")
    img = rng.uniform(0, 1, (48, 48, 3)).astype(np.float32)
    noisy = np.clip(img + rng.normal(0, 0.1, img.shape), 0, 1).astype(np.float32)
    ref = skimage.structural_similarity(
        img, noisy, channel_axis=2, data_range=1.0, gaussian_weights=True,
        sigma=1.5, use_sample_covariance=False,
    )
    # valid-vs-symmetric padding differ slightly at borders
    np.testing.assert_allclose(float(ssim(img, noisy)), ref, atol=2e-2)


def test_lpips_runs_and_orders(rng):
    from uncertainty_nerf_gs_tpu.metrics.image_metrics import lpips

    img = rng.uniform(0, 1, (64, 64, 3)).astype(np.float32)
    near = np.clip(img + rng.normal(0, 0.02, img.shape), 0, 1).astype(np.float32)
    far = rng.uniform(0, 1, (64, 64, 3)).astype(np.float32)
    d_same = float(lpips(img, img))
    d_near = float(lpips(img, near))
    d_far = float(lpips(img, far))
    assert d_same < 1e-6
    assert d_same < d_near < d_far


def test_masked_ause_auce_equal_subset(rng):
    """The device-side masked variants (VERDICT r2 weak-5) equal the
    metrics computed on the boolean-indexed subset."""
    n = 4096
    err = rng.uniform(0.0, 1.0, n).astype(np.float32)
    unc = rng.uniform(0.0, 1.0, n).astype(np.float32)
    mask = rng.uniform(size=n) > 0.35

    for err_type in ("mae", "mse", "rmse"):
        _, o_m, v_m, a_m = ause(
            jnp.asarray(unc), jnp.asarray(err), err_type,
            mask=jnp.asarray(mask),
        )
        _, o_s, v_s, a_s = ause(
            jnp.asarray(unc[mask]), jnp.asarray(err[mask]), err_type
        )
        np.testing.assert_allclose(np.asarray(o_m), np.asarray(o_s),
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(v_m), np.asarray(v_s),
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(float(a_m), float(a_s), atol=1e-6)

    mu = rng.normal(size=n).astype(np.float32)
    sig = rng.uniform(0.1, 1.0, n).astype(np.float32)
    tgt = (mu + sig * rng.normal(size=n)).astype(np.float32)
    got_m = auce(jnp.asarray(mu), jnp.asarray(sig), jnp.asarray(tgt),
                 mask=jnp.asarray(mask))
    got_s = auce(jnp.asarray(mu[mask]), jnp.asarray(sig[mask]),
                 jnp.asarray(tgt[mask]))
    for k in got_s:
        np.testing.assert_allclose(
            np.asarray(got_m[k]), np.asarray(got_s[k]), rtol=1e-5, atol=1e-6
        )
