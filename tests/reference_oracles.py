"""Numpy transcriptions of the reference's metric math, used as oracles.

These re-state, operation for operation, what the reference computes —
`/root/reference/nerfuncertainty/metrics/ause.py:7-44` (itself from
CF-NeRF) and `/root/reference/nerfuncertainty/metrics/auce.py:10-57`
(adapted there from evaluating_bdl) — including its Python-loop slicing
semantics, so the framework's vectorized implementations
(`uncertainty_nerf_gs_tpu/metrics/{ause,auce}.py`) can be checked against
the exact reference numbers on real renders (the BASELINE 1% AUSE parity
criterion). Written in plain numpy; deliberately slow and literal.
"""

from __future__ import annotations

import numpy as np
from scipy import stats


def ause_reference(unc_vec: np.ndarray, err_vec: np.ndarray, err_type: str = "rmse"):
    """Reference AUSE: 100 removal ratios, per-slice means over errors kept
    after removing the highest-error / highest-uncertainty fraction, joint
    max normalization, trapezoid of the curve difference."""
    unc_vec = np.asarray(unc_vec, np.float32).reshape(-1)
    err_vec = np.asarray(err_vec, np.float32).reshape(-1)
    ratio_removed = np.linspace(0, 1, 100, endpoint=False)
    n = len(err_vec)

    err_sorted = np.sort(err_vec)
    oracle = []
    for r in ratio_removed:
        kept = err_sorted[0 : int((1 - r) * n)]
        stat = kept.mean()
        oracle.append(np.sqrt(stat) if err_type == "rmse" else stat)
    oracle = np.array(oracle)

    order = np.argsort(unc_vec, kind="stable")
    err_by_var = err_vec[order]
    by_var = np.zeros(len(ratio_removed))
    for i, r in enumerate(ratio_removed):
        kept = err_by_var[0 : int((1 - r) * n)]
        stat = kept.mean()
        by_var[i] = np.sqrt(stat) if err_type == "rmse" else stat

    max_val = max(oracle.max(), by_var.max())
    oracle = oracle / max_val
    by_var = by_var / max_val
    value = np.trapezoid(by_var - oracle, ratio_removed)
    return ratio_removed, oracle, by_var, value


def auce_reference(mean_values: np.ndarray, sigma_values: np.ndarray,
                   target_values: np.ndarray) -> dict:
    """Reference AUCE: per-alpha central Gaussian intervals, empirical
    coverage + mean interval length, trapezoid AUCs."""
    mean_values = np.asarray(mean_values, np.float64).reshape(-1)
    sigma_values = np.asarray(sigma_values, np.float64).reshape(-1)
    target_values = np.asarray(target_values, np.float64).reshape(-1)
    num = float(np.prod(target_values.shape))

    coverage_values = []
    avg_length_values = []
    alphas = list(np.arange(start=0.01, stop=1.0, step=0.01))
    for alpha in alphas:
        z = stats.norm.ppf(1.0 - alpha / 2)
        lower = mean_values - z * sigma_values
        upper = mean_values + z * sigma_values
        coverage = np.count_nonzero(
            np.logical_and(target_values >= lower, target_values <= upper)
        ) / num
        coverage_values.append(coverage)
        avg_length_values.append(np.mean(upper - lower))

    auc_length = np.trapezoid(y=avg_length_values, x=alphas)
    coverage_error = np.array(coverage_values) - (1.0 - np.array(alphas))
    abs_error = np.abs(coverage_error)
    neg_error = (np.abs(coverage_error) - coverage_error) / 2.0
    return {
        "coverage_values": np.array(coverage_values),
        "avg_length_values": np.array(avg_length_values),
        "auc_abs_error_values": np.trapezoid(y=abs_error, x=alphas),
        "auc_length_values": auc_length,
        "auc_neg_error_values": np.trapezoid(y=neg_error, x=alphas),
    }


def nll_reference(pred: np.ndarray, gt: np.ndarray, std: np.ndarray,
                  eps: float = 3e-2) -> np.ndarray:
    """Reference Gaussian NLL with std floor (`eval_uncertainty.py:404-412`):
    per-element -log N(gt | pred, max(std, eps)^2), shape (n, c) — the
    harness averages all elements."""
    pred = np.asarray(pred, np.float64).reshape(-1, 3)
    gt = np.asarray(gt, np.float64).reshape(-1, 3)
    std = np.maximum(np.asarray(std, np.float64).reshape(-1, 1), eps)
    var = std**2
    return 0.5 * (np.log(2 * np.pi * var) + (gt - pred) ** 2 / var)
