"""Golden-test the LPIPS graph + weight converter against a torch oracle.

VERDICT r3 #5: the official AlexNet LPIPS weights are unobtainable in this
zero-egress image, so the *numerics* are certified instead — a torch
transcription of the LPIPS forward (the reference consumes torchmetrics'
LPIPS at `/root/reference/nerfuncertainty/scripts/eval_uncertainty.py:685`;
masked/spatial variant at `metrics/image_metrics.py:26-54`) is run against
`ops/lpips.py` on the SAME random weights round-tripped through
`scripts/convert_lpips_weights.py`'s .npz format. Agreement here means
dropping in the real weights later is a data-only change.
"""

from __future__ import annotations

import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

from uncertainty_nerf_gs_tpu.ops.lpips import (  # noqa: E402
    _ALEX_STAGES,
    load_params,
    lpips,
    lpips_spatial,
)

_CHANNELS = tuple(s[0] for s in _ALEX_STAGES)


# --- torch oracle: LPIPS forward transcribed from its published math -------


def _oracle_prep(img: np.ndarray) -> torch.Tensor:
    shift = torch.tensor([-0.030, -0.088, -0.188]).view(1, 3, 1, 1)
    scale = torch.tensor([0.458, 0.448, 0.450]).view(1, 3, 1, 1)
    t = torch.tensor(np.asarray(img), dtype=torch.float32)
    t = t.permute(2, 0, 1)[None] * 2.0 - 1.0
    return (t - shift) / scale


def _oracle_feats(npz, x: torch.Tensor) -> list[torch.Tensor]:
    out = []
    for i, (_, k, s, p) in enumerate(_ALEX_STAGES):
        w = torch.tensor(npz[f"conv{i}_w"])
        b = torch.tensor(npz[f"conv{i}_b"])
        x = F.relu(F.conv2d(x, w, b, stride=s, padding=p))
        out.append(x)
        if i in (0, 1):  # AlexNet max-pools (3, 2) after stages 0 and 1
            x = F.max_pool2d(x, 3, 2)
    return out


def _oracle_lpips(npz, img0, img1, spatial: bool = False):
    h, w = np.asarray(img0).shape[:2]
    f0 = _oracle_feats(npz, _oracle_prep(img0))
    f1 = _oracle_feats(npz, _oracle_prep(img1))
    total = None
    for i, (a, b) in enumerate(zip(f0, f1)):
        na = a / (a.pow(2).sum(1, keepdim=True).sqrt() + 1e-10)
        nb = b / (b.pow(2).sum(1, keepdim=True).sqrt() + 1e-10)
        d = (na - nb).pow(2)
        lin = torch.tensor(npz[f"lin{i}"]).view(1, -1, 1, 1)
        wmap = (d * lin).sum(1, keepdim=True)  # 1x1 linear head
        term = (
            F.interpolate(wmap, size=(h, w), mode="bilinear",
                          align_corners=False)
            if spatial else wmap.mean()
        )
        total = term if total is None else total + term
    return total[0, 0].numpy() if spatial else float(total)


# --- fake `lpips` pip package so the converter's extraction runs ------------


class _FakeLin(torch.nn.Module):
    def __init__(self, ch: int):
        super().__init__()
        lin = torch.nn.Conv2d(ch, 1, 1, bias=False)
        with torch.no_grad():
            lin.weight.abs_()  # LPIPS calibration heads are non-negative
        self.model = torch.nn.Sequential(torch.nn.Dropout(), lin)


class _FakeLPIPS(torch.nn.Module):
    def __init__(self, net: str = "alex"):
        super().__init__()
        convs, in_ch = [], 3
        for out_ch, k, s, p in _ALEX_STAGES:
            convs.append(torch.nn.Conv2d(in_ch, out_ch, k, stride=s, padding=p))
            in_ch = out_ch
        self.net = torch.nn.Sequential(*convs)
        self.lins = torch.nn.ModuleList([_FakeLin(c) for c in _CHANNELS])


@pytest.fixture()
def converted_npz(tmp_path, monkeypatch):
    """Random weights -> fake lpips package -> converter -> .npz dict."""
    torch.manual_seed(0)
    fake = types.ModuleType("lpips")
    fake.LPIPS = _FakeLPIPS
    monkeypatch.setitem(sys.modules, "lpips", fake)

    from uncertainty_nerf_gs_tpu.scripts.convert_lpips_weights import main

    out = tmp_path / "lpips_rand.npz"
    main(["--output", str(out)])
    return dict(np.load(out))


def _rand_imgs(h, w, seed=0):
    rng = np.random.default_rng(seed)
    a = rng.uniform(0, 1, (h, w, 3)).astype(np.float32)
    b = np.clip(a + rng.normal(0, 0.2, (h, w, 3)), 0, 1).astype(np.float32)
    return a, b


def test_converter_extracts_all_stages(converted_npz):
    for i, ((out_ch, k, _, _), ch) in enumerate(zip(_ALEX_STAGES, _CHANNELS)):
        assert converted_npz[f"conv{i}_w"].shape[:2][0] == out_ch
        assert converted_npz[f"conv{i}_w"].shape[2:] == (k, k)
        assert converted_npz[f"conv{i}_b"].shape == (out_ch,)
        assert converted_npz[f"lin{i}"].shape == (ch,)
        assert (converted_npz[f"lin{i}"] >= 0).all()


@pytest.mark.parametrize("shape", [(64, 64), (96, 80)])
def test_lpips_matches_torch_oracle(converted_npz, tmp_path, shape):
    img0, img1 = _rand_imgs(*shape)
    path = tmp_path / "w.npz"
    np.savez(path, **converted_npz)
    params = load_params(str(path))

    ours = float(lpips(img0, img1, params))
    oracle = _oracle_lpips(converted_npz, img0, img1)
    assert ours == pytest.approx(oracle, abs=1e-5)
    # sanity: identical images score ~0, and the metric is symmetric
    assert float(lpips(img0, img0, params)) == pytest.approx(0.0, abs=1e-6)
    assert float(lpips(img1, img0, params)) == pytest.approx(ours, abs=1e-5)


def test_spatial_and_masked_lpips_match_oracle(converted_npz, tmp_path):
    img0, img1 = _rand_imgs(64, 64, seed=3)
    path = tmp_path / "w.npz"
    np.savez(path, **converted_npz)
    params = load_params(str(path))

    ours_map = np.asarray(lpips_spatial(img0, img1, params))
    oracle_map = _oracle_lpips(converted_npz, img0, img1, spatial=True)
    assert ours_map.shape == oracle_map.shape == (64, 64)
    assert np.abs(ours_map - oracle_map).max() < 1e-5

    # reference LPIPSModule.forward semantics: masked mean of the map
    from uncertainty_nerf_gs_tpu.metrics.image_metrics import masked_lpips

    mask = np.zeros((64, 64), bool)
    mask[8:40, 16:48] = True
    ours_masked = float(masked_lpips(img0, img1, mask, params))
    assert ours_masked == pytest.approx(
        float(oracle_map[mask].mean()), abs=1e-5
    )
    ours_unmasked = float(masked_lpips(img0, img1, None, params))
    assert ours_unmasked == pytest.approx(float(oracle_map.mean()), abs=1e-5)
