"""bench.py headline-selection policy (honesty rules, VERDICT r3 #1 /
r4 #1): the headline variant is chosen MECHANICALLY from committed gate
evidence, the r5 gate (full AUSE/AUCE+depth criterion) is authoritative
once its rows exist, and exact addressing knobs (fold/split) are adopted
from committed throughput measurements only.
"""

import json
import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import bench


def _write(base: Path, fname: str, payload: dict) -> None:
    p = base / fname
    p.parent.mkdir(parents=True, exist_ok=True)
    p.write_text(json.dumps(payload))


def test_no_evidence_falls_back_to_exact(tmp_path):
    passing, src = bench._gate_passing(tmp_path)
    assert passing == {"bf16_exact"}
    assert "fallback" in src


def test_r4_gate_used_when_r5_absent(tmp_path):
    _write(tmp_path, "evidence/int8_stride_quality_r4.json", {
        "int8_stride8": {"passes": True},
        "int8_stride2": {"passes": False},
    })
    passing, src = bench._gate_passing(tmp_path)
    # r4's baseline was the fused exact render itself -> always allowed
    assert passing == {"int8_stride8", "bf16_exact"}
    assert src.endswith("_r4.json")


def test_r5_gate_authoritative_even_when_all_fail(tmp_path):
    """An all-fail r5 gate must NOT silently regress to the r4 gate: the
    headline demotes to the exact fallback instead."""
    _write(tmp_path, "evidence/int8_stride_quality_r4.json", {
        "int8_stride8": {"passes": True},
    })
    _write(tmp_path, "evidence/int8_stride_quality_r5.json", {
        "_meta": {"criterion": "full"},
        "int8_stride8": {"passes": False},
        "bf16_exact": {"passes": False},
    })
    passing, src = bench._gate_passing(tmp_path)
    assert passing == set()
    assert src.endswith("_r5.json")
    # headline selection then lands on the exact-table fallback
    head = next((v for v in bench._VARIANTS if v[0] in passing),
                bench._VARIANTS[-1])
    assert head[0] == "bf16_exact"


def test_r5_gate_partial_pass_selects_fastest_passing(tmp_path):
    _write(tmp_path, "evidence/int8_stride_quality_r5.json", {
        "int8_stride8": {"passes": False},
        "int8_stride4": {"passes": True},
        "int8_exact": {"passes": True},
        "bf16_exact": {"passes": True},
    })
    passing, src = bench._gate_passing(tmp_path)
    assert src.endswith("_r5.json")
    head = next(v for v in bench._VARIANTS if v[0] in passing)
    assert head[0] == "int8_stride4"  # fastest-first _VARIANTS order


def test_r5_file_without_variant_rows_is_ignored(tmp_path):
    """A gate file holding only _meta (e.g. the job died before its first
    variant) must not count as an all-fail verdict."""
    _write(tmp_path, "evidence/int8_stride_quality_r5.json",
           {"_meta": {"criterion": "full"}})
    _write(tmp_path, "evidence/int8_stride_quality_r4.json", {
        "int8_stride8": {"passes": True},
    })
    passing, src = bench._gate_passing(tmp_path)
    assert "int8_stride8" in passing
    assert src.endswith("_r4.json")


def test_table_split_per_stride_verdict(tmp_path):
    _write(tmp_path, "evidence/table_split_incontext_r5.json", {
        "int8_exact_split0": 64551.3, "int8_exact_split1": 85149.6,
        "int8_stride8_split0": 107942.9, "int8_stride8_split1": 95095.4,
        "bf16_exact_split0": 58274.4, "bf16_exact_split1": 27963.7,
    })
    assert bench._use_table_split("int8", 0.0, tmp_path) is True
    assert bench._use_table_split("int8", 8.0, tmp_path) is False
    assert bench._use_table_split("bf16", 0.0, tmp_path) is False
    # stride without its own rows falls back to the same-dtype exact pair
    assert bench._use_table_split("int8", 2.0, tmp_path) is True


def test_best_fold_skips_non_numeric_crash_records(tmp_path):
    _write(tmp_path, "evidence/fold_incontext_r4.json", {
        "int8_fold1_ms": 500.0,
        "int8_fold2_ms": 800.0,
        "int8_fold4_ms": "HTTP 500: tpu_compile_helper crashed",
    })
    assert bench._best_fold("int8", tmp_path) == 1
    assert bench._best_fold("bf16", tmp_path) == 1  # no rows -> default


def test_committed_evidence_resolves_consistently():
    """Whatever is committed under evidence/ right now must resolve to a
    headline whose config exists in _VARIANTS (guards the round-end run)."""
    passing, src = bench._gate_passing()
    head = next((v for v in bench._VARIANTS if v[0] in passing),
                bench._VARIANTS[-1])
    assert head[0] in {v[0] for v in bench._VARIANTS}
    assert isinstance(bench._use_table_split(head[1], head[2]), bool)
    assert bench._best_fold(head[1]) in (1, 2, 4)
