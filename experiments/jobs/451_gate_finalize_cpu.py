"""Finalize the r5 gate evidence from whatever per-variant caches landed.

The CPU gate (job 450) writes per-variant metrics caches as it goes but the
evidence file only at completion (merge-safety vs a TPU re-run). If the run
is interrupted near round end, this finalizer writes
evidence/int8_stride_quality_r5.json from the caches that exist — the gate
is still valid for any variant whose row is present (bench.py only
headlines variants with a recorded PASS), provided the bf16_permember
baseline row landed. Usage: python experiments/jobs/451_gate_finalize_cpu.py
[cache_prefix], default metrics_r5cpu.
"""

import json
import sys
from pathlib import Path

WORK = Path("/root/repo/.soak/quality2k")
OUT = Path("/root/repo/evidence/int8_stride_quality_r5.json")
PREFIX = sys.argv[1] if len(sys.argv) > 1 else "metrics_r5cpu"
BACKEND = "cpu" if "cpu" in PREFIX else "tpu"

VARIANTS = ["bf16_permember", "bf16_exact", "int8_stride8", "int8_exact",
            "int8_stride4", "int8_stride2"]

results: dict = {}
for name in VARIANTS:
    mpath = WORK / f"{PREFIX}_{name}.json"
    if not mpath.exists():
        print(f"{name}: no cache — skipped", flush=True)
        continue
    r = json.loads(mpath.read_text())["results"]
    results[name] = {k: r[k] for k in sorted(r)
                     if isinstance(r[k], (int, float))}
    results[name]["backend"] = BACKEND

if "bf16_permember" not in results:
    sys.exit("baseline row (bf16_permember) missing — nothing to certify")

ref = results["bf16_permember"]
fused_base = results.get("bf16_exact", ref)


def deltas(r, base):
    dpsnr = r["psnr"] - base["psnr"]
    rel = lambda ks: {
        k: (r[k] - base[k]) / max(abs(base[k]), 1e-9) for k in ks
    }
    ause = rel([k for k in r if "ause" in k and k in base])
    auce = rel([k for k in r if "auce_abs" in k and k in base])
    worst_ause = max(ause.values()) if ause else 0.0
    worst_auce = max(auce.values()) if auce else 0.0
    return {
        "delta_psnr_db": round(dpsnr, 4),
        "worst_rel_ause_degradation": round(worst_ause, 5),
        "worst_rel_auce_abs_degradation": round(worst_auce, 5),
        "passes": bool(dpsnr > -0.1 and worst_ause < 0.01
                       and worst_auce < 0.01),
    }


for name, r in results.items():
    if name == "bf16_permember":
        continue
    r["vs_reference"] = deltas(r, ref)
    r["vs_fused_exact"] = deltas(r, fused_base)
    r["passes"] = r["vs_reference"]["passes"]
    v = r["vs_reference"]
    print(f"{name}: dPSNR={v['delta_psnr_db']:+.4f} dB "
          f"worst dAUSE={v['worst_rel_ause_degradation']:+.4%} "
          f"worst dAUCEabs={v['worst_rel_auce_abs_degradation']:+.4%} "
          f"passes={r['passes']}", flush=True)

results["_meta"] = {
    "substrate": "5-member active-nerfacto ensemble, reference model scale, "
                 "40-view 64x64 procedural scene, step-12000 "
                 "(jobs 310/405/415/425); analytic GT depth, 4 test views",
    "baseline": "bf16_permember = per-member proposal chains, raw f32 "
                "params (the reference's sequential ensemble semantics)",
    "criterion": "one-sided vs bf16_permember: dPSNR > -0.1 dB AND max rel "
                 "degradation over all *ause* keys < 1% AND over all "
                 "*auce_abs* keys < 1% (RGB + depth; BASELINE.json "
                 "'AUSE/AUCE parity' = no worse than)",
    "backend": BACKEND + (
        " — the axon relay died mid-round (job 430: Connection refused on "
        ":8083) before any TPU variant cached; quality parity is relative "
        "between variants on ONE backend (same code, checkpoints, scene), "
        "so the certification is backend-portable. Throughput numbers come "
        "only from TPU runs." if BACKEND == "cpu" else ""),
    "finalized_from_caches": True,
    "variants_present": sorted(k for k in results if k != "_meta"),
    "depth_var_semantics": "nerfacto-family analytic Sum w (t-d)^2 + 1e-5 "
                           "(reference-exact, activenerfacto_model.py:"
                           "111-112); depth_var_mode=indirection is a "
                           "splat-only concern (VERDICT r4 #7)",
    "base_psnr": ref["psnr"],
}
OUT.write_text(json.dumps(results, indent=2) + "\n")
print("wrote", OUT, flush=True)
