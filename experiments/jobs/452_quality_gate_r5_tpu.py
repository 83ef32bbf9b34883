"""TPU re-run of the r5 widened gate (job 430 lost to the dead relay).

Identical semantics to experiments/jobs/450_quality_gate_r5_cpu.py but on
the chip; caches per-variant at metrics_r5tpu_* and overwrites
evidence/int8_stride_quality_r5.json WHOLESALE only at completion, so a
mid-run tunnel death never clobbers a complete CPU-gate evidence file
with a partial TPU one.
"""

import json
from pathlib import Path

import sys
sys.path.insert(0, "/root/repo")
for m in [k for k in sys.modules if k.startswith("uncertainty_nerf_gs_tpu")]:
    del sys.modules[m]

import jax

from uncertainty_nerf_gs_tpu.scripts.eval_uncertainty import main as eval_main

WORK = Path("/root/repo/.soak/quality2k")
SCENE = WORK / "scene"
MEMBERS = [str(WORK / f"member{i}") for i in range(5)]
OUT = Path("/root/repo/evidence/int8_stride_quality_r5.json")

for m in MEMBERS:
    steps = sorted(int(p.name[5:14]) for p in Path(m).glob("step-*.ckpt"))
    print(f"{m}: latest step {steps[-1] if steps else None}", flush=True)
    assert steps and steps[-1] >= 12000, f"{m} not converged yet"
assert (SCENE / "depth_gt_00.npy").exists(), "GT depth missing"

# (name, ensemble_mode, table_dtype, stride) — most important first so a
# mid-run OOM still leaves a gateable prefix on disk
VARIANTS = [
    ("bf16_permember", "per-member", "bf16", 0.0),
    ("bf16_exact", "fused", "bf16", 0.0),
    ("int8_stride8", "fused", "int8", 8.0),
    ("int8_exact", "fused", "int8", 0.0),
    ("int8_stride4", "fused", "int8", 4.0),
    ("int8_stride2", "fused", "int8", 2.0),
]

results: dict = {}


def write_out():
    OUT.write_text(json.dumps(results, indent=2) + "\n")


for name, mode, dtype, stride in VARIANTS:
    mpath = WORK / f"metrics_r5tpu_{name}.json"
    if mpath.exists():
        r = json.loads(mpath.read_text())["results"]
        print(name, "psnr", r.get("psnr"), "(cached)", flush=True)
    else:
        out = eval_main([
            "--load-config", MEMBERS[0], "--load-config", MEMBERS[1],
            "--load-config", MEMBERS[2], "--load-config", MEMBERS[3],
            "--load-config", MEMBERS[4],
            "--output-path", str(mpath),
            "--ensemble-mode", mode,
            "--table-dtype", dtype, "--main-stride-scale", str(stride),
            "--eval-depth-unc", "--dataset-path", str(SCENE),
        ])
        r = out["results"]
        print(name, "psnr", r.get("psnr"), flush=True)
        jax.clear_caches()
    results[name] = {k: r[k] for k in sorted(r)
                     if isinstance(r[k], (int, float))}
    results[name]["backend"] = "tpu"

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
    # the gate verdict: one-sided parity against the reference-exact
    # per-member row across PSNR + all AUSE + all AUCE-abs (RGB and depth)
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
    "depth_var_semantics": "nerfacto-family analytic Sum w (t-d)^2 + 1e-5 "
                           "(reference-exact, activenerfacto_model.py:"
                           "111-112); depth_var_mode=indirection is a "
                           "splat-only concern (VERDICT r4 #7)",
    "backend": "tpu (axon) — wholesale overwrite of the CPU-fallback gate (job 450)",
    "base_psnr": ref["psnr"],
}
write_out()
print("wrote", OUT, flush=True)
print("JOB_452_DONE", flush=True)
