"""Round-4 quality gate for eval-time approximations (VERDICT r3 #1b).

Evaluates the 2-member ensemble at the CONVERGED checkpoints (job 310,
step-12000) across {bf16,int8} x {stride 0,2,3,4,8} and gates each
variant against the exact bf16 render with the ONE-SIDED criterion
(ADVICE r3): BASELINE.md's "AUSE within 1%" means *no worse than* — an
AUSE improvement is not a failure. A variant passes iff

    dPSNR > -0.1 dB  and  max(rel_dAUSE) < +1%   (degradation only)

The two-sided worst |dAUSE| is still reported for transparency.
Writes /root/repo/evidence/int8_stride_quality_r4.json (newline-terminated,
ADVICE r3 low). A passing variant may be promoted to the bench.py headline
citing this file.
"""

import json
from pathlib import Path

import sys
sys.path.insert(0, "/root/repo")

from uncertainty_nerf_gs_tpu.scripts.eval_uncertainty import main as eval_main

WORK = Path("/root/repo/.soak/quality2k")
members = [str(WORK / "member0"), str(WORK / "member1")]

for m in members:
    steps = sorted(int(p.name[5:14]) for p in Path(m).glob("step-*.ckpt"))
    print(f"{m}: latest step {steps[-1] if steps else None}", flush=True)

VARIANTS = [
    ("bf16_exact", "bf16", 0.0),
    ("int8_exact", "int8", 0.0),
    ("int8_stride2", "int8", 2.0),
    ("int8_stride4", "int8", 4.0),
    ("int8_stride8", "int8", 8.0),
]

import jax

results = {}
for name, dtype, stride in VARIANTS:
    mpath = WORK / f"metrics_r4_{name}.json"
    if mpath.exists():
        # resumable across the RESOURCE_EXHAUSTED cascade: reuse the
        # committed per-variant metrics from the earlier partial run
        r = json.loads(mpath.read_text())["results"]
        print(name, "psnr", r.get("psnr"), "(cached)", flush=True)
    else:
        out = eval_main([
            "--load-config", members[0], "--load-config", members[1],
            "--output-path", str(mpath),
            "--table-dtype", dtype, "--main-stride-scale", str(stride),
        ])
        r = out["results"]
        print(name, "psnr", r.get("psnr"), flush=True)
        # each eval builds fresh packed tables + jit graphs; without this
        # the 4th in-process variant OOM'd the chip (r4 cascade). Do NOT
        # delete live arrays: functools.cache'd module constants
        # (_lerp_matrices etc.) survive across eval_main calls and
        # deleting their buffers crashed the next variant ("Array has
        # been deleted", r4 gate attempt 2).
        jax.clear_caches()
    results[name] = {k: r[k] for k in sorted(r)
                     if isinstance(r[k], (int, float))}

base = results["bf16_exact"]
for name, r in results.items():
    if name == "bf16_exact":
        continue
    dpsnr = r["psnr"] - base["psnr"]
    rel_ause = {
        k: (r[k] - base[k]) / max(abs(base[k]), 1e-9)
        for k in r if "ause" in k
    }
    # one-sided: AUSE is lower-is-better, so positive rel = degradation;
    # improvements never fail the gate (ADVICE r3 medium)
    worst_degradation = max(rel_ause.values()) if rel_ause else 0.0
    worst_abs = max(abs(v) for v in rel_ause.values()) if rel_ause else 0.0
    results[name]["delta_psnr_db"] = round(dpsnr, 4)
    results[name]["worst_rel_ause_degradation"] = round(worst_degradation, 5)
    results[name]["worst_rel_ause_abs"] = round(worst_abs, 5)
    results[name]["passes"] = bool(dpsnr > -0.1 and worst_degradation < 0.01)
    print(f"{name}: dPSNR={dpsnr:+.4f} dB worst dAUSE degradation="
          f"{worst_degradation:+.4%} (|.|={worst_abs:.4%}) "
          f"passes={results[name]['passes']}", flush=True)

results["_meta"] = {
    "substrate": "2-member active-nerfacto ensemble, reference model scale, "
                 "40-view 64x64 procedural scene, step-12000 (job 310)",
    "criterion": "one-sided: dPSNR > -0.1 dB and max rel AUSE degradation "
                 "< 1% (BASELINE.md 'AUSE within 1%' = no worse than)",
    "base_psnr": base["psnr"],
}
out_path = Path("/root/repo/evidence/int8_stride_quality_r4.json")
out_path.write_text(json.dumps(results, indent=2) + "\n")
print("wrote", out_path, flush=True)
print("JOB_325G_DONE", flush=True)
