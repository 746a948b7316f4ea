"""Collect the round-4 quality-attribution runs into docs/quality_attribution_r4/."""
import json
import os
import shutil
import sys

RUNS = [
    ("chest_phantom_r3", "50 views (r3 run 1, committed)"),
    ("chest_phantom_views100", "100 views, same phantom+val"),
    ("chest_phantom_views200", "200 views, same phantom+val"),
    ("chest_phantom_views200_b01", "200 views + bound 0.1 (capacity probe)"),
    ("chest_phantom_tvd", "50 views + density-TV 0.1"),
    ("chest_phantom_smooth", "50 views, smoothed (real-CT-like) phantom"),
]
OUT = "docs/quality_attribution_r4"
os.makedirs(OUT, exist_ok=True)

rows = []
for exp, desc in RUNS:
    path = f"logs/{exp}/metrics.jsonl"
    if not os.path.exists(path):
        rows.append((exp, desc, None, None, None))
        continue
    ls = [json.loads(l) for l in open(path)]
    ev = [(r["step"], r["value"]) for r in ls if r["tag"] == "eval/psnr_3d"]
    ssim = [(r["step"], r["value"]) for r in ls if r["tag"] == "eval/ssim_3d"]
    if not ev:
        rows.append((exp, desc, None, None, None))
        continue
    peak = max(v for _, v in ev)
    final = ev[-1][1]
    s_final = ssim[-1][1] if ssim else float("nan")
    rows.append((exp, desc, peak, final, s_final))
    if exp != "chest_phantom_r3":
        shutil.copy(path, os.path.join(OUT, f"metrics_{exp}.jsonl"))
        evdirs = sorted(os.listdir(f"logs/{exp}/eval"))
        if evdirs:
            src = os.path.join(f"logs/{exp}/eval", evdirs[-1])
            for f in os.listdir(src):
                if f.endswith((".txt", ".png")):
                    shutil.copy(os.path.join(src, f),
                                os.path.join(OUT, f"{exp}_{f}"))

print(f"| run | peak 3D PSNR | final | final SSIM |")
print(f"|---|---|---|---|")
for exp, desc, peak, final, s in rows:
    if peak is None:
        print(f"| {desc} | (missing) | | |")
    else:
        print(f"| {desc} | {peak:.2f} | {final:.2f} | {s:.3f} |")
