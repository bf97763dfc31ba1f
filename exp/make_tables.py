"""Generate the BASELINE.md round-4 tables from exp/ artifacts.

Reads metrics.jsonl files (deduping repeated steps from killed+resumed
runs by keeping the LAST occurrence of each step), the chip-session eval
outputs, and prints markdown tables. Every number printed here exists as
a file in exp/ — the docs cite nothing else (VERDICT r3 weak #2).
"""
import json
import os
import sys


def load_metrics(path):
    rows = {}
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            d = json.loads(line)
            rows[d["step"]] = d  # later occurrence wins (resume overwrite)
    return [rows[k] for k in sorted(rows)]


def curve_table(runs, steps=(500, 1000, 2500, 5000, 10000, 15000, 20000, 25000)):
    print("| Config | " + " | ".join(f"@{s}" for s in steps) + " | last |")
    print("|---|" + "---|" * (len(steps) + 1))
    for name, path in runs:
        if not os.path.exists(path):
            print(f"| {name} | (no metrics.jsonl) |")
            continue
        rows = load_metrics(path)
        if not rows:
            print(f"| {name} | (empty metrics.jsonl) |")
            continue
        by_step = {r["step"]: r for r in rows}
        cells = []
        for s in steps:
            r = by_step.get(s)
            cells.append(f"{r['psnr']:.2f}" if r else "—")
        last = rows[-1]
        cells.append(f"{last['psnr']:.2f} @{last['step']}")
        print(f"| {name} | " + " | ".join(cells) + " |")


def rate_summary(path, tail_frac=0.5):
    rows = [r for r in load_metrics(path) if r.get("rays_per_sec", 0) > 0]
    if not rows:
        return None
    tail = rows[int(len(rows) * (1 - tail_frac)):]
    rates = sorted(r["rays_per_sec"] for r in tail)
    return rates[len(rates) // 2]


if __name__ == "__main__":
    runs = [
        ("speed flagship (scale_speed)", "exp/scale_speed/metrics.jsonl"),
        ("quality hash fast (scale_fast25)", "exp/scale_fast25/metrics.jsonl"),
        ("parity reference-exact (scale_parity)",
         "exp/scale_parity/metrics.jsonl"),
        ("round-5 quality rerun (scale_r5q)",
         "exp/scale_r5q/metrics.jsonl"),
        ("objq shootout: hashed obj field (objq_hash)",
         "exp/objq_hash/metrics.jsonl"),
        ("objq shootout: spectral obj field (objq_spec)",
         "exp/objq_spec/metrics.jsonl"),
    ]
    print("### Train-batch PSNR at aligned steps\n")
    curve_table(runs)
    print()
    for name, path in runs:
        if os.path.exists(path):
            med = rate_summary(path)
            if med:
                print(f"- {name}: median sustained {med:,.0f} rays/s "
                      f"(full recipe, solo unless noted)")
    import glob
    evals = (sorted(glob.glob("exp/scale_speed/eval/metrics_*.json"))
             + sorted(glob.glob("exp/scale_fast25/eval/metrics_*.json"))
             + sorted(glob.glob("exp/scale_r5q/eval/metrics_*.json"))
             + sorted(glob.glob("exp/objq_hash/eval/metrics_*.json"))
             + sorted(glob.glob("exp/objq_spec/eval/metrics_*.json")))
    files = ([("eval " + p.split("exp/")[1], p) for p in evals]
             + [("lidar_eval", "exp/scale_speed/lidar_eval/metrics.json"),
                ("lidar_eval fast25",
                 "exp/scale_fast25/lidar_eval/metrics.json"),
                ("lidar_eval parity", "exp/scale_parity/lidar_eval/metrics.json"),
                ("lidar_eval r5q", "exp/scale_r5q/lidar_eval/metrics.json"),
                ("raydrop dense summary r5q",
                 "exp/scale_r5q/kitti_dense/summary.json"),
                ("bench", "exp/BENCH_local_r4.json"),
                ("bench r4c", "exp/BENCH_local_r4c.json"),
                ("bench r5", "exp/BENCH_local_r5.json"),
                ("multichip exec r5", "exp/MULTICHIP_exec_r5.json"),
                ("profile ladder r5c (objects decomposition)",
                 "exp/profile_recipe/results.json"),
                ("obj hit fractions (budget sizing)",
                 "exp/profile_recipe/obj_frac.json")])
    for tag, p in files:
        if os.path.exists(p):
            print(f"\n### {tag}\n```json")
            sys.stdout.write(open(p).read().strip() + "\n```\n")
    # sweep_bench prints its JSON line into the chip-session logs.
    for log in ("exp/chip_session_r4.log", "exp/chip_session_r4c.log",
                "exp/chip_session_r5b.log"):
        if os.path.exists(log):
            for line in open(log):
                if line.startswith("{") and "sweeps_per_sec" in line:
                    print(f"\n### sweep_bench ({log})\n```json\n"
                          + line.strip() + "\n```")
