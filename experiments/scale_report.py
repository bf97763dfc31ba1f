"""Summarize the at-scale runs (exp/scale_*) into a markdown table.

Reads each run's metrics.jsonl and reports train PSNR at aligned step
counts and at aligned wall-clock (minutes of stepping, compile excluded
by using each run's own first-metric timestamp), plus in-train test-view
PSNR where logged. Paste the output into BASELINE.md.
"""

import json
import os
import sys

RUNS = ["scale_fast", "scale_mxu", "scale_parity"]


def load(name):
    path = os.path.join("exp", name, "metrics.jsonl")
    if not os.path.exists(path):
        return None
    recs = [json.loads(l) for l in open(path)]
    train = [r for r in recs if "loss" in r]
    tests = [(r["step"], r["test_psnr"]) for r in recs if "test_psnr" in r]
    return {"train": train, "tests": tests}


def at_step(train, step):
    best = None
    for r in train:
        if r["step"] <= step:
            best = r
    return best


def at_minutes(train, minutes):
    t0 = train[0]["time"]
    best = None
    for r in train:
        if (r["time"] - t0) / 60.0 <= minutes:
            best = r
    return best


def fmt(r):
    return f"{r['psnr']:.2f} dB @ step {r['step']}" if r else "—"


def main():
    data = {n: load(n) for n in RUNS}
    steps = [int(s) for s in sys.argv[1:]] or [1000, 2500, 5000, 10000]
    print("| Run | " + " | ".join(f"PSNR@{s}" for s in steps)
          + " | last | test PSNR (last render) |")
    print("|---" * (len(steps) + 3) + "|")
    for n in RUNS:
        d = data[n]
        if d is None or not d["train"]:
            print(f"| {n} | " + " | ".join("—" for _ in steps) + " | — | — |")
            continue
        cells = []
        for s in steps:
            r = at_step(d["train"], s)
            cells.append(f"{r['psnr']:.2f}" if r and abs(r["step"] - s)
                         <= 100 else "—")
        last = d["train"][-1]
        test = (f"{d['tests'][-1][1]:.2f} @ {d['tests'][-1][0]}"
                if d["tests"] else "—")
        print(f"| {n} | " + " | ".join(cells)
              + f" | {last['psnr']:.2f} @ {last['step']} | {test} |")
    print()
    print("Equal wall-clock (minutes of stepping from each run's first "
          "metric; all runs shared the chip so absolute rates are "
          "contended):")
    print("| Run | @30 min | @60 min | @120 min | @240 min |")
    print("|---|---|---|---|---|")
    for n in RUNS:
        d = data[n]
        if d is None or not d["train"]:
            continue
        row = [fmt(at_minutes(d["train"], m)) for m in (30, 60, 120, 240)]
        print(f"| {n} | " + " | ".join(row) + " |")


if __name__ == "__main__":
    main()
