#!/usr/bin/env python
"""Batch-run bmop over (degree, refine) and print a markdown table.

Reference analogue: the repo's ``scripts/`` batch-run/plot helpers
(SURVEY.md §2 "Plot/run scripts": run over (p, refinement), extract
timings).  Each cell is one bmop subprocess (fresh process = honest
compile/cache behavior); results stream to stdout as they land and the
table prints at the end.  Writes the raw JSONL alongside.

Run:  python scripts/run_sweep.py --dim 3 --degrees 1 2 3 4 --refines 3 4
      python scripts/run_sweep.py --cpu --degrees 2 3 --refines 2 3
"""

import argparse
import json
import subprocess
import sys
import time


def run_cell(dim, p, refine, dtype, reps, cpu, timeout):
    cmd = [sys.executable, "-m", "tpufem.apps.bmop", "--dim", str(dim),
           "--degrees", str(p), "--refine", str(refine),
           "--dtype", dtype, "--reps", str(reps)]
    if cpu:
        cmd.append("--cpu")
    t0 = time.perf_counter()
    try:
        r = subprocess.run(cmd, capture_output=True, text=True,
                           timeout=timeout)
    except subprocess.TimeoutExpired:
        return {"error": "timeout", "wall_s": timeout}
    wall = time.perf_counter() - t0
    if r.returncode != 0:
        return {"error": r.stderr.strip()[-200:], "wall_s": round(wall, 1)}
    for line in reversed(r.stdout.strip().splitlines()):
        try:
            rec = json.loads(line)
        except json.JSONDecodeError:
            continue
        rec["wall_s"] = round(wall, 1)
        return rec
    return {"error": "no JSON line", "wall_s": round(wall, 1)}


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--dim", type=int, default=3)
    ap.add_argument("--degrees", type=int, nargs="+",
                    default=[1, 2, 3, 4])
    ap.add_argument("--refines", type=int, nargs="+", default=[4])
    ap.add_argument("--dtype", default="float32")
    ap.add_argument("--reps", type=int, default=20)
    ap.add_argument("--timeout", type=int, default=900,
                    help="per-cell subprocess cap (s)")
    ap.add_argument("--out", default="sweep.jsonl")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    cells = {}
    with open(args.out, "w") as f:
        for refine in args.refines:
            for p in args.degrees:
                rec = run_cell(args.dim, p, refine, args.dtype, args.reps,
                               args.cpu, args.timeout)
                rec.update(degree=p, refine=refine, dim=args.dim)
                cells[(refine, p)] = rec
                f.write(json.dumps(rec) + "\n")
                f.flush()
                print(json.dumps(rec), flush=True)

    print(f"\n## bmop sweep — {args.dim}D, {args.dtype} (GDoF/s)\n")
    hdr = "| refine | " + " | ".join(f"p={p}" for p in args.degrees) + " |"
    print(hdr)
    print("|" + "---|" * (len(args.degrees) + 1))
    for refine in args.refines:
        row = [f"| {refine} "]
        for p in args.degrees:
            rec = cells[(refine, p)]
            v = rec.get("gdofs_per_s")
            row.append(f"| {v:.3f} " if v is not None
                       else "| ERR ")
        print("".join(row) + "|")
    print(f"\nraw records: {args.out}")


if __name__ == "__main__":
    main()
