#!/usr/bin/env python
"""Tabulate/plot bmop JSONL results (reference scripts/ analogue).

Usage: python scripts/plot_benchmarks.py bench_results.jsonl
Prints a GDoF/s table per degree; writes a matplotlib PNG if available.
"""

import json
import sys


def main(path: str):
    rows = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            try:
                rec = json.loads(line)
            except json.JSONDecodeError:
                continue
            if rec.get("bench") == "bmop":
                rows.append(rec)
    if not rows:
        print("no bmop records found")
        return
    print(f"{'dim':>3} {'p':>2} {'ndofs':>10} {'scheme':>10} "
          f"{'GDoF/s':>8} {'SpMV GDoF/s':>11} {'speedup':>7}")
    for r in sorted(rows, key=lambda r: (r["dim"], r["degree"])):
        print(
            f"{r['dim']:>3} {r['degree']:>2} {r['n_dofs']:>10} "
            f"{r['scheme']:>10} {r['gdofs_per_s']:>8.3f} "
            f"{r.get('spmv_gdofs_per_s', float('nan')):>11.3f} "
            f"{r.get('mf_speedup_vs_spmv', float('nan')):>7.2f}"
        )
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        ps = [r["degree"] for r in rows]
        gd = [r["gdofs_per_s"] for r in rows]
        fig, ax = plt.subplots()
        ax.plot(ps, gd, "o-", label="matrix-free")
        if any("spmv_gdofs_per_s" in r for r in rows):
            ax.plot(ps, [r.get("spmv_gdofs_per_s") for r in rows], "s--",
                    label="assembled SpMV")
        ax.set_xlabel("polynomial degree p")
        ax.set_ylabel("GDoF/s")
        ax.legend()
        fig.savefig("bench_results.png", dpi=120)
        print("wrote bench_results.png")
    except Exception:
        pass


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "bench_results.jsonl")
