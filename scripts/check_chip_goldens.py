#!/usr/bin/env python
"""Machine-diff the chip_checks artifact against the committed golden.

Round-validation ritual (VERDICT r3 weak item 6 — on-chip goldens were
hand-transcribed into COVERAGE.md before; a Mosaic/accuracy regression
would have passed the CPU suite silently):

    python scripts/chip_checks.py --out /tmp/chip_checks.json   # on chip
    python scripts/check_chip_goldens.py /tmp/chip_checks.json

Exit 0 iff every golden check matches:
  - iteration counts EQUAL the golden exactly (the bitwise-stability
    acceptance line means they must not drift run-to-run OR round-to-
    round for the same program);
  - bitwise_identical_solutions is true wherever the golden says so;
  - rel_err <= the golden's rel_err_max bound.
Nonzero exit + a per-field diff on any regression.
"""

import argparse
import json
import os
import sys

GOLDEN = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tests", "goldens",
    "chip_checks_golden.json")


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("artifact", nargs="?", default="/tmp/chip_checks.json")
    ap.add_argument("--golden", default=GOLDEN)
    args = ap.parse_args()

    with open(args.golden) as f:
        golden = json.load(f)
    with open(args.artifact) as f:
        got = json.load(f)

    failures = []
    if got.get("platform") != golden.get("platform"):
        failures.append(
            f"platform: artifact ran on {got.get('platform')!r}, golden "
            f"is for {golden.get('platform')!r} — chip goldens must be "
            "diffed against a chip run")

    by_check = {r.get("check"): r for r in got.get("records", [])}
    for g in golden["records"]:
        name = g["check"]
        r = by_check.get(name)
        if r is None:
            failures.append(f"{name}: missing from artifact")
            continue
        if not r.get("pass", False):
            failures.append(f"{name}: pass={r.get('pass')}")
        for key in g:
            # any *iterations field is an exact-match count record
            # (iterations, newton_iterations, linear_iterations, ...)
            if key.endswith("iterations"):
                if r.get(key) != g[key]:
                    failures.append(
                        f"{name}: {key} {r.get(key)} != golden "
                        f"{g[key]}")
        if g.get("bitwise_identical_solutions"):
            if not r.get("bitwise_identical_solutions"):
                failures.append(f"{name}: solutions not bitwise identical")
        if "rel_err_max" in g:
            rel = r.get("rel_err")
            if rel is None or rel > g["rel_err_max"]:
                failures.append(
                    f"{name}: rel_err {rel} > golden bound "
                    f"{g['rel_err_max']}")

    if failures:
        print("chip golden REGRESSION:")
        for f_ in failures:
            print(f"  - {f_}")
        sys.exit(1)
    print(f"chip goldens OK: {len(golden['records'])} checks match "
          f"{args.artifact}")


if __name__ == "__main__":
    main()
