"""Assembled-SpMV benchmark (thin front-end over bmop --spmv).

Reference analogue: ``bmspmv.cu`` (SURVEY.md §2): times the assembled
sparse-matrix apply with the same protocol as bmop, the baseline the
matrix-free path is compared against (BASELINE config 3).

Run:  python -m tpufem.apps.bmspmv --dim 3 --degrees 1 2 3 4 --refine 4
"""

from __future__ import annotations

import sys

from tpufem.apps.bmop import main as bmop_main


def main(argv=None):
    argv = list(sys.argv[1:] if argv is None else argv)
    if "--spmv" not in argv:
        argv.append("--spmv")
    return bmop_main(argv)


if __name__ == "__main__":
    main()
