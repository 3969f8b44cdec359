"""Structured metrics emission (stdout tables + JSONL).

Reference analogue: the stdout tables each program prints (DoFs, setup
time, solve time, iterations, L2 error, DoF/s — SURVEY.md §5 "Metrics /
logging"), upgraded to also append machine-readable JSONL for the driver
and plotting scripts.
"""

from __future__ import annotations

import json
import os
import time
from typing import Any


def emit(record: dict[str, Any], path: str | None = None) -> None:
    """Print one JSON line; append to `path` (or $TPUFEM_METRICS) if set."""
    record = dict(record)
    record.setdefault("ts", time.time())
    line = json.dumps(record)
    print(line)
    path = path or os.environ.get("TPUFEM_METRICS")
    if path:
        with open(path, "a") as f:
            f.write(line + "\n")


def profile_trace(path: str = "/tmp/tpufem_trace"):
    """Context manager: jax.profiler trace for kernel-level inspection
    (the nvprof/nvvp analogue, SURVEY.md §5)."""
    import jax

    return jax.profiler.trace(path)
