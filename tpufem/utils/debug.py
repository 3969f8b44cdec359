"""Debug guards: NaN/Inf detection around device computations.

Reference analogue: the fail-fast ``AssertCuda``-style error macros of
``cuda_utils.cuh`` (SURVEY.md §5 "Failure detection": fail-fast, no
elastic recovery).  XLA computations cannot segfault like CUDA kernels;
the failure mode that matters is silent NaN/Inf propagation (e.g. from a
breakdown in CG or bad metric terms), so the guard checks for it.
"""

from __future__ import annotations

import functools
from typing import Callable

import jax
import jax.numpy as jnp


class NonFiniteError(RuntimeError):
    pass


def check_finite(x, what: str = "array"):
    """Host-side check (forces a sync; use outside hot loops)."""
    arr = jnp.asarray(x)
    if not bool(jnp.isfinite(arr).all()):
        n_bad = int(jnp.sum(~jnp.isfinite(arr)))
        raise NonFiniteError(
            f"{what}: {n_bad}/{arr.size} non-finite values detected"
        )
    return x


def nan_guard(fn: Callable, what: str | None = None) -> Callable:
    """Wrap a device function; raises NonFiniteError if its output contains
    NaN/Inf.  Adds one device->host sync per call — debugging tool, not for
    production hot loops (enable via TPUFEM_DEBUG=1 in the apps)."""
    name = what or getattr(fn, "__name__", "fn")

    @functools.wraps(fn)
    def wrapped(*args, **kwargs):
        out = fn(*args, **kwargs)
        for leaf in jax.tree_util.tree_leaves(out):
            check_finite(leaf, f"{name} output")
        return out

    return wrapped
