"""On-chip A/B: precision/storage ladder for the adaptive box tier.

The round-4 adaptive analysis (docs/ROOFLINE.md) covered six STRUCTURAL
options; this lab measures the PRECISION axis it left out.  The whole
constrained vmult (cells q-grid matmuls + pair/rect transfers) runs f32
at HIGH (bf16x3 = 3 MXU passes per matmul).  Variants:

  high          baseline (current production tier)
  cells-def     cells stage at DEFAULT (1-pass bf16 multiply, f32
                accum); pair/rect transfers stay HIGH so the exact-
                identity rows of the compress sweeps stay faithful
  all-def       everything at DEFAULT (identity rows now round the
                carried values to bf16 per pass — measure the damage)
  bf16-patch    patch vector stored bfloat16 (halves the DMA of every
                slice/update in the transfer stages) — if it builds

Each variant reports the chained-apply rate (the bench protocol) and
the single-apply rel-l2 error vs the HIGH reference.

Usage:  timeout 900 python scripts/adaptive_prec_lab.py [refine] [steps]
"""
import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from tpufem.apps.bmop import adaptive_mesh
from tpufem.fem.constraints import make_hanging_node_constraints
from tpufem.fem.dof_handler import DoFHandler
from tpufem.ops import boxes as boxes_mod
from tpufem.ops import structured as structured_mod
from tpufem.ops.boxes import BoxLaplaceOperator

REFINE = int(sys.argv[1]) if len(sys.argv) > 1 else 4
STEPS = int(sys.argv[2]) if len(sys.argv) > 2 else 2
N_CHAIN = 30

DEFAULT = jax.lax.Precision.DEFAULT
HIGH = jax.lax.Precision.HIGH


def chain_rate(op, x):
    @jax.jit
    def chain(pr, v):
        def body(i, u):
            return (op._vmult_p(pr, u) * 1e-7).astype(u.dtype)

        return jax.lax.fori_loop(0, N_CHAIN, body, v)

    y = chain(op.params, x)
    s = float(jnp.sum(jnp.abs(y).astype(jnp.float32)))
    t0 = time.perf_counter()
    y = chain(op.params, x)
    s = float(jnp.sum(jnp.abs(y).astype(jnp.float32)))
    dt = (time.perf_counter() - t0) / N_CHAIN
    assert np.isfinite(s), "non-finite chain output"
    return dt


def one_apply(op, x):
    f = jax.jit(op._vmult_p)
    y = f(op.params, x)
    return np.asarray(y, np.float64)


def pair_apply_forced_high(P, U, transpose=False):
    for a, Pa in enumerate(P):
        M = Pa.T if transpose else Pa
        U = jnp.moveaxis(
            jnp.tensordot(M, jnp.moveaxis(U, a, 0),
                          axes=((1,), (0,)), precision=HIGH), 0, a)
    return U


def main():
    t0 = time.perf_counter()
    mesh = adaptive_mesh(3, REFINE, STEPS)
    dofs = DoFHandler(mesh, 4)
    ac = make_hanging_node_constraints(dofs)
    print(f"setup {time.perf_counter()-t0:.0f}s  n_dofs={dofs.n_dofs} "
          f"n_hanging={len(ac.lines)}", flush=True)

    results = {}

    def run(tag, dtype="float32"):
        tb = time.perf_counter()
        op = BoxLaplaceOperator(mesh, dofs, constraints=ac, dtype=dtype)
        x = op.to_patch(np.ones(dofs.n_dofs))
        if jnp.dtype(dtype) != jnp.float32:
            x = x.astype(jnp.dtype(dtype))
        dt = chain_rate(op, x)
        y = one_apply(op, x)
        gd = dofs.n_dofs / dt / 1e9
        results[tag] = (gd, y)
        ref = results.get("high", (None, None))[1]
        err = (np.linalg.norm(y - ref) / np.linalg.norm(ref)
               if ref is not None and tag != "high" else 0.0)
        print(f"{tag:12s} {gd:6.3f} GDoF/s  ({dt*1e3:6.2f} ms)  "
              f"rel_err={err:.2e}  build {time.perf_counter()-tb:.0f}s",
              flush=True)

    # baseline
    run("high")

    # cells at DEFAULT, transfers pinned HIGH
    saved_pair = BoxLaplaceOperator.__dict__["_pair_apply"]
    structured_mod._AXIS_MM_PRECISION_F32 = DEFAULT
    BoxLaplaceOperator._pair_apply = staticmethod(pair_apply_forced_high)
    try:
        run("cells-def")
    except Exception as e:
        print(f"cells-def FAILED: {type(e).__name__}: {e}", flush=True)
    BoxLaplaceOperator._pair_apply = saved_pair

    # everything at DEFAULT (rect interps stay HIGHEST — they are a
    # small slice; flipping them needs a code change, do it only if
    # this variant wins)
    try:
        run("all-def")
    except Exception as e:
        print(f"all-def FAILED: {type(e).__name__}: {e}", flush=True)
    structured_mod._AXIS_MM_PRECISION_F32 = HIGH

    # bf16 patch storage (HIGHEST precision on bf16 operands = 1 pass)
    try:
        run("bf16-patch", dtype="bfloat16")
    except Exception as e:
        print(f"bf16-patch FAILED: {type(e).__name__}: {e}", flush=True)

    print({k: round(v[0], 3) for k, v in results.items()}, flush=True)


if __name__ == "__main__":
    main()
