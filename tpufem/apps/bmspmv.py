"""Assembled-SpMV benchmark: the baseline matrix-free is compared against.

Reference analogue: ``bmspmv.cu`` (SURVEY.md §2): assemble the sparse
matrix, time N repeated SpMVs per (degree, refinement), report s/apply and
DoF/s — the protocol ``bmop.cu`` uses for the matrix-free path (BASELINE
config 3: "matrix-free wins for p >= 2, growing with p").

TPU-native baseline: padded-ELL SpMV (`tpufem.ops.sparse.EllMatrix`) —
fixed row width K, one dense gather + row-wise reduction, the honest
competitor on a machine without a cuSPARSE analogue.  A CSR cross-check
(`EllMatrix.from_csr` round-trip vs scipy) runs once per config so the
benchmark doubles as the independent assembled-operator oracle the
reference uses it for (SURVEY.md §4.3).

Run:  python -m tpufem.apps.bmspmv --dim 3 --degrees 1 2 3 4 --refine 4
"""

from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp
import numpy as np

from tpufem.fem.assemble import assemble_laplace
from tpufem.fem.dof_handler import DoFHandler
from tpufem.fem.mesh import Mesh
from tpufem.ops.sparse import EllMatrix
from tpufem.utils.metrics import emit
from tpufem.utils.timer import time_fn


def bench_spmv(dim, p, refine, dtype, reps, check=True):
    mesh = Mesh.hyper_cube(dim, refine)
    dofs = DoFHandler(mesh, p)
    K = assemble_laplace(dofs)
    A = EllMatrix.from_csr(K, jnp.dtype(dtype))
    mv = A.matvec  # jitted internally, arrays as args
    x = jnp.ones(dofs.n_dofs, jnp.dtype(dtype))
    rec = {
        "bench": "bmspmv",
        "dim": dim, "degree": p, "refine": refine,
        "n_dofs": dofs.n_dofs, "nnz": int(K.nnz),
        "row_width": int(A.indices.shape[1]),
        "bytes_per_dof": round(8.0 * K.nnz / dofs.n_dofs, 1),
        "dtype": dtype,
    }
    if check:  # assembled-oracle cross-check (SURVEY.md §4.3)
        rng = np.random.default_rng(0)
        v = rng.standard_normal(dofs.n_dofs)
        ref = K @ v
        got = np.asarray(mv(jnp.asarray(v, jnp.dtype(dtype))))
        rel = np.linalg.norm(got - ref) / np.linalg.norm(ref)
        tol = 1e-12 if jnp.dtype(dtype).itemsize >= 8 else 2e-5
        if rel > tol:
            raise AssertionError(
                f"ELL SpMV vs scipy CSR rel err {rel:.2e} > {tol}"
            )
        rec["csr_cross_check_rel_err"] = float(rel)
    dt = time_fn(mv, x, reps=reps)
    rec["s_per_apply"] = dt
    rec["gdofs_per_s"] = dofs.n_dofs / dt / 1e9
    return rec


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--dim", type=int, default=3)
    ap.add_argument("--degrees", type=int, nargs="+", default=[1, 2, 3, 4])
    ap.add_argument("--refine", type=int, default=4)
    ap.add_argument("--dtype", default="float32")
    ap.add_argument("--reps", type=int, default=20)
    ap.add_argument("--no-check", action="store_true",
                    help="skip the scipy-CSR cross-check")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args(argv)
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    if jnp.dtype(args.dtype).itemsize >= 8:
        jax.config.update("jax_enable_x64", True)
    for p in args.degrees:
        emit(bench_spmv(args.dim, p, args.refine, args.dtype, args.reps,
                        check=not args.no_check))


if __name__ == "__main__":
    main()
