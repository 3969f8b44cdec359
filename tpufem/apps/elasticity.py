"""Elasticity app: vector-valued matrix-free solve (deal.II step-8
analogue; SURVEY.md §2 "FEEvaluation API" — the n_components contract the
reference's scalar CUDA port never grew).

Solves -div sigma(u) = f, sigma = 2 mu eps(u) + lam tr(eps(u)) I, on the
unit hyper_cube with homogeneous Dirichlet data and the manufactured
solution u_c = prod_a sin(pi x_a) for every component c; reports the
combined L2 error and solver statistics.

Preconditioners: jacobi | chebyshev | gmg (vector V-cycle,
solvers/vector_multigrid.py).  --shards N runs the distributed
multi-component operator (parallel/vector.py) on an N-device mesh.

Run:  python -m tpufem.apps.elasticity --cpu --dim 2 --degree 2 \\
          --refine 4 --precond gmg
"""

from __future__ import annotations

import argparse
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from tpufem.fem.assemble import assemble_rhs, integrate_difference
from tpufem.fem.dof_handler import DoFHandler
from tpufem.fem.mesh import Mesh
from tpufem.operators.vector import elasticity_operator
from tpufem.ops.matrix_free import MatrixFree
from tpufem.solvers.cg import cg_solve, make_jacobi
from tpufem.utils.config import FemConfig


def manufactured(dim, mu, lam):
    """u_c = g = prod_a sin(pi x_a); f_c = -(mu lap g
    + (mu + lam) sum_a d_c d_a g)."""

    def u_exact(pts):
        return np.prod(np.sin(np.pi * pts), axis=1)

    def f_component(c, pts):
        s = np.sin(np.pi * pts)
        co = np.cos(np.pi * pts)
        g = np.prod(s, axis=1)
        lap = -dim * np.pi**2 * g
        dcd = np.zeros(len(pts))
        for a in range(dim):
            if a == c:
                dcd += -np.pi**2 * g
            else:
                cols = s.copy()
                cols[:, a] = co[:, a]
                cols[:, c] = co[:, c]
                dcd += np.pi**2 * np.prod(cols, axis=1)
        return -(mu * lap + (mu + lam) * dcd)

    return u_exact, f_component


def _fdot(a, b):
    return jnp.vdot(a, b, precision=jax.lax.Precision.HIGHEST)


def run_elasticity(dim=2, degree=2, refine=4, precond="jacobi",
                   mu=1.0, lam=1.0, rtol=1e-10, dtype="float64",
                   shards=0, fast=False, use_pallas=False):
    from tpufem.apps.poisson import _ensure_dtype

    _ensure_dtype(dtype)
    u_exact, f_component = manufactured(dim, mu, lam)

    t0 = time.perf_counter()
    mg = None
    if precond == "gmg":
        from tpufem.solvers.vector_multigrid import VectorMultigrid

        mg = VectorMultigrid(dim, degree, finest_refine=refine,
                             coarsest_refine=min(1, refine), dtype=dtype,
                             mu=mu, lam=lam)
        mf = mg.fine.mf
        dofs = mf.dofs
        op = mg.fine.op
    else:
        mesh = Mesh.hyper_cube(dim, refine)
        dofs = DoFHandler(mesh, degree)
        mf = MatrixFree.build(
            mesh, dofs,
            FemConfig(dim, degree, scatter="incidence", dtype=dtype))
        if fast:
            # exact block tensor-product factorization (the separable
            # fast tier — ~145x the generic quadrature path on chip)
            from tpufem.operators.tensor_product import (
                SeparableElasticityOperator,
            )

            op = SeparableElasticityOperator(mf, mu=mu, lam=lam,
                                             use_pallas=use_pallas)
        else:
            op = elasticity_operator(mf, mu=mu, lam=lam)

    mask = np.asarray(mf.interior_mask, np.float64)
    b = np.stack([mask * assemble_rhs(dofs, lambda p, c=c: f_component(c, p))
                  for c in range(dim)])
    diag = op.diagonal()
    setup = time.perf_counter() - t0

    t0 = time.perf_counter()
    if shards:
        from tpufem.parallel.general import GeneralPartitioner
        from tpufem.parallel.vector import distributed_elasticity_operator

        part = GeneralPartitioner.build(mf, shards)
        dop = distributed_elasticity_operator(part, mu=mu, lam=lam)
        pr = "chebyshev" if precond == "chebyshev" else "jacobi"
        x, iters, resid = dop.cg_solve(b, np.asarray(diag), rtol=rtol,
                                       maxiter=10000, precond=pr)
        converged = resid <= rtol * float(np.linalg.norm(b))
        tier = f"distributed-{pr} ({shards} shards)"
    else:
        bj = jnp.asarray(b, jnp.dtype(dtype))
        # the fast tier's vmult_with takes the scalar interior MASK as
        # its threaded argument; the generic tier takes its device-arg
        # pytree (both: no device closure constants)
        op_arg = mf.interior_mask if fast else op.device_args
        apply_v = lambda v: op.vmult_with(op_arg, v)
        if precond == "gmg":
            M_inv = lambda r: mg.preconditioner_with(mg.device_args, r)
        elif precond == "chebyshev":
            from tpufem.solvers.chebyshev import (
                chebyshev_smooth,
                make_chebyshev_params,
            )

            cheb = make_chebyshev_params(
                lambda a_, xf: op.vmult_with(a_, xf.reshape(dim, -1)
                                             ).reshape(-1),
                jnp.asarray(diag).reshape(-1), dim * dofs.n_dofs,
                dp=op_arg)
            inv_diag = 1.0 / diag

            def M_inv(r):
                return chebyshev_smooth(apply_v, inv_diag, cheb, r)
        else:
            M_inv = make_jacobi(jnp.asarray(diag))
        res = cg_solve(apply_v, bj,
                       M_inv=M_inv, rtol=rtol, maxiter=10000, dot=_fdot)
        x = np.asarray(res.x)
        iters = int(res.iterations)
        resid = float(res.residual)
        converged = bool(res.converged)
        tier = precond + (" (separable fast tier)" if fast else "")
    solve = time.perf_counter() - t0

    err2 = sum(
        integrate_difference(dofs, np.asarray(x[c]), u_exact) ** 2
        for c in range(dim))
    return {
        "n_dofs": dofs.n_dofs,
        "n_components": dim,
        "n_cells": mf.n_cells,
        "precond": tier,
        "iterations": iters,
        "residual": float(resid),
        "converged": bool(converged),
        "setup_s": setup,
        "solve_s": solve,
        "l2_error": float(np.sqrt(err2)),
    }, x


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--dim", type=int, default=2)
    ap.add_argument("--degree", type=int, default=2)
    ap.add_argument("--refine", type=int, default=4)
    ap.add_argument("--precond", default="jacobi",
                    choices=["jacobi", "chebyshev", "gmg"])
    ap.add_argument("--mu", type=float, default=1.0)
    ap.add_argument("--lam", type=float, default=1.0)
    ap.add_argument("--rtol", type=float, default=1e-10)
    ap.add_argument("--dtype", default="float64")
    ap.add_argument("--shards", type=int, default=0)
    ap.add_argument("--fast", action="store_true",
                    help="separable block fast tier (uniform grids; "
                         "Pallas kernels on TPU)")
    ap.add_argument("--json", action="store_true")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args(argv)
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    out, _ = run_elasticity(
        dim=args.dim, degree=args.degree, refine=args.refine,
        precond=args.precond, mu=args.mu, lam=args.lam, rtol=args.rtol,
        dtype=args.dtype, shards=args.shards, fast=args.fast,
        use_pallas=not args.cpu and args.fast)
    if args.json:
        print(json.dumps(out))
    else:
        for k, v in out.items():
            print(f"{k:>14}: {v}")


if __name__ == "__main__":
    main()
