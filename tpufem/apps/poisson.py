"""End-to-end Poisson solver application.

Reference analogue: ``poisson.cu`` / ``poisson_common.h`` (SURVEY.md §2,
§3.1): mesh → FE_Q(p) DoFs → constraints → MatrixFree reinit → host RHS →
device CG with diagonal preconditioner → L2 error vs manufactured solution,
with the same printed table (DoFs, setup/solve time, iterations, L2 error).

Run:  python -m tpufem.apps.poisson --dim 2 --degree 4 --refine 5
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import time
from typing import Callable, Optional

import jax.numpy as jnp
import numpy as np

from tpufem.fem.assemble import (
    assemble_rhs,
    integrate_difference,
    integrate_errors,
)
from tpufem.fem.dof_handler import DoFHandler
from tpufem.fem.mesh import Mesh
from tpufem.operators.laplace import LaplaceOperator
from tpufem.ops.matrix_free import MatrixFree
from tpufem.solvers.cg import cg_solve
from tpufem.utils.config import FemConfig


def _ensure_dtype(dtype: str) -> None:
    """Requesting f64 without x64 enabled silently truncates every device
    array to f32 (observed: warning spam + stagnating CG) — enable it."""
    if dtype == "float64":
        import jax

        if not jax.config.jax_enable_x64:
            jax.config.update("jax_enable_x64", True)


def default_solution(dim: int):
    """Manufactured solution u = prod sin(pi x_a); f = dim pi^2 u."""
    u = lambda x: np.prod(np.sin(np.pi * x), axis=1)
    f = lambda x: dim * np.pi**2 * np.prod(np.sin(np.pi * x), axis=1)
    return u, f


def default_gradient(dim: int):
    """grad of the default manufactured solution, for H1 error output."""

    def g(x):
        out = np.empty_like(x)
        for a in range(dim):
            cols = [np.sin(np.pi * x[:, b]) for b in range(dim)]
            cols[a] = np.cos(np.pi * x[:, a])
            out[:, a] = np.pi * np.prod(cols, axis=0)
        return out

    return g


def dirichlet_setup(op: LaplaceOperator, b: np.ndarray,
                    boundary_values: np.ndarray):
    """Turn an unconstrained RHS into the constrained system's RHS + x0.

    Standard inhomogeneous-Dirichlet handling with a symmetric operator
    (the reference's constraint save/zero/restore makes A identity on
    constrained DoFs — SURVEY.md §3.4):
      x0 = g on the boundary (hanging DoFs interpolated from it);
      b' = mask * C^T (b - A_raw x0) + (1-mask) x0.
    CG on the constrained operator then keeps constrained values exact.
    """
    mf = op.mf
    mask = mf.interior_mask
    g = jnp.asarray(boundary_values, mask.dtype)
    x0 = mf.distribute((1.0 - mask) * g)
    b_dev = jnp.asarray(b, mask.dtype)
    b1 = mf.distribute_transpose(b_dev - op.vmult_raw(x0))
    b_con = mask * b1 + (1.0 - mask) * x0
    return b_con, x0


@dataclasses.dataclass
class PoissonResult:
    n_dofs: int
    n_cells: int
    iterations: int
    l2_error: float
    residual: float
    setup_time: float
    solve_time: float
    solution: np.ndarray
    dofs: object = None  # DoFHandler (for output writers)
    h1_error: float | None = None  # H1 seminorm, with --h1
    eta: float | None = None  # global Kelly estimate (AMR loop)


def solve_poisson(
    dim: int = 2,
    degree: int = 1,
    refine: int = 3,
    scatter: str = "auto",
    dtype: str = "float64",
    coefficient: Optional[Callable] = None,
    adaptive_steps: int = 0,
    rtol: float | None = None,
    exact=None,
    rhs=None,
    use_pallas: bool = False,
    warm: bool = False,
    shards=None,
    precond: str = "jacobi",
    h1: bool = False,
    mesh_kind: str = "cube",
    mesh: Mesh | None = None,
) -> PoissonResult:
    _ensure_dtype(dtype)
    if h1 and exact is not None:
        # validate BEFORE the solve: the error block would only raise
        # after minutes of solving on a large mesh
        raise ValueError("--h1 supports the default manufactured "
                         "solution only (no gradient for a custom exact)")
    if shards is not None and scatter not in ("auto", "boxes"):
        raise ValueError("--shards runs the distributed box tier; use "
                         "scatter auto/boxes")
    if shards is not None:
        scatter = "boxes"
    if rtol is None:
        # f32 CG cannot reach f64-grade residuals; pick a reachable default
        rtol = 1e-10 if dtype == "float64" else 1e-6
    t0 = time.perf_counter()
    if mesh is not None:
        pass  # caller-provided mesh (the AMR loop); refine/kind ignored
    elif mesh_kind == "shell":
        # GridGenerator::hyper_shell analogue (SURVEY.md §3.1) — the
        # curved/general-metric path; the default manufactured solution
        # is valid on any domain (physical coords, inhomogeneous
        # Dirichlet from its trace)
        mesh = (Mesh.hyper_shell_2d(refine) if dim == 2
                else Mesh.hyper_shell_3d(refine))
    elif mesh_kind == "cube":
        mesh = Mesh.hyper_cube(dim, refine)
    else:
        raise ValueError(f"mesh_kind must be 'cube' or 'shell', got "
                         f"{mesh_kind!r}")
    for _ in range(adaptive_steps):
        centers = (mesh.origins + mesh.sizes[:, None] * 0.5) / mesh.U
        flags = np.linalg.norm(centers - 0.5, axis=1) < 0.3
        mesh = mesh.refine(flags)
    dofs = DoFHandler(mesh, degree)
    cfg = FemConfig(dim=dim, degree=degree, scatter=scatter, dtype=dtype,
                    use_pallas=use_pallas)
    constraints = None
    if not mesh.is_uniform:
        from tpufem.fem.constraints import make_hanging_node_constraints

        constraints = make_hanging_node_constraints(dofs)
    if scatter == "boxes":
        return _solve_poisson_boxes(
            mesh, dofs, constraints, coefficient, dtype, rtol,
            exact, rhs, warm, t0, shards, precond, h1=h1,
        )
    mf = MatrixFree.build(mesh, dofs, cfg, coefficient=coefficient,
                          constraints=constraints)
    op = LaplaceOperator(mf)
    diag = op.diagonal()
    u_exact, f = default_solution(dim)
    if exact is not None:
        u_exact = exact
    if rhs is not None:
        f = rhs
    b = assemble_rhs(dofs, f)
    g = np.zeros(dofs.n_dofs)
    bv = dofs.boundary_mask
    if np.any(bv):
        g[bv] = u_exact(dofs.dof_coords[bv])
    b_con, x0 = dirichlet_setup(op, b, g)
    setup_time = time.perf_counter() - t0

    import jax

    # jit once: re-calling must not re-trace (a 5-level V-cycle/while_loop
    # trace alone costs tens of seconds on a small host).  All device
    # arrays (operator metric/index data, the Jacobi diagonal) enter the
    # program as ARGUMENTS — closure-captured device constants D2H-hang
    # at lowering on this platform (see MatrixFree.device_args).
    inv_diag = 1.0 / diag
    if precond in ("gmg", "gmg-bf16"):
        raise ValueError(
            "--precond gmg pairs with the box tier (--scatter boxes / "
            "adaptive meshes) or the poisson_mg app for uniform meshes")
    if precond == "chebyshev":
        from functools import partial

        from tpufem.solvers.chebyshev import (
            ChebyshevParams,
            chebyshev_smooth,
            make_chebyshev_params,
        )

        cp = make_chebyshev_params(
            op.vmult_with, diag, dofs.n_dofs, dp=op.device_args)

        def _mk_minv(dp_, inv_d_, th_, dl_):
            cpl = ChebyshevParams(th_, dl_, cp.degree)
            return lambda r: chebyshev_smooth(
                lambda v: op.vmult_with(dp_, v), inv_d_, cpl, r)

        solve = jax.jit(lambda dp_, inv_d_, b_, x0_, th_, dl_: cg_solve(
            lambda v: op.vmult_with(dp_, v), b_,
            M_inv=_mk_minv(dp_, inv_d_, th_, dl_), x0=x0_, rtol=rtol))
        solve = partial(solve, th_=cp.theta, dl_=cp.delta)
    else:
        solve = jax.jit(lambda dp_, inv_d_, b_, x0_: cg_solve(
            lambda v: op.vmult_with(dp_, v), b_,
            M_inv=lambda r: inv_d_ * r, x0=x0_, rtol=rtol))
    if warm:
        # compile + run once so solve_time reports the steady state
        jax.block_until_ready(solve(op.device_args, inv_diag, b_con, x0).x)
    t1 = time.perf_counter()
    res = solve(op.device_args, inv_diag, b_con, x0)
    jax.block_until_ready(res.x)
    x = np.asarray(mf.distribute(res.x))
    iters = int(res.iterations)
    solve_time = time.perf_counter() - t1
    if not bool(res.converged):
        import sys

        print(
            f"WARNING: CG did not converge in {iters} iterations "
            f"(residual {float(res.residual):.3e}); best iterate returned",
            file=sys.stderr,
        )

    h1_err = None
    if h1:  # custom-exact combination rejected up-front in solve_poisson
        err, h1_err = integrate_errors(
            dofs, x.astype(np.float64), u_exact,
            default_gradient(mesh.dim))
    else:
        err = integrate_difference(dofs, x.astype(np.float64), u_exact)
    return PoissonResult(
        n_dofs=dofs.n_dofs,
        n_cells=mesh.n_cells,
        iterations=iters,
        l2_error=err,
        residual=float(res.residual),
        setup_time=setup_time,
        solve_time=solve_time,
        solution=x,
        dofs=dofs,
        h1_error=h1_err,
    )


def _solve_poisson_boxes(mesh, dofs, constraints, coefficient, dtype,
                         rtol, exact, rhs, warm, t0, shards=None,
                         precond="jacobi", h1=False):
    """Poisson solve on the box-structured adaptive tier: the whole CG
    runs on the patchwork vector (tpufem.ops.boxes) — the fast TPU path
    for adaptive meshes (BASELINE config 4).  With ``shards`` (sz or
    (sz, sy)) the solve runs distributed over a device mesh
    (tpufem.parallel.boxes), the multi-GPU poisson analogue
    (SURVEY.md §3.6)."""
    import jax

    from tpufem.ops.boxes import BoxLaplaceOperator

    op = BoxLaplaceOperator(mesh, dofs, constraints=constraints,
                            coefficient=coefficient, dtype=dtype)
    u_exact, f = default_solution(mesh.dim)
    if exact is not None:
        u_exact = exact
    if rhs is not None:
        f = rhs
    b = assemble_rhs(dofs, f)
    g = np.zeros(dofs.n_dofs)
    bv = dofs.boundary_mask
    if np.any(bv):
        g[bv] = u_exact(dofs.dof_coords[bv])
    # dirichlet_setup algebra, in patch space
    m = op.interior_mask
    g_p = op.to_patch(g)
    x0 = op.distribute((1.0 - m) * g_p, homogeneous=False)
    b1 = op.distribute_transpose(op.to_patch(b) - op.vmult_raw(x0))
    b_con = m * b1 + (1.0 - m) * x0
    diag = op.diagonal()
    setup_time = time.perf_counter() - t0

    # op.cg_solve threads every device array through the jit boundary as
    # an argument (closure-captured index constants are pathologically
    # slow on this platform — see ops/boxes.py)
    if shards is not None:
        from tpufem.parallel.boxes import DistributedBoxLaplace

        if np.isscalar(shards):
            shards = (int(shards), 1)
        dop = DistributedBoxLaplace(op, shards=tuple(shards))
        bl = dop.put_vector(np.asarray(b_con))
        x0l = dop.put_vector(np.asarray(x0))
        if precond == "gmg-bf16":
            raise ValueError("--precond gmg-bf16 is single-device; "
                             "use --precond gmg with --shards")
        if precond == "gmg":
            # distributed adaptive GMG: fine level sharded, coarser
            # levels replicated (parallel/box_multigrid.py)
            from tpufem.parallel.box_multigrid import (
                DistributedBoxMultigrid,
            )
            from tpufem.solvers.box_multigrid import BoxMultigrid

            mg = BoxMultigrid(mesh, dofs, constraints=constraints,
                              coefficient=coefficient, dtype=dtype,
                              fine_op=op, fine_diag=diag)
            dmg = DistributedBoxMultigrid(dop, mg)
            setup_time = time.perf_counter() - t0
            run = lambda: dmg.cg_solve(bl, x0=x0l, rtol=rtol)
        else:
            dl = jnp.asarray(dop.diagonal_local())
            run = lambda: dop.cg_solve(bl, dl, x0=x0l, rtol=rtol,
                                       precond=precond)
        if warm:
            jax.block_until_ready(run().x)
        t1 = time.perf_counter()
        res = run()
        jax.block_until_ready(res.x)
        solve_time = time.perf_counter() - t1
        res = res._replace(x=jnp.asarray(
            dop.from_local(np.asarray(res.x)), op.dt))
    elif precond in ("gmg", "gmg-bf16"):
        # adaptive GMG: global-coarsening V-cycle over forest levels
        # (solvers/box_multigrid.py) — the poisson_mg analogue for
        # adaptively refined meshes.  gmg-bf16 = mixed precision: the
        # V-cycle hierarchy (smoother applies) runs bf16 — the fast
        # adaptive tier — under the f32 outer CG (solve_op), with the
        # finest defects computed by the f32 operator (exact_defect).
        from tpufem.solvers.box_multigrid import BoxMultigrid

        if precond == "gmg-bf16":
            mg = BoxMultigrid(mesh, dofs, constraints=constraints,
                              coefficient=coefficient, dtype="bfloat16",
                              solve_op=op)
        else:
            mg = BoxMultigrid(mesh, dofs, constraints=constraints,
                              coefficient=coefficient, dtype=dtype,
                              fine_op=op, fine_diag=diag)
        setup_time = time.perf_counter() - t0
        if warm:
            jax.block_until_ready(
                mg.cg_solve(b_con, x0=x0, rtol=rtol).x)
        t1 = time.perf_counter()
        res = mg.cg_solve(b_con, x0=x0, rtol=rtol)
        jax.block_until_ready(res.x)
        solve_time = time.perf_counter() - t1
    else:
        if warm:
            jax.block_until_ready(op.cg_solve(
                b_con, diag, x0=x0, rtol=rtol, precond=precond).x)
        t1 = time.perf_counter()
        res = op.cg_solve(b_con, diag, x0=x0, rtol=rtol, precond=precond)
        jax.block_until_ready(res.x)
        solve_time = time.perf_counter() - t1
    if not bool(res.converged):
        import sys

        print(
            f"WARNING: CG did not converge in {int(res.iterations)} "
            f"iterations (residual {float(res.residual):.3e})",
            file=sys.stderr,
        )
    x = op.from_patch(op.distribute(res.x, homogeneous=False))
    h1_err = None
    if h1:  # custom-exact combination rejected up-front in solve_poisson
        err, h1_err = integrate_errors(
            dofs, x.astype(np.float64), u_exact,
            default_gradient(mesh.dim))
    else:
        err = integrate_difference(dofs, x.astype(np.float64), u_exact)
    return PoissonResult(
        n_dofs=dofs.n_dofs,
        n_cells=mesh.n_cells,
        iterations=int(res.iterations),
        l2_error=err,
        residual=float(res.residual),
        setup_time=setup_time,
        solve_time=solve_time,
        solution=x,
        dofs=dofs,
        h1_error=h1_err,
    )


def solve_poisson_amr(
    dim: int = 2,
    degree: int = 1,
    refine: int = 2,
    cycles: int = 5,
    fraction: float = 0.3,
    mesh_kind: str = "cube",
    exact=None,
    rhs=None,
    **kwargs,
):
    """Solve -> estimate -> mark -> refine AMR loop (deal.II step-6
    workflow; the reference repo only refines by a fixed geometric
    criterion, SURVEY.md §3.1 — this closes that loop with the Kelly
    indicator of ``tpufem.fem.estimator``).

    Runs ``cycles`` solves, refining the top ``fraction`` of cells by
    Kelly indicator between them.  Returns the list of PoissonResults
    (one per cycle) with ``result.eta`` set to the global estimator
    value sqrt(sum eta_K^2).  kwargs pass through to solve_poisson
    (scatter/precond/dtype/shards/...).
    """
    from tpufem.fem.estimator import kelly_estimate, mark_fixed_fraction

    if mesh_kind == "shell":
        mesh = (Mesh.hyper_shell_2d(refine) if dim == 2
                else Mesh.hyper_shell_3d(refine))
    else:
        mesh = Mesh.hyper_cube(dim, refine)
    results = []
    for cycle in range(cycles):
        r = solve_poisson(dim=dim, degree=degree, mesh=mesh,
                          exact=exact, rhs=rhs, **kwargs)
        eta = kelly_estimate(r.dofs, r.solution.astype(np.float64))
        r.eta = float(np.sqrt((eta**2).sum()))
        results.append(r)
        if cycle < cycles - 1:
            mesh = mesh.refine(mark_fixed_fraction(eta, fraction))
    return results


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--dim", type=int, default=2)
    ap.add_argument("--degree", type=int, default=1)
    ap.add_argument("--refine", type=int, default=3)
    ap.add_argument("--mesh", default="cube", choices=["cube", "shell"],
                    help="domain: unit hyper_cube, or a curved "
                         "annulus/spherical-shell wedge (the "
                         "GridGenerator::hyper_shell analogue)")
    ap.add_argument("--scatter", default="auto",
                    choices=["auto", "incidence", "colored", "structured",
                             "dense", "separable", "boxes"])
    ap.add_argument("--dtype", default="float64")
    ap.add_argument("--adaptive-steps", type=int, default=0)
    ap.add_argument("--amr", type=int, default=0, metavar="CYCLES",
                    help="solve->estimate->mark->refine loop: run CYCLES "
                         "solves, refining by Kelly indicator between "
                         "them (step-6 analogue)")
    ap.add_argument("--amr-fraction", type=float, default=0.3,
                    help="fraction of cells refined per AMR cycle")
    ap.add_argument("--shards", default=None,
                    help="distributed solve over a device mesh: "
                         "'4' (z slabs) or '2x4' (z x y, 3D) — the "
                         "multi-GPU poisson analogue; needs that many "
                         "JAX devices")
    ap.add_argument("--precond", default="jacobi",
                    choices=["jacobi", "chebyshev", "gmg", "gmg-bf16"],
                    help="CG preconditioner for the box tier "
                         "(chebyshev = deal.II PreconditionChebyshev "
                         "analogue; gmg = adaptive global-coarsening "
                         "multigrid V-cycle, also with --shards; "
                         "gmg-bf16 = the same V-cycle in bf16 under "
                         "the f32 CG — the fast mixed-precision tier)")
    ap.add_argument("--pallas", action="store_true")
    ap.add_argument("--h1", action="store_true",
                    help="also report the H1 seminorm error "
                         "(VectorTools H1_seminorm analogue)")
    ap.add_argument("--json", action="store_true",
                    help="emit a JSON metrics line (SURVEY.md §5 metrics)")
    ap.add_argument("--vtu", metavar="PATH",
                    help="write the solution as a VTU file (DataOut analogue)")
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (note: some TPU plugins "
                         "ignore JAX_PLATFORMS; this flag always works)")
    ap.add_argument("--warm", action="store_true",
                    help="run the solve twice and time the second "
                         "(steady-state benchmark; excludes compilation)")
    args = ap.parse_args(argv)
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    shards = None
    if args.shards:
        parts = [int(x) for x in str(args.shards).lower().split("x")]
        shards = (parts[0], 1) if len(parts) == 1 else tuple(parts[:2])
    if args.amr:
        rs = solve_poisson_amr(
            dim=args.dim, degree=args.degree, refine=args.refine,
            cycles=args.amr, fraction=args.amr_fraction,
            mesh_kind=args.mesh, scatter=args.scatter, dtype=args.dtype,
            use_pallas=args.pallas, shards=shards, precond=args.precond,
            h1=args.h1,
        )
        if args.json:
            for c, r in enumerate(rs):
                line = {"cycle": c, "n_cells": r.n_cells,
                        "n_dofs": r.n_dofs, "iterations": r.iterations,
                        "l2_error": r.l2_error, "eta": r.eta,
                        "solve_time": r.solve_time}
                if r.h1_error is not None:
                    line["h1_error"] = r.h1_error
                print(json.dumps(line))
        else:
            print(f"{'cycle':>5} {'cells':>9} {'dofs':>10} {'iters':>6} "
                  f"{'L2 error':>12} {'eta':>12}")
            for c, r in enumerate(rs):
                print(f"{c:>5} {r.n_cells:>9} {r.n_dofs:>10} "
                      f"{r.iterations:>6} {r.l2_error:>12.4e} "
                      f"{r.eta:>12.4e}")
        if args.vtu:
            from tpufem.utils.output import write_vtu

            write_vtu(args.vtu, rs[-1].dofs, {"u": rs[-1].solution})
        return None
    r = solve_poisson(
        dim=args.dim, degree=args.degree, refine=args.refine,
        scatter=args.scatter, dtype=args.dtype,
        adaptive_steps=args.adaptive_steps, use_pallas=args.pallas,
        warm=args.warm, shards=shards, precond=args.precond,
        h1=args.h1, mesh_kind=args.mesh,
    )
    if args.vtu:
        from tpufem.utils.output import write_vtu

        write_vtu(args.vtu, r.dofs, {"u": r.solution})
    if args.json:
        line = {
            "n_dofs": r.n_dofs, "n_cells": r.n_cells,
            "iterations": r.iterations, "l2_error": r.l2_error,
            "setup_time": r.setup_time, "solve_time": r.solve_time,
        }
        if r.h1_error is not None:
            line["h1_error"] = r.h1_error
        print(json.dumps(line))
    else:
        print(f"cells:      {r.n_cells}")
        print(f"dofs:       {r.n_dofs}")
        print(f"setup:      {r.setup_time:.3f} s")
        print(f"solve:      {r.solve_time:.3f} s   ({r.iterations} CG iters)")
        print(f"L2 error:   {r.l2_error:.6e}")
        if r.h1_error is not None:
            print(f"H1 error:   {r.h1_error:.6e}")
    return None  # console-script exit code


if __name__ == "__main__":
    main()
