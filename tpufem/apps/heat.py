"""Time-dependent heat equation with checkpoint/resume.

A capability demonstration beyond the reference's stationary solvers:
implicit-Euler time stepping of u_t = Δu + f using the matrix-free mass
and Laplace operators — each step solves (M + dt K) u^{n+1} = M u^n + dt b
with CG — plus periodic checkpointing and exact resume (SURVEY.md §5
"Checkpoint / resume": absent in the reference, added here).

Run:  python -m tpufem.apps.heat --cpu --dim 2 --degree 2 --refine 4 \\
          --steps 20 --checkpoint-every 10 --checkpoint ck.npz
Resume:  ... --resume ck.npz
"""

from __future__ import annotations

import argparse
import os

import jax
import jax.numpy as jnp
import numpy as np

from tpufem.fem.assemble import assemble_rhs, integrate_difference
from tpufem.fem.dof_handler import DoFHandler
from tpufem.fem.mesh import Mesh
from tpufem.operators.generic import helmholtz_operator, mass_operator
from tpufem.ops.matrix_free import MatrixFree
from tpufem.solvers.cg import cg_solve
from tpufem.utils.config import FemConfig
from tpufem.utils.output import load_checkpoint, save_checkpoint


def run_heat(
    dim=2, degree=2, refine=4, dt=1e-3, steps=20, dtype="float64",
    checkpoint=None, checkpoint_every=0, resume=None, rtol=None,
    shards=None, resident=False,
):
    """shards: run every step's mass apply and Helmholtz solve
    DISTRIBUTED over that many devices (GeneralDistributedOperator with
    the mass/Helmholtz quad-point functors); state stays sharded across
    steps, checkpoints are written/read in global numbering.

    resident: ride the tensor-product fast tier
    (``operators.tensor_product``): M and M + dt K factor exactly into
    sums of tensor products on the uniform grid, so every step's mass
    apply and Helmholtz Jacobi-CG run on the separable tier / the fused
    ResidentTerms Pallas kernel — flagship-class step throughput instead
    of the gather-based generic tier."""
    from tpufem.apps.poisson import _ensure_dtype

    _ensure_dtype(dtype)
    if rtol is None:
        rtol = 1e-10 if dtype == "float64" else 1e-6
    if resident and shards:
        raise ValueError("--resident is a single-device fast path; "
                         "combine with --shards is not supported")
    mesh = Mesh.hyper_cube(dim, refine)
    dofs = DoFHandler(mesh, degree)
    cfg = FemConfig(dim=dim, degree=degree, dtype=dtype,
                    scatter="incidence", use_pallas=resident)
    mf = MatrixFree.build(mesh, dofs, cfg)
    if not resident:
        M = mass_operator(mf)
        A = helmholtz_operator(mf, alpha=1.0, beta=dt)  # M + dt K
    mask = mf.interior_mask

    # exact solution of u_t = Δu with u0 = prod sin(pi x): decay rate
    # lam = dim * pi^2, zero Dirichlet
    u0_fn = lambda x: np.prod(np.sin(np.pi * x), axis=1)
    lam = dim * np.pi**2

    # run-config metadata saved with every checkpoint; resuming with a
    # mismatched config (even one with the same n_dofs) is an error, not
    # silently-wrong physics
    meta = dict(dim=dim, degree=degree, refine=refine, dt=dt, dtype=dtype)
    start = 0
    if resume:
        if not os.path.exists(resume):
            raise FileNotFoundError(f"--resume checkpoint not found: {resume}")
        z = load_checkpoint(resume)
        for k, v in meta.items():
            if k in z and str(z[k]) != str(v):
                raise ValueError(
                    f"checkpoint {resume} was written with {k}={z[k]}, "
                    f"resuming with {k}={v}"
                )
        u = jnp.asarray(z["u"], jnp.dtype(dtype))
        start = int(z["step"])
    else:
        # nodal interpolation of u0
        u = jnp.asarray(mask * u0_fn(dofs.dof_coords), jnp.dtype(dtype))

    if shards:
        from tpufem.parallel.general import (
            GeneralDistributedOperator,
            GeneralPartitioner,
        )

        part = GeneralPartitioner.build(mf, int(shards))
        A_d = GeneralDistributedOperator(
            part, quad_op=lambda vals, grads, ctx: (vals, dt * grads))
        M_d = GeneralDistributedOperator(
            part, quad_op=lambda vals, grads, ctx: (vals, None),
            needs_gradients=False)
        d_l = A_d.put_vector(np.ones(dofs.n_dofs))  # unpreconditioned
        u_l = A_d.put_vector(np.asarray(u))
        for n in range(start, steps):
            # u is masked, so the constrained apply's identity part is 0
            # and this equals mask * M.vmult_raw(u)
            rhs_l = M_d.vmult(u_l)
            res = A_d.cg_solve_local(rhs_l, d_l, x0_local=u_l, rtol=rtol)
            if not bool(res.converged):
                import sys

                print(
                    f"WARNING: step {n}: distributed CG did not converge "
                    f"(residual {float(res.residual):.3e})",
                    file=sys.stderr,
                )
            u_l = res.x
            if (checkpoint and checkpoint_every
                    and (n + 1) % checkpoint_every == 0):
                save_checkpoint(
                    checkpoint, u=part.to_global(np.asarray(u_l)),
                    step=np.int64(n + 1), **meta)
        u = jnp.asarray(part.to_global(np.asarray(u_l)),
                        jnp.dtype(dtype))
    elif resident:
        from tpufem.operators.tensor_product import (
            helmholtz_tensor_operator,
            mass_tensor_operator,
        )
        from tpufem.solvers.resident import resident_jacobi_cg

        A_t = helmholtz_tensor_operator(mf, alpha=1.0, beta=dt)
        M_t = mass_tensor_operator(mf)
        diag = A_t.diagonal()
        use_rk = A_t.resident is not None
        if not use_rk:  # tiling constraints unmet: XLA terms tier
            solve = jax.jit(lambda m, dg, rhs, x0: cg_solve(
                lambda v: A_t.vmult_with(m, v), rhs,
                M_inv=lambda r: r / dg, x0=x0, rtol=rtol))
        for n in range(start, steps):
            # u is masked, so the constrained mass apply equals
            # mask * (M u) — the step's right-hand side
            rhs = M_t.vmult(u)
            if use_rk:
                res = resident_jacobi_cg(A_t, rhs, diag=diag, rtol=rtol,
                                         x0=u)
            else:
                res = solve(mask, diag, rhs, u)
            if not bool(res.converged):
                import sys

                print(
                    f"WARNING: step {n}: CG did not converge "
                    f"(residual {float(res.residual):.3e})",
                    file=sys.stderr,
                )
            u = mask * res.x
            if (checkpoint and checkpoint_every
                    and (n + 1) % checkpoint_every == 0):
                save_checkpoint(checkpoint, u=np.asarray(u),
                                step=np.int64(n + 1), **meta)
    else:
        # device arrays as jit ARGUMENTS (platform rule: see
        # MatrixFree.device_args)
        solve = jax.jit(lambda dpa_, rhs, x0: cg_solve(
            lambda v: A.vmult_with(dpa_, v), rhs, x0=x0, rtol=rtol))

        for n in range(start, steps):
            rhs = mask * M.vmult_raw(u)
            res = solve(A.device_args, rhs, u)
            if not bool(res.converged):
                import sys

                print(
                    f"WARNING: step {n}: CG did not converge "
                    f"(residual {float(res.residual):.3e})",
                    file=sys.stderr,
                )
            u = mask * res.x
            if (checkpoint and checkpoint_every
                    and (n + 1) % checkpoint_every == 0):
                save_checkpoint(checkpoint, u=np.asarray(u),
                                step=np.int64(n + 1), **meta)
    t_end = steps * dt
    exact = lambda x: np.exp(-lam * t_end) * u0_fn(x)
    err = integrate_difference(dofs, np.asarray(u, np.float64), exact)
    return {
        "n_dofs": dofs.n_dofs, "steps": steps, "t_end": t_end,
        "l2_error": err, "u": np.asarray(u),
    }


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--dim", type=int, default=2)
    ap.add_argument("--degree", type=int, default=2)
    ap.add_argument("--refine", type=int, default=4)
    ap.add_argument("--dt", type=float, default=1e-3)
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--dtype", default="float64")
    ap.add_argument("--checkpoint", default=None)
    ap.add_argument("--checkpoint-every", type=int, default=0)
    ap.add_argument("--resume", default=None)
    ap.add_argument("--shards", type=int, default=None,
                    help="distribute every step (mass apply + Helmholtz "
                         "CG) over this many devices")
    ap.add_argument("--resident", action="store_true",
                    help="tensor-product fast tier: every step's mass "
                         "apply + Helmholtz CG ride the separable tier / "
                         "fused ResidentTerms kernel")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args(argv)
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    r = run_heat(
        dim=args.dim, degree=args.degree, refine=args.refine, dt=args.dt,
        steps=args.steps, dtype=args.dtype, checkpoint=args.checkpoint,
        checkpoint_every=args.checkpoint_every, resume=args.resume,
        shards=args.shards, resident=args.resident,
    )
    print(f"dofs: {r['n_dofs']}  steps: {r['steps']}  t_end: {r['t_end']}")
    print(f"L2 error vs analytic decay: {r['l2_error']:.6e}")


if __name__ == "__main__":
    main()
