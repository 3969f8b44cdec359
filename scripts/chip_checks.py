#!/usr/bin/env python
"""On-chip determinism and accuracy checks (run on the real TPU).

BASELINE.json acceptance line: "bitwise-stable CG iteration counts".
The CG design (fixed-reduction-order dots, whole solve in one
lax.while_loop — tpufem/solvers/cg.py) makes runs deterministic; this
script PROVES it on the chip in f32:

  - two runs of the same Jacobi-CG solve must report the SAME iteration
    count and BITWISE-identical solutions;
  - same for GMG-CG;
  - the per-tier apply accuracy classes of docs/ROOFLINE.md are
    spot-checked against the structured tier.

Exit code 0 = all checks passed; prints one JSON line per check AND
writes the full record list to ``--out`` (default /tmp/chip_checks.json)
for machine diffing against the committed golden
(tests/goldens/chip_checks_golden.json) via
``scripts/check_chip_goldens.py`` — so on-chip Mosaic/accuracy
regressions fail loudly in the round validation instead of relying on
hand-transcribed numbers (VERDICT r3 weak item 6).
"""

import argparse
import json
import os
import time

import jax
import jax.numpy as jnp

from tpufem.utils.cache import enable_persistent_cache

enable_persistent_cache()  # repo-persistent TPU cache (utils/cache.py)
import numpy as np

RECORDS = []


def record(rec):
    RECORDS.append(rec)
    print(json.dumps(rec), flush=True)


def main(out_path=None):
    from tpufem.fem.dof_handler import DoFHandler
    from tpufem.fem.mesh import Mesh
    from tpufem.operators.laplace import LaplaceOperator
    from tpufem.ops.matrix_free import MatrixFree
    from tpufem.solvers.cg import cg_solve, make_jacobi
    from tpufem.solvers.multigrid import GeometricMultigrid
    from tpufem.utils.config import FemConfig

    on_tpu = jax.devices()[0].platform not in ("cpu",)
    refine = 5 if on_tpu else 3
    dim, p = 3, 4
    mesh = Mesh.hyper_cube(dim, refine)
    dofs = DoFHandler(mesh, p)
    mf = MatrixFree.build(
        mesh, dofs,
        FemConfig(dim=dim, degree=p, dtype="float32",
                  scatter="separable" if on_tpu else "structured",
                  use_pallas=on_tpu),
    )
    op = LaplaceOperator(mf)
    diag = op.diagonal()
    rng = np.random.default_rng(42)
    mask = np.asarray(mf.interior_mask, np.float64)
    b = jnp.asarray(mask * rng.standard_normal(dofs.n_dofs), jnp.float32)

    inv_diag = 1.0 / diag
    solve = jax.jit(lambda dp_, id_, b_: cg_solve(
        lambda v: op.vmult_with(dp_, v), b_,
        M_inv=lambda r: id_ * r, rtol=1e-5))
    sargs = (op.device_args, inv_diag)
    r1 = solve(*sargs, b)
    jax.block_until_ready(r1.x)
    r2 = solve(*sargs, b)
    jax.block_until_ready(r2.x)
    bitwise = bool(jnp.all(r1.x == r2.x))
    same_iters = int(r1.iterations) == int(r2.iterations)
    record({
        "check": "jacobi_cg_run_to_run_determinism",
        "platform": jax.devices()[0].platform,
        "n_dofs": dofs.n_dofs, "dtype": "float32",
        "iterations": [int(r1.iterations), int(r2.iterations)],
        "bitwise_identical_solutions": bitwise,
        "pass": bool(bitwise and same_iters),
    })
    assert bitwise and same_iters

    gmg = GeometricMultigrid(dim, p, refine, coarsest_refine=1,
                             dtype="float32", use_pallas=on_tpu)
    solve_mg = jax.jit(lambda dp_, gdp_, b_: cg_solve(
        lambda v: gmg.fine.op.vmult_with(dp_, v), b_,
        M_inv=lambda r: gmg.preconditioner_with(gdp_, r), rtol=1e-5))
    margs = (gmg.fine.op.device_args, gmg.device_args)
    m1 = solve_mg(*margs, b)
    jax.block_until_ready(m1.x)
    m2 = solve_mg(*margs, b)
    jax.block_until_ready(m2.x)
    bitwise_mg = bool(jnp.all(m1.x == m2.x))
    same_mg = int(m1.iterations) == int(m2.iterations)
    record({
        "check": "gmg_cg_run_to_run_determinism",
        "n_dofs": dofs.n_dofs,
        "iterations": [int(m1.iterations), int(m2.iterations)],
        "bitwise_identical_solutions": bitwise_mg,
        "pass": bool(bitwise_mg and same_mg),
    })
    assert bitwise_mg and same_mg

    # per-tier apply accuracy spot check vs the structured tier
    mf_s = MatrixFree.build(mesh, dofs, FemConfig(
        dim=dim, degree=p, dtype="float32", scatter="structured"))
    y_ref = np.asarray(LaplaceOperator(mf_s).vmult_raw(b))
    y = np.asarray(op.vmult_raw(b))
    rel = float(np.linalg.norm(y - y_ref) / np.linalg.norm(y_ref))
    record({
        "check": "fused_kernel_accuracy_vs_structured",
        "rel_err": rel, "pass": rel < 1e-6,
    })
    assert rel < 1e-6

    # ---- round-4 solver family on the golden record (VERDICT r4 item
    # 2c): GMRES and Newton-CG run-to-run determinism.  All Krylov /
    # Newton scalar decisions derive from fixed-reduction-order dots, so
    # two runs of the same jitted program must take identical paths.
    from tpufem.operators.generic import (
        NonlinearOperator,
        convection_diffusion_operator,
    )
    from tpufem.solvers.gmres import gmres_solve

    mesh2 = Mesh.hyper_cube(2, 4)
    dofs2 = DoFHandler(mesh2, 2)
    mf2 = MatrixFree.build(mesh2, dofs2, FemConfig(
        dim=2, degree=2, dtype="float32", scatter="incidence"))
    cd = convection_diffusion_operator(
        mf2,
        lambda pts: np.tile(np.array([0.7, -0.4]), (pts.shape[0], 1)),
        nu=0.05)
    b2 = jnp.asarray(
        np.asarray(mf2.interior_mask, np.float64)
        * rng.standard_normal(dofs2.n_dofs), jnp.float32)
    gsolve = jax.jit(lambda dp_, b_: gmres_solve(
        lambda v: cd.vmult_with(dp_, v), b_, rtol=1e-5, restart=30))
    g1 = gsolve(cd.device_args, b2)
    jax.block_until_ready(g1.x)
    g2 = gsolve(cd.device_args, b2)
    jax.block_until_ready(g2.x)
    bitwise_g = bool(jnp.all(g1.x == g2.x))
    same_g = int(g1.iterations) == int(g2.iterations)
    record({
        "check": "gmres_run_to_run_determinism",
        "n_dofs": dofs2.n_dofs, "dtype": "float32",
        "iterations": [int(g1.iterations), int(g2.iterations)],
        "bitwise_identical_solutions": bitwise_g,
        "pass": bool(bitwise_g and same_g),
    })
    assert bitwise_g and same_g

    def quasi_qop(vals, grads, ctx):
        return None, (1.0 + vals**2)[:, None, :] * grads

    nop = NonlinearOperator(mf2, quasi_qop)
    n1 = nop.solve(b2, rtol=1e-4)
    jax.block_until_ready(n1.x)
    n2 = nop.solve(b2, rtol=1e-4)
    jax.block_until_ready(n2.x)
    bitwise_n = bool(jnp.all(n1.x == n2.x))
    same_n = (int(n1.iterations) == int(n2.iterations)
              and int(n1.linear_iterations) == int(n2.linear_iterations))
    record({
        "check": "newton_cg_run_to_run_determinism",
        "n_dofs": dofs2.n_dofs, "dtype": "float32",
        "newton_iterations": [int(n1.iterations), int(n2.iterations)],
        "linear_iterations": [int(n1.linear_iterations),
                              int(n2.linear_iterations)],
        "converged": bool(n1.converged),
        "bitwise_identical_solutions": bitwise_n,
        "pass": bool(bitwise_n and same_n and bool(n1.converged)),
    })
    assert bitwise_n and same_n and bool(n1.converged)

    # ResidentTerms fused-kernel accuracy class (the round-4 kernels had
    # no golden record — VERDICT r4 weak item 7): Helmholtz terms apply
    # vs the f64 separable oracle on the same 1D factors.
    if on_tpu:
        from functools import reduce

        from tpufem.operators.tensor_product import (
            helmholtz_separable_terms,
        )
        from tpufem.ops.pallas_separable import ResidentTerms

        n_ax = 1 << 4
        npts_r = n_ax * p + 1
        h3 = np.full(3, 1.0 / n_ax)
        terms = helmholtz_separable_terms(p, 3, p + 1, n_ax, h3, 1.0, 1.0)
        rk = ResidentTerms(npts_r, p, terms, "float32", mode="f32")
        xr = rng.standard_normal(npts_r**3)
        yk = np.asarray(rk.unpad(rk.raw(rk.pad(
            jnp.asarray(xr, jnp.float32)))), np.float64)
        t3 = xr.reshape((npts_r,) * 3)
        y_ref = np.zeros_like(t3)
        for t in terms:
            m = t3
            # tensor index order is (z, y, x): axis a pairs with t[2-a]
            for a in range(3):
                tm = np.asarray(t[2 - a], np.float64)
                m = np.moveaxis(np.tensordot(tm, m, axes=(1, a)), 0, a)
            y_ref += m
        rel_r = float(np.linalg.norm(yk - y_ref.reshape(-1))
                      / np.linalg.norm(y_ref))
        record({
            "check": "resident_terms_accuracy_vs_f64_oracle",
            "n_dofs": npts_r**3, "rel_err": rel_r, "pass": rel_r < 5e-6,
        })
        assert rel_r < 5e-6
    if out_path:
        with open(out_path, "w") as f:
            json.dump({"platform": jax.devices()[0].platform,
                       "records": RECORDS}, f, indent=1)
        print(f"chip_checks: wrote {out_path}")
    print("chip_checks: ALL PASSED")


if __name__ == "__main__":
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--out", default="/tmp/chip_checks.json",
                    help="write the machine-diffable record artifact here")
    ap.add_argument("--cpu", action="store_true",
                    help="smoke the script logic on the CPU backend "
                         "(artifact then must NOT be diffed vs the "
                         "chip golden)")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    main(out_path=args.out)
