#!/usr/bin/env python
"""Headline benchmarks: 3D Poisson Q4 apply (GDoF/s) and whole CG solves.

The reference's ``bmop.cu`` protocol (SURVEY.md §2): time N repeated vmults,
report DoF/s.  BASELINE.json metric: "3D Poisson Q4 matrix-free apply GDoF/s
and CG solve time".  vs_baseline for the apply line is measured against the
literature anchor of ~1 GDoF/s for 3D high-order Laplace apply on V100-class
GPUs (BASELINE.md, approximate — no published reference numbers were
recoverable); solve lines carry no anchor (vs_baseline = value).

Prints one JSON line per metric; the LAST line is the headline apply.
Every apply tier is timed and reported (``tiers`` key) — a Pallas/Mosaic
failure is recorded in ``tier_errors``, never silently swallowed.  The
fused round-2 kernel has structured-class accuracy (~1e-7 rel), so it is
both the speed AND the solve tier; per-tier accuracy classes are tabled
in docs/ROOFLINE.md.
"""

import json
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_tpu")

import jax
import jax.numpy as jnp
import numpy as np


BASELINE_GDOFS = 1.0  # V100-class anchor, BASELINE.md (approximate)


def time_apply(fn, x, reps):
    """Median-of-reps apply time; fixed input each rep (the operator is
    unscaled with spectral radius >> 1, so feeding the output back would
    overflow f32 within ~50 reps and could mask a garbage-producing
    kernel)."""
    y = fn(x)
    y.block_until_ready()  # compile
    t0 = time.perf_counter()
    for _ in range(reps):
        y = fn(x)
    y.block_until_ready()
    dt = (time.perf_counter() - t0) / reps
    if not bool(jnp.isfinite(y).all()):
        raise FloatingPointError("apply produced non-finite output")
    return dt


def main():
    from tpufem.fem.dof_handler import DoFHandler
    from tpufem.fem.mesh import Mesh
    from tpufem.operators.laplace import LaplaceOperator
    from tpufem.ops.matrix_free import MatrixFree
    from tpufem.solvers.cg import cg_solve, make_jacobi
    from tpufem.utils.config import FemConfig

    on_tpu = jax.devices()[0].platform not in ("cpu",)
    refine = 6 if on_tpu else 3  # 64^3 cells / 17M dofs on the chip
    dtype = "float32"
    lines = []

    mesh = Mesh.hyper_cube(3, refine)
    dofs = DoFHandler(mesh, 4)
    x = jnp.ones(dofs.n_dofs, jnp.dtype(dtype))
    reps = 50 if on_tpu else 3

    # ---- apply benchmark: every tier, with attribution -----------------
    tier_specs = [("separable", False), ("structured", False)]
    if on_tpu:
        tier_specs.insert(0, ("separable", True))
    tiers, tier_errors = {}, {}
    for scheme, pallas in tier_specs:
        name = scheme + ("+pallas" if pallas else "")
        try:
            mf = MatrixFree.build(
                mesh, dofs,
                FemConfig(dim=3, degree=4, dtype=dtype, scatter=scheme,
                          use_pallas=pallas),
            )
            op = LaplaceOperator(mf)
            dt = time_apply(op.vmult_raw, x, reps)
            tiers[name] = round(dofs.n_dofs / dt / 1e9, 4)
            del mf, op  # ~0.5-1 GB HBM per tier at 17M DoFs
        except Exception as e:  # record, never hide (a Mosaic regression
            # must be visible in the JSON, not demote the headline quietly)
            tier_errors[name] = f"{type(e).__name__}: {e}"[:300]
    # solver-resident tiers: halo'd layout in/out, zero pad/unpad — the
    # rate CG actually sustains (chainability proven in tests/test_pallas)
    residents = {}
    if on_tpu:
        from tpufem.ops.pallas_separable import ResidentSeparable
        from tpufem.ops.separable import global_1d_matrices

        n_ax = 1 << refine
        npts = n_ax * 4 + 1
        K1u, M1u = global_1d_matrices(4, n_ax, 5)
        h = 1.0 / n_ax
        Ks_np = [np.asarray(K1u / h)] * 3
        Ms_np = [np.asarray(M1u * h)] * 3
        for mode in ("f32", "bf16"):
            name = f"resident-{mode}+pallas"
            try:
                rk = ResidentSeparable(npts, 4, Ks_np, Ms_np, dtype,
                                       mode=mode)
                xr = rk.pad(x)
                dt = time_apply(rk._raw_jit, xr, reps)
                tiers[name] = round(dofs.n_dofs / dt / 1e9, 4)
                residents[mode] = rk
            except Exception as e:
                tier_errors[name] = f"{type(e).__name__}: {e}"[:300]

    if not tiers:
        raise RuntimeError(f"all apply tiers failed: {tier_errors}")
    best_tier = max(tiers, key=tiers.get)

    # ---- whole-solve benchmark (BASELINE metric "and CG solve time") ---
    # The round-2 fused kernel has structured-class accuracy (~1e-7 rel,
    # banded short reductions — see ops/pallas_separable.py), so it powers
    # the solve too; CPU falls back to the structured tier.
    solve_rtol = 1e-5
    solve_tier = "separable+pallas" if on_tpu else "structured"
    mf_s = MatrixFree.build(
        mesh, dofs,
        FemConfig(dim=3, degree=4, dtype=dtype,
                  scatter="separable" if on_tpu else "structured",
                  use_pallas=on_tpu),
    )
    op_s = LaplaceOperator(mf_s)
    diag = op_s.diagonal()
    rng = np.random.default_rng(7)
    mask = np.asarray(mf_s.interior_mask, np.float64)
    b = jnp.asarray(mask * rng.standard_normal(dofs.n_dofs),
                    jnp.dtype(dtype))
    solve = jax.jit(lambda b_: cg_solve(
        op_s.vmult, b_, M_inv=make_jacobi(diag), rtol=solve_rtol))
    jax.block_until_ready(solve(b).x)  # compile + warm
    t0 = time.perf_counter()
    res = solve(b)
    jax.block_until_ready(res.x)
    t_jac = time.perf_counter() - t0
    lines.append({
        "metric": "3d_q4_jacobi_cg_solve",
        "value": round(t_jac, 4), "unit": "s",
        "vs_baseline": round(t_jac, 4),
        "iterations": int(res.iterations),
        "converged": bool(res.converged),
        "residual": float(res.residual),
        "rtol": solve_rtol, "n_dofs": dofs.n_dofs, "tier": solve_tier,
    })

    # solver-resident Jacobi-CG: all CG vectors in the halo'd layout.
    # The operator's own f32-mode kernel is tried first (it compiles
    # inside composed programs even where the standalone raw jit crashes
    # the Mosaic helper); bf16 is the fallback.
    if on_tpu and (mf_s.resident is not None or residents):
        from tpufem.solvers.resident import resident_jacobi_cg

        candidates = {"f32": mf_s.resident, **residents}
        for mode in ("f32", "bf16"):
            if candidates.get(mode) is None:
                continue
            try:
                mf_s.resident = candidates[mode]
                resident_jacobi_cg(op_s, b, diag=diag,
                                   rtol=solve_rtol)  # compile + warm
                t0 = time.perf_counter()
                res_r = resident_jacobi_cg(op_s, b, diag=diag,
                                           rtol=solve_rtol)
                jax.block_until_ready(res_r.x)
                t_res = time.perf_counter() - t0
                lines.append({
                    "metric": "3d_q4_jacobi_cg_solve_resident",
                    "value": round(t_res, 4), "unit": "s",
                    "vs_baseline": round(t_res, 4),
                    "iterations": int(res_r.iterations),
                    "converged": bool(res_r.converged),
                    "residual": float(res_r.residual),
                    "rtol": solve_rtol, "n_dofs": dofs.n_dofs,
                    "tier": f"resident-{mode}+pallas",
                })
                break  # first (most accurate) working mode wins
            except Exception as e:
                lines.append({
                    "metric": "3d_q4_jacobi_cg_solve_resident",
                    "value": 0.0, "unit": "s", "vs_baseline": 0.0,
                    "tier": f"resident-{mode}+pallas",
                    "error": f"{type(e).__name__}: {e}"[:300],
                })

    if on_tpu:
        from tpufem.solvers.multigrid import GeometricMultigrid

        mg = GeometricMultigrid(3, 4, refine, coarsest_refine=1,
                                dtype=dtype, use_pallas=True)
        solve_mg = jax.jit(lambda b_: cg_solve(
            mg.fine.op.vmult, b_, M_inv=mg.preconditioner(),
            rtol=solve_rtol))
        jax.block_until_ready(solve_mg(b).x)
        t0 = time.perf_counter()
        res_mg = solve_mg(b)
        jax.block_until_ready(res_mg.x)
        t_mg = time.perf_counter() - t0
        lines.append({
            "metric": "3d_q4_gmg_cg_solve",
            "value": round(t_mg, 4), "unit": "s",
            "vs_baseline": round(t_mg, 4),
            "iterations": int(res_mg.iterations),
            "converged": bool(res_mg.converged),
            "residual": float(res_mg.residual),
            "rtol": solve_rtol, "n_dofs": dofs.n_dofs,
            "tier": "separable+pallas",
        })

        # fine-level-resident V-cycle (solvers/resident.py); the level's
        # own f32-mode kernel first, bf16 fallback (see Jacobi note)
        from tpufem.solvers.resident import resident_gmg_cg

        gmg_candidates = {"f32": mg.fine.mf.resident, **residents}
        for mode in ("f32", "bf16"):
            if gmg_candidates.get(mode) is None:
                continue
            try:
                mg.fine.mf.resident = gmg_candidates[mode]
                resident_gmg_cg(mg, b, rtol=solve_rtol)  # compile + warm
                t0 = time.perf_counter()
                res_rmg = resident_gmg_cg(mg, b, rtol=solve_rtol)
                jax.block_until_ready(res_rmg.x)
                t_rmg = time.perf_counter() - t0
                lines.append({
                    "metric": "3d_q4_gmg_cg_solve_resident",
                    "value": round(t_rmg, 4), "unit": "s",
                    "vs_baseline": round(t_rmg, 4),
                    "iterations": int(res_rmg.iterations),
                    "converged": bool(res_rmg.converged),
                    "residual": float(res_rmg.residual),
                    "rtol": solve_rtol, "n_dofs": dofs.n_dofs,
                    "tier": f"resident-{mode}+pallas",
                })
                break
            except Exception as e:
                lines.append({
                    "metric": "3d_q4_gmg_cg_solve_resident",
                    "value": 0.0, "unit": "s", "vs_baseline": 0.0,
                    "tier": f"resident-{mode}+pallas",
                    "error": f"{type(e).__name__}: {e}"[:300],
                })

    # ---- adaptive-mesh apply (BASELINE config 4: hanging nodes active,
    # box-structured tier — VERDICT r1 item 1: >= 0.5 GDoF/s at >= 1M DoFs)
    from tpufem.apps import bmop

    try:
        rec = bmop.bench_adaptive(
            3, 4 if on_tpu else 2, 4 if on_tpu else 2, 2, dtype,
            reps=reps if on_tpu else 2)
        lines.append({
            "metric": "3d_adaptive_hanging_nodes_apply",
            "value": round(rec["gdofs_per_s"], 4), "unit": "GDoF/s",
            "vs_baseline": round(rec["gdofs_per_s"], 4),
            "n_dofs": rec["n_dofs"], "n_hanging": rec["n_hanging"],
            "degree": rec["degree"], "tier": "boxes",
            "patch_overhead": rec["patch_overhead"],
        })
    except Exception as e:
        lines.append({"metric": "3d_adaptive_hanging_nodes_apply",
                      "value": 0.0, "unit": "GDoF/s", "vs_baseline": 0.0,
                      "error": f"{type(e).__name__}: {e}"[:300]})

    # ---- curved-geometry apply (3D shell, general-metric structured
    # tier — VERDICT r1 item 7: >= 0.5 GDoF/s)
    try:
        rec = bmop.bench_curved(3, 4 if on_tpu else 2, 5 if on_tpu else 1,
                                dtype, reps=reps if on_tpu else 2)
        lines.append({
            "metric": "3d_shell_curved_apply",
            "value": round(rec["gdofs_per_s"], 4), "unit": "GDoF/s",
            "vs_baseline": round(rec["gdofs_per_s"], 4),
            "n_dofs": rec["n_dofs"], "degree": rec["degree"],
            "tier": rec["scheme"],
        })
    except Exception as e:
        lines.append({"metric": "3d_shell_curved_apply",
                      "value": 0.0, "unit": "GDoF/s", "vs_baseline": 0.0,
                      "error": f"{type(e).__name__}: {e}"[:300]})

    # ---- headline line LAST ------------------------------------------
    gdofs = tiers[best_tier]
    lines.append({
        "metric": "3d_q4_laplace_matrix_free_apply",
        "value": gdofs, "unit": "GDoF/s",
        "vs_baseline": round(gdofs / BASELINE_GDOFS, 4),
        "tier": best_tier, "tiers": tiers, "tier_errors": tier_errors,
        "n_dofs": dofs.n_dofs,
    })
    for ln in lines:
        print(json.dumps(ln))


if __name__ == "__main__":
    main()
