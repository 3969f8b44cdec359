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

    # solver-resident solves run in a FRESH SUBPROCESS: cumulative
    # process state (allocator churn from the per-call tier timings)
    # degrades the resident-GMG program ~70x in-context, while a clean
    # process measures 0.21-0.24 s — the same platform quirk class as
    # the documented dispatch poisoning (docs/ROOFLINE.md); the compile
    # cache makes the subprocess cheap.
    if on_tpu:
        import subprocess
        import sys

        try:
            out = subprocess.run(
                [sys.executable, os.path.abspath(__file__),
                 "--resident-solves"],
                capture_output=True, text=True, timeout=3000,
            )
            got = 0
            for ln in out.stdout.strip().splitlines():
                try:
                    lines.append(json.loads(ln))
                    got += 1
                except json.JSONDecodeError:
                    pass
            if out.returncode != 0 or got == 0:
                lines.append({
                    "metric": "resident_solves_subprocess",
                    "value": 0.0, "unit": "s", "vs_baseline": 0.0,
                    "error": (out.stderr or "no output")[-300:],
                })
        except Exception as e:
            lines.append({
                "metric": "resident_solves_subprocess",
                "value": 0.0, "unit": "s", "vs_baseline": 0.0,
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

    # free the 17M-DoF solver state before the adaptive/curved sections
    # (HBM headroom: the GMG hierarchy + solve programs hold ~2 GB and
    # the curved general-metric tier needs ~1.5 GB of its own)
    import gc

    if on_tpu:
        del mg, res_mg, solve_mg
    del mf_s, op_s, diag, b, solve, res, x, residents
    gc.collect()

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


def resident_solves():
    """Fresh-process measurement of the solver-resident solves (see the
    subprocess note in main).  Prints one JSON line per solve."""
    from tpufem.fem.dof_handler import DoFHandler
    from tpufem.fem.mesh import Mesh
    from tpufem.operators.laplace import LaplaceOperator
    from tpufem.ops.matrix_free import MatrixFree
    from tpufem.ops.pallas_separable import ResidentSeparable
    from tpufem.ops.separable import global_1d_matrices
    from tpufem.solvers.multigrid import GeometricMultigrid
    from tpufem.solvers.resident import resident_gmg_cg, resident_jacobi_cg
    from tpufem.utils.config import FemConfig

    refine, dtype, solve_rtol = 6, "float32", 1e-5
    mesh = Mesh.hyper_cube(3, refine)
    dofs = DoFHandler(mesh, 4)
    mf_s = MatrixFree.build(
        mesh, dofs,
        FemConfig(dim=3, degree=4, dtype=dtype, scatter="separable",
                  use_pallas=True),
    )
    op_s = LaplaceOperator(mf_s)
    diag = op_s.diagonal()
    rng = np.random.default_rng(7)  # same rhs as the main process
    mask = np.asarray(mf_s.interior_mask, np.float64)
    b = jnp.asarray(mask * rng.standard_normal(dofs.n_dofs),
                    jnp.dtype(dtype))

    def bf16_kernel():
        n_ax = 1 << refine
        K1u, M1u = global_1d_matrices(4, n_ax, 5)
        h = 1.0 / n_ax
        return ResidentSeparable(
            n_ax * 4 + 1, 4, [np.asarray(K1u / h)] * 3,
            [np.asarray(M1u * h)] * 3, dtype, mode="bf16")

    def run(metric, solver, set_kernel):
        own = set_kernel("f32", None)
        for mode in ("f32", "bf16"):
            try:
                if mode == "f32":
                    if own is None:
                        continue
                else:
                    set_kernel(mode, bf16_kernel())
                solver()  # compile + warm
                t0 = time.perf_counter()
                res = solver()
                jax.block_until_ready(res.x)
                dt = round(time.perf_counter() - t0, 4)
                print(json.dumps({
                    "metric": metric,
                    "value": dt,
                    "unit": "s",
                    "vs_baseline": dt,
                    "iterations": int(res.iterations),
                    "converged": bool(res.converged),
                    "residual": float(res.residual),
                    "rtol": solve_rtol, "n_dofs": dofs.n_dofs,
                    "tier": f"resident-{mode}+pallas (fresh process)",
                }), flush=True)
                return
            except Exception as e:
                print(json.dumps({
                    "metric": metric, "value": 0.0, "unit": "s",
                    "vs_baseline": 0.0,
                    "tier": f"resident-{mode}+pallas",
                    "error": f"{type(e).__name__}: {e}"[:300],
                }), flush=True)

    run("3d_q4_jacobi_cg_solve_resident",
        lambda: resident_jacobi_cg(op_s, b, diag=diag, rtol=solve_rtol),
        lambda mode, rk: (mf_s.resident if rk is None
                          else setattr(mf_s, "resident", rk)))

    mg = GeometricMultigrid(3, 4, refine, coarsest_refine=1, dtype=dtype,
                            use_pallas=True)

    def set_mg(mode, rk):
        if rk is None:
            return mg.fine.mf.resident
        mg.fine.mf.resident = rk
        mg._resident_cg_cache = None
        return rk

    run("3d_q4_gmg_cg_solve_resident",
        lambda: resident_gmg_cg(mg, b, rtol=solve_rtol), set_mg)


if __name__ == "__main__":
    import sys

    if "--resident-solves" in sys.argv:
        resident_solves()
    else:
        main()
