"""Operator-apply benchmark across degrees and refinements.

Reference analogue: ``bmop.cu`` (SURVEY.md §2): N repeated vmults per
(degree, refinement), report s/apply and DoF/s — the GDoF/s north-star
table.  Optionally also times the assembled-SpMV baseline (``bmspmv.cu``)
for the matrix-free-vs-assembled comparison (BASELINE config 3).

Run:  python -m tpufem.apps.bmop --dim 3 --degrees 1 2 3 4 --refine 4
"""

from __future__ import annotations

import argparse

import jax.numpy as jnp
import numpy as np

from tpufem.fem.dof_handler import DoFHandler
from tpufem.fem.mesh import Mesh
from tpufem.operators.laplace import LaplaceOperator
from tpufem.ops.matrix_free import MatrixFree
from tpufem.utils.config import FemConfig
from tpufem.utils.metrics import emit
from tpufem.utils.timer import time_fn


def adaptive_mesh(dim, refine, steps, center=0.31, radius=0.35):
    """Uniform base + ``steps`` rounds of refinement toward a ball — the
    reference's adaptive Poisson setup (SURVEY.md §3.1 adaptive variant)."""
    mesh = Mesh.hyper_cube(dim, refine)
    for _ in range(steps):
        centers = (mesh.origins + mesh.sizes[:, None] * 0.5) / mesh.U
        mesh = mesh.refine(
            np.linalg.norm(centers - center, axis=1) < radius)
    return mesh


def build_adaptive_op(dim, p, refine, steps, dtype):
    """(mesh, dofs, constraints, op) for the adaptive benchmarks — built
    once and shared between the apply and solve sections (the host setup
    is ~1 min at the flagship size)."""
    from tpufem.fem.constraints import make_hanging_node_constraints
    from tpufem.ops.boxes import BoxLaplaceOperator

    mesh = adaptive_mesh(dim, refine, steps)
    dofs = DoFHandler(mesh, p)
    ac = make_hanging_node_constraints(dofs)
    op = BoxLaplaceOperator(mesh, dofs, constraints=ac, dtype=dtype)
    return mesh, dofs, ac, op


def bench_adaptive(dim, p, refine, steps, dtype, reps, compare=False,
                   prebuilt=None, bf16_tier=True):
    """Adaptive-mesh apply benchmark: box-structured tier (the fast TPU
    path for BASELINE config 4) with optional incidence-path comparison.

    Two precision tiers (mirroring the uniform flagship's f32/bf16
    ladder): f32 patch vectors with HIGH (bf16x3) matmuls, and bf16
    patch storage (1-pass matmuls + halved transfer DMA); the reported
    rate is the best tier, with per-tier rates and the bf16 rel error
    attached.

    The sustained rate is measured as an in-jit chained loop (CG-style
    back-to-back applies): per-call dispatch on this platform carries a
    ~11 ms tax after eager-op execution (docs/ROOFLINE.md) that would
    otherwise dominate the measurement.
    """
    import time

    import jax

    from tpufem.ops.boxes import BoxLaplaceOperator

    mesh, dofs, ac, op = (prebuilt if prebuilt is not None
                          else build_adaptive_op(dim, p, refine, steps,
                                                 dtype))
    n_chain = max(reps, 2)

    def chain_rate(op_, dt_):
        xs = op_.to_patch(np.ones(dofs.n_dofs)).astype(jnp.dtype(dt_))

        @jax.jit
        def chain(pr, v):
            def body(i, u):
                # rescale: spectral radius >> 1
                return (op_._vmult_p(pr, u) * 1e-7).astype(u.dtype)

            return jax.lax.fori_loop(0, n_chain, body, v)

        y = chain(op_.params, xs)
        # scalar D2H: the only reliable sync on this platform
        # (block_until_ready returns early on Pallas chains)
        s = float(jnp.sum(jnp.abs(y).astype(jnp.float32)))
        t0 = time.perf_counter()
        y = chain(op_.params, xs)
        s = float(jnp.sum(jnp.abs(y).astype(jnp.float32)))
        if not np.isfinite(s):
            raise FloatingPointError(
                "adaptive apply produced non-finite output")
        return (time.perf_counter() - t0) / n_chain, xs

    dt, x = chain_rate(op, dtype)
    tiers = {"boxes-f32": dofs.n_dofs / dt / 1e9}
    bf16_err = None
    if bf16_tier and jnp.dtype(dtype) == jnp.float32:
        # bf16 patch storage: halves the transfer-stage DMA and runs
        # every matmul as a single MXU pass (vs 3 for f32 HIGH) —
        # measured 0.57 -> 0.94 GDoF/s at the 3.3M flagship with
        # 5.6e-4 rel err (scripts/adaptive_prec_lab.py, ROOFLINE.md
        # "Adaptive box tier - the precision axis")
        op16 = BoxLaplaceOperator(mesh, dofs, constraints=ac,
                                  dtype="bfloat16")
        dt16, x16 = chain_rate(op16, "bfloat16")
        tiers["boxes-bf16"] = dofs.n_dofs / dt16 / 1e9
        yr = np.asarray(jax.jit(op._vmult_p)(op.params, x), np.float64)
        y16 = np.asarray(jax.jit(op16._vmult_p)(op16.params, x16),
                         np.float64)
        bf16_err = float(np.linalg.norm(y16 - yr) / np.linalg.norm(yr))
        if tiers["boxes-bf16"] > tiers["boxes-f32"]:
            dt = dt16
    rec = {
        "bench": "bmop-adaptive",
        "dim": dim, "degree": p, "refine": refine, "adaptive_steps": steps,
        "n_dofs": dofs.n_dofs, "n_cells": mesh.n_cells,
        "n_hanging": len(ac.lines),
        "n_patch": op.n_patch,
        "patch_overhead": round(op.n_patch / dofs.n_dofs, 3),
        "scheme": max(tiers, key=tiers.get), "dtype": dtype,
        "n_rects": len(op._rect_meta), "n_fallback_rows": (
            len(ac.lines) - op.n_rect_rows),
        "s_per_apply": dt,
        "gdofs_per_s": dofs.n_dofs / dt / 1e9,
        "tiers_gdofs": {k: round(v, 4) for k, v in tiers.items()},
    }
    if bf16_err is not None:
        rec["bf16_rel_err"] = bf16_err
    if compare:
        mf = MatrixFree.build(
            mesh, dofs,
            FemConfig(dim=dim, degree=p, dtype=dtype, scatter="incidence"),
            constraints=ac,
        )
        iop = LaplaceOperator(mf)
        xg = jnp.ones(dofs.n_dofs, jnp.dtype(dtype))
        dt_i = time_fn(iop.vmult, xg, reps=max(1, reps // 10))
        rec["incidence_s_per_apply"] = dt_i
        rec["box_speedup_vs_incidence"] = dt_i / dt
    return rec


def bench_distributed(dim, p, refine, steps, dtype, reps, shards):
    """Distributed box-tier apply benchmark: the in-jit chained-rate
    protocol inside ONE shard_map program over a device mesh (the
    multi-GPU bmop run of the reference, SURVEY.md §3.6).  Reports the
    aggregate GDoF/s across all shards."""
    import time

    import jax
    from jax.sharding import PartitionSpec as P

    from tpufem.fem.constraints import make_hanging_node_constraints
    from tpufem.ops.boxes import BoxLaplaceOperator
    from tpufem.parallel.boxes import DistributedBoxLaplace

    mesh = adaptive_mesh(dim, refine, steps)
    dofs = DoFHandler(mesh, p)
    ac = make_hanging_node_constraints(dofs)
    gop = BoxLaplaceOperator(mesh, dofs, constraints=ac, dtype=dtype)
    dop = DistributedBoxLaplace(gop, shards=shards)
    x = dop.put_vector(np.asarray(gop.to_patch(np.ones(dofs.n_dofs))))
    n_chain = max(reps, 2)
    spec = P((dop.axis_name, dop.axis_name_y))
    dmesh = dop.device_mesh()

    def body(pr, x):
        prl = jax.tree.map(lambda a: a[0], pr)

        def step(i, v):
            return dop._local_vmult(prl, v) * 1e-7  # spectral radius >> 1

        return jax.lax.fori_loop(0, n_chain, step, x[0])[None]

    chain = jax.jit(jax.shard_map(
        body, mesh=dmesh, in_specs=(spec, spec), out_specs=spec))
    y = chain(dop.params, x)
    s = float(jnp.sum(jnp.abs(y)))  # scalar D2H sync (see bench_adaptive)
    t0 = time.perf_counter()
    y = chain(dop.params, x)
    s = float(jnp.sum(jnp.abs(y)))
    dt = (time.perf_counter() - t0) / n_chain
    if not np.isfinite(s):
        raise FloatingPointError(
            "distributed apply produced non-finite output")
    return {
        "bench": "bmop-distributed",
        "dim": dim, "degree": p, "refine": refine, "adaptive_steps": steps,
        "n_dofs": dofs.n_dofs, "n_cells": mesh.n_cells,
        "n_hanging": len(ac.lines),
        "shards": f"{dop.sz}x{dop.sy}", "n_devices": dop.n_shards,
        "scheme": "boxes-distributed", "dtype": dtype,
        "s_per_apply": dt,
        "gdofs_per_s": dofs.n_dofs / dt / 1e9,
    }


def bench_adaptive_solve(dim, p, refine, steps, dtype, rtol=1e-5,
                         prebuilt=None, bf16_cycle=False,
                         emit_cb=None):
    """Adaptive whole-solve benchmark: Jacobi-CG vs global-coarsening
    GMG-CG on the box tier (the ``poisson_mg`` analogue for adaptively
    refined meshes, tpufem.solvers.box_multigrid).  Both solves run as
    ONE jitted computation each; timings are warm (compile + one warm
    solve first, scalar D2H sync ends each timing).

    bf16_cycle additionally times the mixed-precision variant (f32
    outer CG + bf16 V-cycle hierarchy via ``BoxMultigrid(solve_op=)``)
    and records its true f32 residual alongside.  The bf16 hierarchy is
    only BUILT after the f32 variants complete, and ``emit_cb`` (if
    given) is called with the partial record first — the V-cycle
    programs are the largest compiles in the whole bench, so a budget
    overrun on the bf16 variant must not lose the f32 lines."""
    import time

    from tpufem.solvers.box_multigrid import BoxMultigrid

    mesh, dofs, ac, op = (prebuilt if prebuilt is not None
                          else build_adaptive_op(dim, p, refine, steps,
                                                 dtype))
    diag = op.diagonal()
    mg = BoxMultigrid(mesh, dofs, constraints=ac, dtype=dtype,
                      fine_op=op, fine_diag=diag)
    rng = np.random.default_rng(7)
    mask = np.asarray(op.interior_mask, np.float64) * mg.fine.nh_mask
    b = jnp.asarray(mask * np.asarray(op.to_patch(
        rng.standard_normal(dofs.n_dofs))), op.dt)
    out = {
        "bench": "bmop-adaptive-solve", "dim": dim, "degree": p,
        "refine": refine, "adaptive_steps": steps, "dtype": dtype,
        "n_dofs": dofs.n_dofs, "n_hanging": len(ac.lines),
        "rtol": rtol, "levels": len(mg.levels),
    }
    runs = [
        ("jacobi", lambda: op.cg_solve(b, diag, rtol=rtol)),
        ("gmg", lambda: mg.cg_solve(b, rtol=rtol)),
    ]
    if bf16_cycle and jnp.dtype(dtype) == jnp.float32:
        mg16_box = []

        def bf16_run():
            if not mg16_box:  # deferred: derived only after f32 lines
                # recast shares the f32 hierarchy's host build + cheb
                # estimates (a fresh bf16 build costs ~380 s at this
                # size — scripts/adaptive_solve_lab.py)
                mg16_box.append(mg.recast("bfloat16", solve_op=op))
            return mg16_box[0].cg_solve(b, rtol=rtol)

        runs.append(("gmg_bf16cycle", bf16_run))
    bnorm = float(jnp.linalg.norm(b))
    for name, run in runs:
        if name == "gmg_bf16cycle" and emit_cb is not None:
            emit_cb(dict(out))  # f32 lines are safe before the build
        int(run().iterations)  # compile + warm (iteration fetch = sync)
        t0 = time.perf_counter()
        res = run()
        it = int(res.iterations)
        out[f"{name}_s"] = time.perf_counter() - t0
        out[f"{name}_iterations"] = it
        out[f"{name}_converged"] = bool(res.converged)
        # true f32 residual for EVERY variant: the f32 apply's own
        # rounding floors this at ~eps*||A||/||b||-relative (~1e-4 at
        # this stiffness), so only the comparison across variants is
        # meaningful, not the absolute digits
        rr = b - op.vmult(jnp.asarray(res.x, op.dt))
        out[f"{name}_true_rel_res"] = float(jnp.linalg.norm(rr)) / bnorm
    return out


def bench_curved(dim, p, refine, dtype, reps):
    """Curved-geometry apply benchmark: the blocked general-metric
    structured tier on a shell wedge (BASELINE shell geometry).
    Sustained in-jit chained rate (see bench_adaptive on the per-call
    dispatch tax)."""
    import time

    import jax

    mesh = (Mesh.hyper_shell_3d(refine) if dim == 3
            else Mesh.hyper_shell_2d(refine))
    dofs = DoFHandler(mesh, p)
    x = jnp.ones(dofs.n_dofs, jnp.dtype(dtype))
    n_chain = max(reps, 2)

    def rate(scatter):
        mf = MatrixFree.build(
            mesh, dofs,
            FemConfig(dim=dim, degree=p, dtype=dtype, scatter=scatter),
        )
        op = LaplaceOperator(mf)

        @jax.jit
        def chain(dp, x):
            def body(i, v):
                return op.vmult_raw_with(dp, v) * 1e-7

            return jax.lax.fori_loop(0, n_chain, body, x)

        y = chain(op.device_args, x)
        s = float(jnp.sum(jnp.abs(y)))  # scalar D2H sync (see above)
        t0 = time.perf_counter()
        y = chain(op.device_args, x)
        s = float(jnp.sum(jnp.abs(y)))
        dt = (time.perf_counter() - t0) / n_chain
        if not np.isfinite(s):
            raise FloatingPointError(
                "curved apply produced non-finite output")
        return dt

    # separable-metric tier (orthogonal shells factor exactly) + the
    # per-qpoint general-metric structured tier (CPU rigs only: on the
    # chip its 1.08 GDoF/s attribution is recorded in docs/ROOFLINE.md
    # and its compile does not earn its bench-budget cost)
    import jax as _jax

    tiers = {"separable(metric-factorized)": rate("separable")}
    if _jax.default_backend() in ("cpu",):
        tiers["structured(general-metric)"] = rate("structured")

    # fused ResidentTerms kernel on the exact separable-metric
    # factorization (per-row band tables): measured 2.25/2.65/3.0 GDoF/s
    # (f32/bf16/bf16s) vs 1.38 XLA at the 2.1M-DoF shell flagship —
    # chained in the resident layout like the headline protocol
    def rate_resident(mode):
        mf = MatrixFree.build(
            mesh, dofs,
            FemConfig(dim=dim, degree=p, dtype=dtype, scatter="separable",
                      use_pallas=True, pallas_mode=mode))
        rk = mf.resident
        if rk is None:
            raise ValueError("no resident terms kernel for this shape")

        @jax.jit
        def chain(v):
            def body(i, w):
                return (rk.raw(w) * 1e-7).astype(w.dtype)

            return jax.lax.fori_loop(0, n_chain, body, v)

        xp = rk.pad(x)
        y = chain(xp)
        s = float(jnp.sum(jnp.abs(y)))  # scalar D2H sync
        # 2 chain calls (the headline protocol): the process-wide
        # ~11 ms/dispatch tax after eager ops (docs/ROOFLINE.md quirk 2)
        # otherwise adds ~0.4 ms/apply at n_chain=30
        t0 = time.perf_counter()
        for _ in range(2):
            y = chain(xp)
        s = float(jnp.sum(jnp.abs(y)))
        dt = (time.perf_counter() - t0) / (2 * n_chain)
        if not np.isfinite(s):
            raise FloatingPointError(
                "curved resident apply produced non-finite output")
        return dt

    if dim == 3:
        for mode in ("f32", "bf16", "bf16s"):
            try:
                tiers[f"resident-terms-{mode}+pallas"] = rate_resident(mode)
            except Exception:
                pass  # tiling constraints unmet / platform without Mosaic

    best = min(tiers, key=tiers.get)
    dt = tiers[best]
    return {
        "bench": "bmop-curved",
        "dim": dim, "degree": p, "refine": refine,
        "n_dofs": dofs.n_dofs, "scheme": best,
        "tiers_gdofs": {k: dofs.n_dofs / v / 1e9 for k, v in tiers.items()},
        "dtype": dtype,
        "s_per_apply": dt,
        "gdofs_per_s": dofs.n_dofs / dt / 1e9,
    }


def bench_varcoef(dim, p, refine, dtype, reps, modes=None,
                  attr_refine=None):
    """Variable-coefficient apply benchmark (BASELINE config 5): a
    SEPARABLE smooth coefficient c(x) = prod_a c_a(x_a) — genuinely
    varying along every axis — rides the exactly-factored weighted-1D
    terms + the fused ResidentTerms kernel (the variable-coefficient
    fast path, VERDICT r4 item 2); the per-qpoint structured tier runs
    the SAME operator for attribution (and is the exact fallback for
    non-separable coefficients — see docs/ROOFLINE.md kill-arithmetic
    for why no per-qpoint kernel beats it on this toolchain)."""
    import time

    import jax

    cax = [lambda x: 1.0 + 0.5 * np.sin(2.1 * np.pi * x),
           lambda y: 1.3 + y * y,
           lambda z: np.exp(0.5 * z)][:dim]

    def coef(pts):
        out = np.ones(pts.shape[0])
        for a in range(dim):
            out = out * np.asarray(cax[a](pts[:, a]))
        return out

    mesh = Mesh.hyper_cube(dim, refine)
    # the kernel path needs only the grid arithmetic — the 17M
    # DoFHandler build (~30 s host) is skipped unless a non-kernel tier
    # actually enumerates DoFs
    nd_g = ((1 << refine) * p + 1) ** dim
    x = jnp.ones(nd_g, jnp.dtype(dtype))
    n_chain = max(reps, 2)
    tiers = {}

    def chain_rate(apply_fn, v):
        @jax.jit
        def chain(w):
            def body(i, u):
                return (apply_fn(u) * 1e-7).astype(u.dtype)

            return jax.lax.fori_loop(0, n_chain, body, w)

        y = chain(v)
        s = float(jnp.sum(jnp.abs(y)))  # scalar D2H sync
        t0 = time.perf_counter()
        for _ in range(2):
            y = chain(v)
        s = float(jnp.sum(jnp.abs(y)))
        dt = (time.perf_counter() - t0) / (2 * n_chain)
        if not np.isfinite(s):
            raise FloatingPointError("apply produced non-finite output")
        return dt

    on_tpu = jax.default_backend() not in ("cpu",)
    # bf16s fits at 17M since the vmem-limit raise + streamed band
    # tables (chip-swept: terms bf16s tile 48 = 7.1 GDoF/s chained)
    if modes is None:
        modes = (("f32", "bf16", "bf16s")
                 if (dim == 3 and on_tpu) else ("f32",))
    if on_tpu and dim == 3:
        # build the exactly-factored terms ONCE and one ResidentTerms
        # kernel per mode: the full MatrixFree.build per mode costs
        # ~80 s of host work at 17M (cell maps/incidence it never uses)
        # and was the varcoef section's whole budget at flagship scale
        from tpufem.ops.pallas_separable import ResidentTerms
        from tpufem.ops.separable import cartesian_coef_terms

        n_ax = 1 << refine
        npts = n_ax * p + 1
        terms = cartesian_coef_terms(p, dim, p + 1, n_ax, mesh.lower,
                                     mesh.upper, cax, np.float64)
        for mode in modes:
            try:
                rk = ResidentTerms(npts, p, terms, dtype, mode=mode)
                tiers[f"resident-terms-{mode}+pallas"] = chain_rate(
                    rk.raw, rk.pad(x))
                del rk
            except Exception:
                pass
    else:
        dofs = DoFHandler(mesh, p)
        for mode in modes:
            try:
                mf = MatrixFree.build(
                    mesh, dofs,
                    FemConfig(dim=dim, degree=p, dtype=dtype,
                              scatter="separable", use_pallas=True,
                              pallas_mode=mode),
                    coefficient_axes=cax)
                rk = mf.resident
                if rk is None:
                    raise ValueError("no resident terms kernel")
                tiers[f"resident-terms-{mode}+pallas"] = chain_rate(
                    rk.raw, rk.pad(x))
            except Exception:
                pass
    # per-qpoint structured tier, same operator (exact fallback for
    # non-separable coefficients).  ``attr_refine`` runs this
    # ATTRIBUTION tier at a smaller mesh: at 17M its blocked-metric H2D
    # + program load cost ~140 s of the bench budget while its rate is
    # scale-flat (HBM-bound) — the tier label carries its own n_dofs.
    ar = refine if attr_refine is None else attr_refine
    mesh_a = mesh if ar == refine else Mesh.hyper_cube(dim, ar)
    dofs_a = DoFHandler(mesh_a, p)
    x_a = jnp.ones(dofs_a.n_dofs, jnp.dtype(dtype))
    akey = ("structured(per-qpoint)" if ar == refine
            else f"structured(per-qpoint)@refine{ar}")
    mf_s = MatrixFree.build(
        mesh_a, dofs_a,
        FemConfig(dim=dim, degree=p, dtype=dtype, scatter="structured"),
        coefficient=coef)
    op_s = LaplaceOperator(mf_s)
    dp = op_s.device_args
    tiers_gdofs = {k: nd_g / v / 1e9 for k, v in tiers.items()}
    tiers_gdofs[akey] = dofs_a.n_dofs / chain_rate(
        lambda v: op_s.vmult_raw_with(dp, v), x_a) / 1e9
    if not tiers:  # no kernel tier (CPU path): report the structured one
        return {
            "bench": "bmop-varcoef", "dim": dim, "degree": p,
            "refine": ar, "n_dofs": dofs_a.n_dofs, "scheme": akey,
            "coefficient":
                "separable: (1+.5 sin(2.1 pi x))(1.3+y^2)e^{z/2}",
            "tiers_gdofs": tiers_gdofs, "dtype": dtype,
            "s_per_apply": dofs_a.n_dofs / tiers_gdofs[akey] / 1e9,
            "gdofs_per_s": tiers_gdofs[akey],
        }
    best = min(tiers, key=tiers.get)
    return {
        "bench": "bmop-varcoef", "dim": dim, "degree": p,
        "refine": refine, "n_dofs": nd_g, "scheme": best,
        "coefficient": "separable: (1+.5 sin(2.1 pi x))(1.3+y^2)e^{z/2}",
        "tiers_gdofs": tiers_gdofs,
        "dtype": dtype,
        "s_per_apply": tiers[best],
        "gdofs_per_s": nd_g / tiers[best] / 1e9,
    }


def bench_resident(p, refine, dtype, reps, mode="f32", dim=3):
    """Solver-resident fused-kernel apply (halo'd layout in/out — the
    rate chained CG applies sustain), 3D or 2D, measured with the
    headline protocol (in-jit chain, 2 timed calls)."""
    import time

    import jax
    import jax.numpy as jnp

    from tpufem.ops.pallas_separable import ResidentSeparable, ResidentTerms2D
    from tpufem.ops.separable import global_1d_matrices

    n = 1 << refine
    npts = n * p + 1
    K1u, M1u = global_1d_matrices(p, n, p + 1)
    h = 1.0 / n
    interp = jax.default_backend() == "cpu"
    if dim == 3:
        rk = ResidentSeparable(npts, p, [np.asarray(K1u / h)] * 3,
                               [np.asarray(M1u * h)] * 3, dtype, mode=mode,
                               interpret=interp)
    elif dim == 2:
        Kx, Mx = np.asarray(K1u / h), np.asarray(M1u * h)
        rk = ResidentTerms2D(npts, p, [[Kx, Mx], [Mx, Kx]], dtype,
                             mode=mode, interpret=interp)
    else:
        raise ValueError("bench_resident supports dim 2 and 3")
    n_dofs = npts**dim
    x = rk.pad(jnp.ones(n_dofs, jnp.dtype(dtype)))
    n_chain = max(reps, 2)

    @jax.jit
    def chain(v):
        def body(i, w):
            return (rk.raw(w) * 1e-7).astype(w.dtype)

        return jax.lax.fori_loop(0, n_chain, body, v)

    y = chain(x)
    s = float(jnp.sum(jnp.abs(y)))  # scalar D2H sync
    t0 = time.perf_counter()
    for _ in range(2):
        y = chain(x)
    s = float(jnp.sum(jnp.abs(y)))
    dt = (time.perf_counter() - t0) / (2 * n_chain)
    if not np.isfinite(s):
        raise FloatingPointError("resident apply produced non-finite output")
    return {
        "bench": "bmop-resident",
        "dim": dim, "degree": p, "refine": refine, "n_dofs": n_dofs,
        "scheme": f"resident-{mode}", "dtype": dtype,
        "s_per_apply": dt,
        "gdofs_per_s": n_dofs / dt / 1e9,
    }


def bench_config(dim, p, refine, dtype, scatter, reps, with_spmv=False):
    mesh = Mesh.hyper_cube(dim, refine)
    dofs = DoFHandler(mesh, p)
    mf = MatrixFree.build(
        mesh, dofs, FemConfig(dim=dim, degree=p, dtype=dtype, scatter=scatter)
    )
    op = LaplaceOperator(mf)
    x = jnp.ones(dofs.n_dofs, jnp.dtype(dtype))
    dt = time_fn(op.vmult_raw, x, reps=reps)
    rec = {
        "bench": "bmop",
        "dim": dim,
        "degree": p,
        "refine": refine,
        "n_dofs": dofs.n_dofs,
        "scheme": mf.scheme,
        "dtype": dtype,
        "s_per_apply": dt,
        "gdofs_per_s": dofs.n_dofs / dt / 1e9,
    }
    if with_spmv:
        from tpufem.fem.assemble import assemble_laplace
        from tpufem.ops.sparse import EllMatrix

        A = EllMatrix.from_csr(assemble_laplace(dofs), jnp.dtype(dtype))
        import jax

        mv = A.matvec  # jitted internally, arrays as args
        dt_s = time_fn(mv, x, reps=reps)
        rec["spmv_s_per_apply"] = dt_s
        rec["spmv_gdofs_per_s"] = dofs.n_dofs / dt_s / 1e9
        rec["mf_speedup_vs_spmv"] = dt_s / dt
    return rec


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--dim", type=int, default=3)
    ap.add_argument("--degrees", type=int, nargs="+", default=[1, 2, 3, 4])
    ap.add_argument("--refine", type=int, default=4)
    ap.add_argument("--dtype", default="float32")
    ap.add_argument("--scatter", default="auto")
    ap.add_argument("--reps", type=int, default=20)
    ap.add_argument("--spmv", action="store_true",
                    help="also run the assembled-SpMV baseline (bmspmv)")
    ap.add_argument("--curved", action="store_true",
                    help="benchmark the curved (shell) general-metric "
                         "structured tier instead")
    ap.add_argument("--adaptive", type=int, default=0, metavar="STEPS",
                    help="benchmark the adaptive box tier instead: STEPS "
                         "rounds of refinement toward a ball")
    ap.add_argument("--compare-incidence", action="store_true",
                    help="with --adaptive: also time the generic "
                         "incidence path for comparison")
    ap.add_argument("--resident", choices=["f32", "bf16", "bf16s"],
                    default=None,
                    help="benchmark the solver-resident fused kernel "
                         "(halo'd layout in/out, 2D/3D via --dim) in "
                         "this mode")
    ap.add_argument("--shards", default=None,
                    help="with --adaptive: distributed box-tier apply "
                         "over a device mesh, '4' (z slabs) or '2x4' "
                         "(z x y); needs that many JAX devices")
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (some TPU plugins ignore "
                         "JAX_PLATFORMS; this flag always works)")
    args = ap.parse_args(argv)
    if args.shards and (not args.adaptive or args.resident or args.curved
                        or args.spmv):
        ap.error("--shards runs the distributed adaptive box tier: it "
                 "requires --adaptive and excludes "
                 "--resident/--curved/--spmv")
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    for p in args.degrees:
        if args.resident:
            rec = bench_resident(p, args.refine, args.dtype, args.reps,
                                 mode=args.resident, dim=args.dim)
        elif args.curved:
            rec = bench_curved(args.dim, p, args.refine, args.dtype,
                               args.reps)
        elif args.adaptive and args.shards:
            parts = [int(x) for x in str(args.shards).lower().split("x")]
            shards = (parts[0], 1) if len(parts) == 1 else tuple(parts[:2])
            rec = bench_distributed(
                args.dim, p, args.refine, args.adaptive, args.dtype,
                args.reps, shards,
            )
        elif args.adaptive:
            rec = bench_adaptive(
                args.dim, p, args.refine, args.adaptive, args.dtype,
                args.reps, compare=args.compare_incidence,
            )
        else:
            rec = bench_config(
                args.dim, p, args.refine, args.dtype, args.scatter,
                args.reps, with_spmv=args.spmv,
            )
        emit(rec)


if __name__ == "__main__":
    main()
