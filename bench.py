#!/usr/bin/env python
"""Headline benchmarks: 3D Poisson Q4 apply (GDoF/s) and whole CG solves.

The reference's ``bmop.cu`` protocol (SURVEY.md §2): time N repeated vmults,
report DoF/s.  BASELINE.json metric: "3D Poisson Q4 matrix-free apply GDoF/s
and CG solve time".  vs_baseline for the apply line is measured against the
literature anchor of ~1 GDoF/s for 3D high-order Laplace apply on V100-class
GPUs (BASELINE.md, approximate — no published reference numbers were
recoverable); solve lines carry no anchor (vs_baseline = value).

Driver-robust by design (round-2 postmortem: BENCH_r02 was a timeout with
ZERO output because every line was buffered to the end):
- a "bench_started" line prints BEFORE any backend use, and device init is
  probed in a killable subprocess with CPU fallback (the TPU tunnel was
  observed wedged for hours in round 3 — device init hangs uninterruptibly);
- every JSON line prints IMMEDIATELY with flush=True, headline first;
- a global wall-clock budget (TPUFEM_BENCH_BUDGET_S, default 720 s) gates
  each section — skipped sections emit an explicit {"skipped": ...} line —
  and a watchdog thread re-prints the best headline line and exits 0 at the
  deadline even if the main thread is stuck in a device call;
- a first-compile time >120 s marks the cache cold and drops the remaining
  sections to refine 5 (2.1M DoFs);
- subprocess sections are hard-capped (<= 300 s / <= 120 s);
- the best apply line is re-printed LAST (the driver parses the last line).

Apply rates use the judge's 30-chained-applies protocol (in-jit fori_loop
of back-to-back applies — the rate a CG iteration actually sustains; the
per-call dispatch tax on this platform would otherwise dominate).

All programs thread device arrays as jit ARGUMENTS (platform rule, see
MatrixFree.device_args — closure-captured device constants D2H-hang at
lowering; this was the root cause of the round-2 bench timeout).

Measurement rules for this platform (measured, round 3):
- the FIRST device-to-host fetch in a process costs 25-300 s (tunnel
  warm-up; later fetches are fast) — bench pays it on a tiny array in a
  background thread started right after init, overlapped with compiles;
- ``jax.block_until_ready`` does NOT reliably wait for Pallas-chain
  programs (returns in us while the chain still runs) — every timing
  ends with a scalar D2H sync instead, and a sanity guard flags any
  apply rate above the HBM roofline as "suspect".
"""

import gc
import json
import os
import subprocess
import sys
import threading
import time

# the env var is ignored on this machine (see tpufem/utils/cache.py) but
# set it anyway for subprocess sections; the config API call below is the
# one that takes.  The default cache dir lives INSIDE the repo so it
# survives the driver's fresh bench container (VERDICT r4 item 1a).
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"))

BASELINE_GDOFS = 1.0  # V100-class anchor, BASELINE.md (approximate)
# Roofline anchors for the headline roofline_pct field (docs/ROOFLINE.md,
# measured on this chip): the resident-layout copy floor (0.80 ms DMA-only
# at f32 storage = 21 GDoF/s; bf16 storage halves it) and the f32-HIGHEST
# MXU schedule bound (29 GDoF/s).  BASELINE's ">=50% of roofline" gate is
# tracked against these per round.
COPY_FLOOR_GDOFS = {"f32": 21.0, "bf16": 21.0, "bf16s": 42.0}
MXU_BOUND_GDOFS = 29.0
T0 = time.perf_counter()
BUDGET_S = float(os.environ.get("TPUFEM_BENCH_BUDGET_S", "720"))
N_CHAIN = 30  # judge's chained-applies protocol
ROOFLINE_GDOFS = 110.0  # per-chip HBM bound; anything above is bogus

# first parseable line BEFORE any backend use: device init can hang
# forever when the TPU tunnel is wedged (observed round 3: the axon
# backend blocked in jax.devices() for hours) and the artifact must
# never be empty because of it
print(json.dumps({
    "metric": "bench_started", "value": 0.0, "unit": "none",
    "vs_baseline": 0.0, "budget_s": BUDGET_S}), flush=True)


def _device_init_alive(timeout_s: float = 90.0) -> bool:
    """Probe backend init + one op in a SUBPROCESS with a hard timeout —
    a wedged TPU hangs device init uninterruptibly, so the probe must be
    killable from outside the interpreter."""
    code = ("import jax, jax.numpy as jnp; "
            "(jnp.ones((8, 8)) @ jnp.ones((8, 8))).block_until_ready(); "
            "print('TPU_OK')")
    try:
        r = subprocess.run([sys.executable, "-c", code],
                           capture_output=True, timeout=timeout_s)
        return b"TPU_OK" in r.stdout
    except Exception:
        return False


_want_cpu = bool(os.environ.get("TPUFEM_BENCH_CPU")) or "--cpu" in sys.argv
if not _want_cpu and os.environ.get("JAX_PLATFORMS", "") not in ("cpu",):
    if not _device_init_alive():
        print(json.dumps({
            "metric": "platform_fallback", "value": 0.0, "unit": "none",
            "vs_baseline": 0.0,
            "note": "device init probe failed (TPU tunnel wedged) — "
                    "falling back to the CPU backend"}), flush=True)
        _want_cpu = True

import jax
import jax.numpy as jnp
import numpy as np

from tpufem.utils.cache import enable_persistent_cache

# the JAX_COMPILATION_CACHE_DIR env var is ignored on this machine; the
# config API works (measured) — without this every driver bench run is
# cache-cold.  Per-platform subdir: CPU smoke runs must not inflate the
# TPU warm/cold probe.
enable_persistent_cache(platform="cpu" if _want_cpu else "tpu")

if _want_cpu:
    # the axon TPU plugin ignores JAX_PLATFORMS; this always works
    jax.config.update("jax_platforms", "cpu")


def left():
    return BUDGET_S - (time.perf_counter() - T0)


_d2h = {"thread": None, "dt": None}


def start_d2h_warmup():
    """Pay the first-D2H penalty on 8 bytes, overlapped with compiles."""

    def run():
        t0 = time.perf_counter()
        np.asarray(jnp.zeros(8))
        _d2h["dt"] = time.perf_counter() - t0

    t = threading.Thread(target=run, daemon=True)
    t.start()
    _d2h["thread"] = t


def d2h_ready():
    t = _d2h["thread"]
    if t is not None and t.is_alive():
        t.join()
    if _d2h["dt"] is not None:
        emit({"metric": "d2h_warmup", "value": round(_d2h["dt"], 1),
              "unit": "s", "vs_baseline": 0.0,
              "note": "first device-to-host fetch latency (platform)"})
        _d2h["dt"] = None


def emit(rec):
    print(json.dumps(rec), flush=True)
    return rec


_BEST = {"rec": None}  # best headline-capable apply line seen so far


def arm_watchdog(deadline_s: float):
    """Daemon thread that, at the wall-clock deadline, re-prints the best
    headline line (or an explicit empty-handed marker) and exits 0 —
    effective even when the main thread is stuck in an uninterruptible
    device call (compile or fetch on a wedged tunnel)."""

    def run():
        time.sleep(max(deadline_s - (time.perf_counter() - T0), 1.0))
        rec = _BEST["rec"] or {
            "metric": "3d_q4_laplace_matrix_free_apply", "value": 0.0,
            "unit": "GDoF/s", "vs_baseline": 0.0,
            "error": "watchdog: no apply tier completed before deadline"}
        rec = dict(rec)
        rec["watchdog_exit"] = True
        rec["elapsed_s"] = round(time.perf_counter() - T0, 1)
        print(json.dumps(rec), flush=True)
        os._exit(0)

    threading.Thread(target=run, daemon=True).start()


def skip(metric, why):
    return emit({"metric": metric, "value": 0.0, "unit": "GDoF/s",
                 "vs_baseline": 0.0, "skipped": why,
                 "elapsed_s": round(time.perf_counter() - T0, 1)})


def err_line(metric, e, unit="GDoF/s"):
    return emit({"metric": metric, "value": 0.0, "unit": unit,
                 "vs_baseline": 0.0,
                 "error": f"{type(e).__name__}: {e}"[:300]})


def chain_rate(apply_fn, x, n_dofs, n_chain=N_CHAIN, n_calls=2,
               n_repeats=1):
    """Sustained GDoF/s over an in-jit chain of n_chain applies.

    apply_fn must be traceable with x as its only traced arg.  Timing
    ends with a scalar D2H fetch — block_until_ready does not reliably
    wait for Pallas-chain programs on this platform (see module doc);
    n_calls chains amortize the post-warmup fetch latency.

    Returns (median GDoF/s, all n_repeats measured rates, compile_s) —
    the headline line records every repeat so the documented ~25%
    run-to-run platform variance stays visible (VERDICT r3 weak item 5).
    """

    @jax.jit
    def chain(v):
        def body(i, v):
            return apply_fn(v) * 1e-7  # rescale: spectral radius >> 1

        return jax.lax.fori_loop(0, n_chain, body, v)

    tc = time.perf_counter()
    y = chain(x)  # compile
    compile_s = time.perf_counter() - tc  # compile + async dispatch
    d2h_ready()
    s = float(jnp.sum(jnp.abs(y)))  # warm + real sync
    if not np.isfinite(s):
        raise FloatingPointError("apply produced non-finite output")
    vals = []
    for _ in range(n_repeats):
        t0 = time.perf_counter()
        for _ in range(n_calls):
            y = chain(x)
        s = float(jnp.sum(jnp.abs(y)))
        dt = (time.perf_counter() - t0) / (n_chain * n_calls)
        if not np.isfinite(s):
            raise FloatingPointError("apply produced non-finite output")
        vals.append(round(n_dofs / dt / 1e9, 4))
    med = sorted(vals)[len(vals) // 2]
    return med, vals, compile_s


def apply_line(metric, gdofs, tier, n_dofs, extra=None, headline=True):
    """headline=True marks a 3D Q4 Laplace apply tier eligible for the
    re-printed headline line; adaptive/curved/2D/vector lines pass False
    so a fast side-metric can never masquerade as the headline."""
    rec = {"metric": metric, "value": round(gdofs, 4), "unit": "GDoF/s",
           "vs_baseline": round(gdofs / BASELINE_GDOFS, 4), "tier": tier,
           "n_dofs": n_dofs,
           "elapsed_s": round(time.perf_counter() - T0, 1)}
    if gdofs > ROOFLINE_GDOFS:
        rec["suspect"] = "above HBM roofline — timing artifact"
    if extra:
        rec.update(extra)
    if headline and "suspect" not in rec and (
            _BEST["rec"] is None or gdofs > _BEST["rec"]["value"]):
        best = dict(rec)
        best["metric"] = "3d_q4_laplace_matrix_free_apply"
        _BEST["rec"] = best
    return emit(rec)


def _flagship(dtype="float32", refine=None, scatter="separable",
              use_pallas=None):
    from tpufem.fem.dof_handler import DoFHandler
    from tpufem.fem.mesh import Mesh
    from tpufem.operators.laplace import LaplaceOperator
    from tpufem.ops.matrix_free import MatrixFree
    from tpufem.utils.config import FemConfig

    on_tpu = jax.devices()[0].platform not in ("cpu",)
    if refine is None:
        refine = int(os.environ.get("TPUFEM_BENCH_REFINE",
                                    "6" if on_tpu else "3"))
    if use_pallas is None:
        use_pallas = on_tpu
    mesh = Mesh.hyper_cube(3, refine)
    dofs = DoFHandler(mesh, 4)
    mf = MatrixFree.build(
        mesh, dofs,
        FemConfig(dim=3, degree=4, dtype=dtype, scatter=scatter,
                  use_pallas=use_pallas),
    )
    return mesh, dofs, mf, LaplaceOperator(mf), refine


def _resident_kernel(refine, mode, dtype="float32"):
    from tpufem.ops.pallas_separable import ResidentSeparable
    from tpufem.ops.separable import global_1d_matrices

    n_ax = 1 << refine
    npts = n_ax * 4 + 1
    K1u, M1u = global_1d_matrices(4, n_ax, 5)
    h = 1.0 / n_ax
    return ResidentSeparable(
        npts, 4, [np.asarray(K1u / h)] * 3, [np.asarray(M1u * h)] * 3,
        dtype, mode=mode,
        interpret=jax.default_backend() == "cpu"), npts**3


def bench_heat(refine, dtype="float32", dt=1e-4, nsteps=5, rtol=1e-6):
    """Implicit-Euler heat stepping on the tensor-product fast tier:
    every step = one resident mass apply + one Jacobi-CG solve of
    (M + dt K) through the fused ResidentTerms kernel (4 terms).  Built
    directly from the 1D factor matrices (no MatrixFree needed: the
    hyper_cube mask / diagonal / initial state are all separable)."""
    from functools import reduce

    from tpufem.operators.tensor_product import helmholtz_separable_terms
    from tpufem.ops.pallas_separable import ResidentTerms
    from tpufem.solvers.resident import resident_jacobi_cg

    p = 4
    n_ax = 1 << refine
    npts = n_ax * p + 1
    interp = jax.default_backend() == "cpu"
    h = np.full(3, 1.0 / n_ax)
    tA = helmholtz_separable_terms(p, 3, p + 1, n_ax, h, 1.0, dt)
    tM = helmholtz_separable_terms(p, 3, p + 1, n_ax, h, 1.0, 0.0)
    jdt = jnp.dtype(dtype)
    A_rk = ResidentTerms(npts, p, tA, dtype, mode="f32", interpret=interp)
    M_rk = ResidentTerms(npts, p, tM, dtype, mode="f32", interpret=interp)
    m1 = np.ones(npts)
    m1[0] = m1[-1] = 0.0
    mask3 = reduce(np.multiply.outer, [m1] * 3).reshape(-1)
    diag = sum(
        reduce(np.multiply.outer, [np.diag(np.asarray(t[b], np.float64))
                                   for b in (2, 1, 0)])
        for t in tA).reshape(-1)
    diag = diag * mask3 + (1.0 - mask3)
    x1 = np.sin(np.pi * np.linspace(0.0, 1.0, npts))
    u0 = reduce(np.multiply.outer, [x1] * 3).reshape(-1) * mask3
    mask = jnp.asarray(mask3, jdt)
    diag_j = jnp.asarray(diag, jdt)
    u = jnp.asarray(u0, jdt)

    class _Shim:  # the resident_jacobi_cg operator contract
        resident = A_rk
        mf = type("MF", (), {"interior_mask": mask})

        def diagonal(self):
            return diag_j

    op = _Shim()
    rhs_fn = jax.jit(
        lambda m_, v: m_ * M_rk.unpad(M_rk.raw(M_rk.pad(v))))

    def step(v):
        rhs = rhs_fn(mask, v)
        res = resident_jacobi_cg(op, rhs, diag=diag_j, rtol=rtol, x0=v)
        return mask * res.x, int(res.iterations), bool(res.converged)

    t0 = time.perf_counter()
    u, _, _ = step(u)  # compile + warm
    jax.block_until_ready(u)
    comp_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    iters = 0
    conv = True
    for _ in range(nsteps):
        u, it, cv = step(u)
        iters += it
        conv = conv and cv
    jax.block_until_ready(u)
    el = time.perf_counter() - t0
    return {"n_dofs": npts**3, "steps_per_s": nsteps / el,
            "ms_per_step": el / nsteps * 1e3,
            "iters_per_step": iters / nsteps, "converged": conv,
            "dt": dt, "rtol": rtol, "compile_s": comp_s}


def main():
    arm_watchdog(BUDGET_S)  # guaranteed final line + exit 0 at deadline
    on_tpu = jax.devices()[0].platform not in ("cpu",)
    start_d2h_warmup()  # overlap the 25-300s first-fetch with compiles

    # ---- cold-start ladder (VERDICT r4 item 1) -------------------------
    # A cold compile cache is catastrophic on this platform: ONE 17M-DoF
    # chain compile was measured to block the (exclusive) TPU tunnel for
    # >20 minutes, and BENCH_r04 recorded 1 of 14 metrics because of it.
    # Probe the persistent cache (which lives in the repo and is primed
    # by builder sessions); when cold, run EVERY section at small scale
    # first — a complete small table beats one big number — then attempt
    # the 17M headline only with leftover budget.
    from tpufem.utils.cache import DEFAULT_DIR as _CACHE_DIR

    _cache_sub = os.path.join(_CACHE_DIR, "cpu" if not on_tpu else "tpu")
    try:
        n_cache = len(os.listdir(_cache_sub))
    except OSError:
        n_cache = 0
    warm = n_cache >= 40
    emit({"metric": "cache_state", "value": float(n_cache),
          "unit": "entries", "vs_baseline": 0.0, "warm": warm,
          "dir": _cache_sub})

    refine = int(os.environ.get("TPUFEM_BENCH_REFINE", "0"))
    if refine == 0:
        refine = 3 if not on_tpu else (6 if warm else 4)
    big = on_tpu and refine >= 6  # full-scale sizes for the side sections
    # (adaptive p/refine, varcoef refine, curved refine, heat refine)
    ap_, ar_ = (4, 4) if big else ((4, 2) if on_tpu else (2, 2))
    # varcoef at 17M: the "~200 s host metric build" that pinned this to
    # refine 5 in round 4 measures 7.2 s this round (re-verified in the
    # round-5 builder session) — the line runs at flagship scale now
    vr_ = 6 if big else (3 if on_tpu else 2)
    cr_ = 5 if big else (3 if on_tpu else 1)
    hr_ = refine if big else (4 if on_tpu else 2)

    # overlap the adaptive sections' host build (mesh / DoFs /
    # constraints / box operator — numpy + small H2D puts) with the
    # first-fetch wait and the headline compiles: on a bad first-fetch
    # draw the main thread sits blocked in d2h with the CPU idle
    from tpufem.apps import bmop

    adaptive_box = {}

    def _prefetch_adaptive():
        try:
            adaptive_box["pre"] = bmop.build_adaptive_op(
                3, ap_, ar_, 2, "float32")
        except Exception as e:  # surfaced by the section that needs it
            adaptive_box["err"] = e

    pre_thread = threading.Thread(target=_prefetch_adaptive, daemon=True)
    pre_thread.start()
    dtype = "float32"
    n_dofs = ((1 << refine) * 4 + 1) ** 3
    reps_note = {"protocol": f"in-jit chain of {N_CHAIN} applies, "
                             "scalar-D2H synced",
                 "budget_s": BUDGET_S}

    tiers, tier_errors = {}, {}
    cold_cache = False

    # ---- 1. HEADLINE FIRST: solver-resident fused kernel applies -------
    # (halo'd layout in/out — the rate chained CG applies sustain;
    # bf16s = bf16-stored vectors, the DMA-halving mode)
    for mode in (("bf16s", "bf16", "f32") if on_tpu else ()):
        name = f"resident-{mode}+pallas"
        if left() < (200 if cold_cache else 60):
            skip("3d_q4_laplace_matrix_free_apply", f"budget: {name}")
            break
        try:
            rk, nd = _resident_kernel(refine, mode, dtype)
            xr = rk.pad(jnp.ones(nd, jnp.dtype(dtype)))
            # median of 3 repeats, all recorded (the headline protocol is
            # pinned — docs/ROOFLINE.md run-to-run variance note)
            gd, vals, comp_s = chain_rate(rk.raw, xr, nd, n_repeats=3)
            tiers[name] = round(gd, 4)
            apply_line("3d_q4_laplace_matrix_free_apply", gd, name, nd,
                       extra={**reps_note, "partial": True,
                              "values": vals,
                              "roofline_pct": {
                                  "vs_copy_floor": round(
                                      100 * gd / COPY_FLOOR_GDOFS[mode], 1),
                                  "vs_mxu_bound": round(
                                      100 * gd / MXU_BOUND_GDOFS, 1)},
                              "compile_s": round(comp_s, 1)})
            if comp_s > 120:  # compile cache is cold on this container
                cold_cache = True
            del rk, xr
            gc.collect()
        except Exception as e:
            tier_errors[name] = f"{type(e).__name__}: {e}"[:300]
            err_line(f"apply_{name}", e)

    # cold-cache fallback (VERDICT r2 item 1d): heavyweight 17M-DoF solve
    # programs compile for minutes on a cold container — drop to refine 5
    # (2.1M DoFs) for the remaining sections and say so.  A smaller
    # headline with a note beats an empty artifact.
    if cold_cache and refine > 5 and "TPUFEM_BENCH_REFINE" not in os.environ:
        refine = 5
        emit({"metric": "cold_cache_refine_drop", "value": 5.0,
              "unit": "refine", "vs_baseline": 0.0,
              "note": "first compile >120s: remaining sections run at "
                      "refine 5 (2.1M DoFs) to fit the budget"})

    # Section order = ROUND-DELTA VALUE under the watchdog budget:
    # lines never yet recorded in a BENCH artifact (adaptive bf16
    # tiers/solves, variable-coefficient, curved, degree sweep) run
    # BEFORE the stable round-3 solve lines — a bad first-fetch draw
    # must shed re-measurements, not new deliverables.
    # ---- 5. adaptive-mesh apply (BASELINE config 4) --------------------
    # (BASELINE deliverables 5-7 run BEFORE the secondary apply tiers:
    # the round-3 dry run showed the two attribution-only tiers eating
    # the last 100 s and budget-skipping all three of these lines)
    adaptive_pre = None
    if left() > 90:
        try:
            pre_thread.join(timeout=max(left() - 60, 1.0))
            if "err" in adaptive_box:
                raise adaptive_box["err"]
            adaptive_pre = adaptive_box.get("pre")
            if adaptive_pre is None:  # prefetch still running: stuck
                raise TimeoutError("adaptive host-build prefetch did "
                                   "not finish within the budget")
            rec = bmop.bench_adaptive(
                3, ap_, ar_, 2, dtype,
                reps=N_CHAIN if on_tpu else 2, prebuilt=adaptive_pre,
                bf16_tier=left() > 150)
            apply_line("3d_adaptive_hanging_nodes_apply",
                       rec["gdofs_per_s"], rec["scheme"], rec["n_dofs"],
                       extra={"n_hanging": rec["n_hanging"],
                              "degree": rec["degree"],
                              "patch_overhead": rec["patch_overhead"],
                              "tiers_gdofs": rec["tiers_gdofs"],
                              "bf16_rel_err": rec.get("bf16_rel_err")},
                       headline=False)
        except Exception as e:
            err_line("3d_adaptive_hanging_nodes_apply", e)
    else:
        skip("3d_adaptive_hanging_nodes_apply", "budget")

    # ---- 7. adaptive whole solves: Jacobi-CG vs adaptive GMG-CG -------
    # (the poisson_mg analogue for adaptive meshes; the V-cycle program
    # over every forest level is the largest compile in this file, but
    # the watchdog guarantees a clean exit if it overruns)
    if left() > 120:
        # the f32 line is emitted via callback BEFORE the bf16-cycle
        # hierarchy is even built (its V-cycle programs are the largest
        # compiles in this file) — a budget overrun or compile failure
        # on the bf16 variant then costs only its own supplement line
        f32_emitted = [False]

        def _emit_adaptive_f32(rec):
            f32_emitted[0] = True
            emit({"metric": "3d_adaptive_gmg_cg_solve",
                  "value": round(rec["gmg_s"], 4), "unit": "s",
                  "vs_baseline": round(rec["gmg_s"], 4),
                  "iterations": rec["gmg_iterations"],
                  "converged": rec["gmg_converged"],
                  "gmg_true_rel_res": rec.get("gmg_true_rel_res"),
                  "jacobi_s": round(rec["jacobi_s"], 4),
                  "jacobi_iterations": rec["jacobi_iterations"],
                  "n_dofs": rec["n_dofs"],
                  "n_hanging": rec["n_hanging"],
                  "levels": rec["levels"], "rtol": rec["rtol"],
                  "elapsed_s": round(time.perf_counter() - T0, 1)})

        try:
            want16 = left() > 240
            rec = bmop.bench_adaptive_solve(
                3, ap_, ar_, 2, dtype,
                prebuilt=adaptive_pre, bf16_cycle=want16,
                emit_cb=_emit_adaptive_f32)
            if not f32_emitted[0]:
                _emit_adaptive_f32(rec)
            if "gmg_bf16cycle_s" in rec:
                emit({"metric": "3d_adaptive_gmg_bf16cycle_solve",
                      "value": round(rec["gmg_bf16cycle_s"], 4),
                      "unit": "s",
                      "vs_baseline": round(rec["gmg_bf16cycle_s"], 4),
                      "iterations": rec["gmg_bf16cycle_iterations"],
                      "converged": rec["gmg_bf16cycle_converged"],
                      "true_rel_res": rec["gmg_bf16cycle_true_rel_res"],
                      "gmg_f32_s": round(rec["gmg_s"], 4),
                      "note": "bf16 V-cycle hierarchy + f32 finest "
                              "defects under the f32 CG (--precond "
                              "gmg-bf16)",
                      "n_dofs": rec["n_dofs"], "rtol": rec["rtol"],
                      "elapsed_s": round(time.perf_counter() - T0, 1)})
            elif want16:
                skip("3d_adaptive_gmg_bf16cycle_solve", "non-f32 dtype")
        except Exception as e:
            if f32_emitted[0]:
                err_line("3d_adaptive_gmg_bf16cycle_solve", e, unit="s")
            else:
                err_line("3d_adaptive_gmg_cg_solve", e, unit="s")
    else:
        skip("3d_adaptive_gmg_cg_solve", "budget")

    # ---- 6c. nonlinear Newton-Krylov whole solve (VERDICT r4 item 2b:
    # the round-4 solver family on the driver-visible record).  The 3D
    # quasilinear problem through NonlinearOperator: AD Jacobian, EW
    # forcing, line search — one jitted program (apps/nonlinear.py).
    if left() > 150:
        try:
            from tpufem.apps.nonlinear import run_nonlinear

            # refine 5 (274k DoFs): refine 6's UNPRECONDITIONED-era inner
            # CG measured >300 s and stalled the priming run; with
            # --precond jacobi and this size the section is ~20 s
            nr_ = 5 if big else (4 if on_tpu else 2)
            out, _ = run_nonlinear(dim=3, degree=2, refine=nr_,
                                   problem="quasilinear", linear="cg",
                                   rtol=1e-6, dtype=dtype,
                                   precond="jacobi")
            emit({"metric": "3d_nonlinear_newton_solve",
                  "value": round(out["solve_s"], 4), "unit": "s",
                  "vs_baseline": round(out["solve_s"], 4),
                  "newton_iterations": out["newton_iterations"],
                  "linear_iterations": out["linear_iterations"],
                  "converged": out["converged"],
                  "residual": out["residual"],
                  "l2_error": out.get("l2_error"),
                  "n_dofs": out["n_dofs"], "rtol": 1e-6,
                  "setup_s": round(out["setup_s"], 1),
                  "elapsed_s": round(time.perf_counter() - T0, 1)})
        except Exception as e:
            err_line("3d_nonlinear_newton_solve", e, unit="s")
    else:
        skip("3d_nonlinear_newton_solve", "budget")

    # ---- 6d. vector-valued elasticity apply (VERDICT r4 items 2b/3) ---
    # The SEPARABLE BLOCK fast tier (operators/tensor_product.py,
    # round 5): per-block ResidentTerms kernels on the exact
    # tensor-product factorization — the generic quadrature tier
    # (vector-incidence) measured 0.015 GDoF/s on this chip (scatter
    # floor) and is reported for attribution at small scale only.
    if left() > 90:
        try:
            from tpufem.fem.dof_handler import DoFHandler
            from tpufem.fem.mesh import Mesh
            from tpufem.operators.tensor_product import (
                SeparableElasticityOperator,
            )
            from tpufem.ops.matrix_free import MatrixFree
            from tpufem.utils.config import FemConfig

            # refine 5 at p=4: 2.1M scalar DoFs x 3 components = 6.4M
            # unknowns; the 9 per-block kernels compile ~8 s each, so
            # the 17M-scalar scale would cost ~3 min of compile alone
            er_ = 5 if big else (4 if on_tpu else 2)
            mesh_e = Mesh.hyper_cube(3, er_)
            dofs_e = DoFHandler(mesh_e, 4)
            mf_e = MatrixFree.build(
                mesh_e, dofs_e,
                FemConfig(3, 4, dtype=dtype, scatter="incidence"))
            op_e = SeparableElasticityOperator(
                mf_e, mu=0.8, lam=1.7, use_pallas=on_tpu,
                mode="bf16s" if on_tpu else "f32")
            tier_e = ("separable-blocks+"
                      + ("resident-bf16s" if op_e.kernels else "xla"))
            xe = jnp.ones((3, dofs_e.n_dofs), jnp.dtype(dtype))
            gd, vals_e, comp_s = chain_rate(
                op_e.vmult_raw, xe, 3 * dofs_e.n_dofs)
            apply_line("3d_elasticity_apply", gd, tier_e,
                       3 * dofs_e.n_dofs,
                       extra={"degree": 4, "n_components": 3,
                              "values": vals_e,
                              "compile_s": round(comp_s, 1)},
                       headline=False)
            del op_e, mf_e, xe
            gc.collect()
        except Exception as e:
            err_line("3d_elasticity_apply", e)
    else:
        skip("3d_elasticity_apply", "budget")

    # ---- 7c. 2D p=4 resident apply, its own recorded line (VERDICT r4
    # item 7: BASELINE's "2D & 3D" parity language deserves a 2D rate on
    # the record).  refine 10 = npts 4097, 16.8M DoFs — flagship scale;
    # the block-tridiagonal x sweep keeps the operator O(p) in VMEM.
    if on_tpu and left() > 90:
        try:
            r2 = 10 if big else 7
            rec = bmop.bench_resident(4, r2, dtype, N_CHAIN,
                                      mode="bf16s", dim=2)
            apply_line("apply_2d_resident", rec["gdofs_per_s"],
                       "resident-bf16s+pallas (2D)", rec["n_dofs"],
                       extra={"degree": 4, "refine": r2},
                       headline=False)
        except Exception as e:
            err_line("apply_2d_resident", e)
    elif on_tpu:
        skip("apply_2d_resident", "budget")

    # ---- 6b. implicit heat stepping on the tensor-product fast tier ---
    # (the mass/Helmholtz family at flagship rates: each implicit-Euler
    # step = resident mass apply + ~12-iteration Jacobi-CG on M + dt K
    # through the 4-term ResidentTerms kernel — operators/tensor_product)
    if left() > 100:
        try:
            rec = bench_heat(hr_, dtype, nsteps=5 if on_tpu else 2)
            emit({"metric": "3d_heat_implicit_step",
                  "value": round(rec["steps_per_s"], 3),
                  "unit": "steps/s",
                  "vs_baseline": round(rec["steps_per_s"], 3),
                  "ms_per_step": round(rec["ms_per_step"], 2),
                  "iters_per_step": rec["iters_per_step"],
                  "converged": rec["converged"],
                  "n_dofs": rec["n_dofs"], "dt": rec["dt"],
                  "rtol": rec["rtol"], "tier": "resident-terms+pallas",
                  "compile_s": round(rec["compile_s"], 1),
                  "elapsed_s": round(time.perf_counter() - T0, 1)})
        except Exception as e:
            err_line("3d_heat_implicit_step", e, unit="steps/s")
    else:
        skip("3d_heat_implicit_step", "budget")

    # ---- 6b. variable-coefficient apply (BASELINE config 5) ------------
    # separable smooth coefficient through the exactly-factored terms +
    # ResidentTerms kernel; per-qpoint structured tier for attribution.
    # refine 5 (2.1M DoFs) on chip: the 17M per-qpoint tier's HOST
    # metric build alone costs ~200 s (cache-immune) — the 17M rates
    # (3.6 f32 / 7.1 bf16s / 8.8 measured) live in docs/ROOFLINE.md
    if left() > 110:
        try:
            # at 17M, measure the exact-class f32 and the fast bf16s
            # tiers only: each extra mode costs a 17M MatrixFree build +
            # kernel H2D (~60 s) and the bf16 middle mode adds no
            # deliverable (its rate sits between the two)
            rec = bmop.bench_varcoef(3, 4 if on_tpu else 2, vr_, dtype,
                                     reps=N_CHAIN if on_tpu else 2,
                                     modes=("f32", "bf16s") if big
                                     else None,
                                     attr_refine=5 if big else None)
            apply_line("3d_q4_variable_coef_apply", rec["gdofs_per_s"],
                       rec["scheme"], rec["n_dofs"],
                       extra={"coefficient": rec["coefficient"],
                              "tiers_gdofs": rec["tiers_gdofs"]},
                       headline=False)
        except Exception as e:
            err_line("3d_q4_variable_coef_apply", e)
    else:
        skip("3d_q4_variable_coef_apply", "budget")

    # ---- 6. curved-geometry apply (3D shell) ---------------------------
    # (cheap new-deliverable lines run BEFORE the ~70 s adaptive host
    # setup so a bad first-fetch draw cannot starve them)
    if left() > 55:
        try:
            rec = bmop.bench_curved(3, 4 if on_tpu else 2, cr_, dtype,
                                    reps=N_CHAIN if on_tpu else 2)
            apply_line("3d_shell_curved_apply", rec["gdofs_per_s"],
                       rec["scheme"], rec["n_dofs"],
                       extra={"degree": rec["degree"],
                              "tiers_gdofs": rec["tiers_gdofs"]},
                       headline=False)
        except Exception as e:
            err_line("3d_shell_curved_apply", e)
    else:
        skip("3d_shell_curved_apply", "budget")





    # ---- 2. separable apply + whole-solve benchmarks -------------------
    # (solves FIRST among the non-headline sections: they are a BASELINE
    # deliverable, while the secondary apply tiers only add attribution —
    # the round-2 ordering let tier compiles eat the solve budget.
    # The separable op is built ONCE and serves both its apply line and
    # the Jacobi solve.)
    solve_rtol = 1e-5
    if left() > 120:
        try:
            from tpufem.solvers.cg import cg_solve

            name = "separable+pallas" if on_tpu else "structured"
            solve_tier = name
            _, dofs, _, op_s, _ = _flagship(
                dtype, refine, "separable" if on_tpu else "structured",
                on_tpu)
            x = jnp.ones(dofs.n_dofs, jnp.dtype(dtype))
            dp = op_s.device_args
            gd, _, _ = chain_rate(lambda v: op_s.vmult_raw_with(dp, v), x,
                               dofs.n_dofs)
            tiers[name] = round(gd, 4)
            apply_line(f"apply_{name}", gd, name, dofs.n_dofs)
            del x, dp
            diag = op_s.diagonal()
            rng = np.random.default_rng(7)
            mask = np.asarray(op_s.mf.interior_mask, np.float64)
            b = jnp.asarray(mask * rng.standard_normal(dofs.n_dofs),
                            jnp.dtype(dtype))
            inv_diag = 1.0 / diag
            # track_best=False: see the resident section note
            solve = jax.jit(lambda dp_, id_, b_: cg_solve(
                lambda v: op_s.vmult_with(dp_, v), b_,
                M_inv=lambda r: id_ * r, rtol=solve_rtol,
                track_best=False))
            sargs = (op_s.device_args, inv_diag)
            int(solve(*sargs, b).iterations)  # compile+warm, D2H sync
            t0 = time.perf_counter()
            res = solve(*sargs, b)
            iters = int(res.iterations)  # D2H sync ends the timing
            t_jac = time.perf_counter() - t0
            emit({
                "metric": "3d_q4_jacobi_cg_solve",
                "value": round(t_jac, 4), "unit": "s",
                "vs_baseline": round(t_jac, 4),
                "iterations": iters,
                "converged": bool(res.converged),
                "residual": float(res.residual),
                "rtol": solve_rtol, "n_dofs": dofs.n_dofs,
                "tier": solve_tier,
                "elapsed_s": round(time.perf_counter() - T0, 1),
            })
            del op_s, diag, b, solve, res, sargs, inv_diag
            gc.collect()
        except Exception as e:
            err_line("3d_q4_jacobi_cg_solve", e, unit="s")
    else:
        skip("3d_q4_jacobi_cg_solve", "budget")

    mg = b = None
    if on_tpu and left() > 150:
        try:
            from tpufem.solvers.cg import cg_solve
            from tpufem.solvers.multigrid import GeometricMultigrid

            # pallas_mode='bf16' puts the RESIDENT kernel (section 4) on
            # the bf16x3 x-matmul (~3e-6 operator class, measured same
            # iteration counts as f32 at rtol 1e-5 —
            # scripts/resident_mask_lab.py); the flat solve lines in THIS
            # section use the pad/unpad kernel, which ignores the mode.
            # pallas_dirichlet defaults to auto -> fused boundary mask.
            mg = GeometricMultigrid(3, 4, refine, coarsest_refine=1,
                                    dtype=dtype, use_pallas=True,
                                    pallas_mode="bf16")
            rng = np.random.default_rng(7)
            mask = np.asarray(mg.fine.mask, np.float64)
            nd = mg.fine.mf.n_dofs
            b = jnp.asarray(mask * rng.standard_normal(nd),
                            jnp.dtype(dtype))
            solve_mg = jax.jit(lambda dp_, gdp_, b_: cg_solve(
                lambda v: mg.fine.op.vmult_with(dp_, v), b_,
                M_inv=lambda r: mg.preconditioner_with(gdp_, r),
                rtol=solve_rtol))
            if left() > 270:
                margs = (mg.fine.op.device_args, mg.device_args)
                int(solve_mg(*margs, b).iterations)  # compile+warm, sync
                t0 = time.perf_counter()
                res_mg = solve_mg(*margs, b)
                iters = int(res_mg.iterations)  # D2H sync ends timing
                t_mg = time.perf_counter() - t0
                emit({
                    "metric": "3d_q4_gmg_cg_solve",
                    "value": round(t_mg, 4), "unit": "s",
                    "vs_baseline": round(t_mg, 4),
                    "iterations": iters,
                    "converged": bool(res_mg.converged),
                    "residual": float(res_mg.residual),
                    "rtol": solve_rtol, "n_dofs": nd,
                    "tier": "separable+pallas",
                    "elapsed_s": round(time.perf_counter() - T0, 1),
                })
                del solve_mg, res_mg, margs
                gc.collect()
            else:
                # budget squeezed (e.g. a 170 s first-fetch draw): the
                # resident GMG-CG line (section 4) still reports the
                # V-cycle solve; only the flat program is shed
                skip("3d_q4_gmg_cg_solve", "budget: flat V-cycle "
                     "program shed, resident GMG line still runs")
        except Exception as e:
            err_line("3d_q4_gmg_cg_solve", e, unit="s")
            mg = b = None
    elif on_tpu:
        skip("3d_q4_gmg_cg_solve", "budget")

    # ---- 4. solver-resident solves, INLINE -----------------------------
    # (round-2 ran these in fresh subprocesses around the "bimodal
    # platform" quirk; round 3 root-caused that to closure-constant
    # D2H at lowering + the first-fetch penalty — both fixed/paid in
    # this process, so inline is faster AND stable.  The GMG-resident
    # line reports 3 runs so drift stays visible, VERDICT r2 item 8.)
    if on_tpu and left() > 90 and mg is not None:
        try:
            from tpufem.solvers.resident import (
                resident_gmg_cg,
                resident_jacobi_cg,
            )

            op_r = mg.fine.op

            def true_rel_residual(x):
                # recompute ONE true residual with the flat pad/unpad
                # kernel (f32 operator class — it ignores pallas_mode),
                # OUTSIDE any timing: the resident bf16x3 kernel's
                # recurrence residual describes the ~3e-6-perturbed
                # operator, not the f32 one (ADVICE r3)
                dpf = op_r.device_args
                rt = b - op_r.vmult_with(dpf, jnp.asarray(x, b.dtype))
                hp = jax.lax.Precision.HIGHEST
                return float(jnp.sqrt(jnp.dot(rt, rt, precision=hp))
                             / jnp.sqrt(jnp.dot(b, b, precision=hp)))

            diag_r = mg.fine.op.diagonal()
            # track_best=False: drop the best-iterate carry (~0.4 ms/iter
            # of HBM traffic, measured scripts/cg_blas1_lab.py) — a
            # converging solve returns the identical result
            int(resident_jacobi_cg(
                op_r, b, diag=diag_r, rtol=solve_rtol,
                track_best=False).iterations)
            t0 = time.perf_counter()
            res = resident_jacobi_cg(op_r, b, diag=diag_r,
                                     rtol=solve_rtol, track_best=False)
            iters = int(res.iterations)
            dt = time.perf_counter() - t0
            emit({"metric": "3d_q4_jacobi_cg_solve_resident",
                  "value": round(dt, 4), "unit": "s",
                  "vs_baseline": round(dt, 4), "iterations": iters,
                  "converged": bool(res.converged),
                  "residual": float(res.residual),
                  "true_rel_residual": true_rel_residual(res.x),
                  "operator_class":
                      f"{mg.fine.mf.resident.mode} kernel recurrence",
                  "rtol": solve_rtol,
                  "n_dofs": mg.fine.mf.n_dofs,
                  "tier": f"resident-{mg.fine.mf.resident.mode}+pallas",
                  "elapsed_s": round(time.perf_counter() - T0, 1)})
        except Exception as e:
            err_line("3d_q4_jacobi_cg_solve_resident", e, unit="s")
        try:
            vals = []
            int(resident_gmg_cg(mg, b, rtol=solve_rtol,
                                track_best=False).iterations)
            for _ in range(3):
                if left() < 60:
                    break
                t0 = time.perf_counter()
                res = resident_gmg_cg(mg, b, rtol=solve_rtol,
                                      track_best=False)
                iters = int(res.iterations)
                vals.append(round(time.perf_counter() - t0, 4))
            if vals:
                med = sorted(vals)[len(vals) // 2]
                emit({"metric": "3d_q4_gmg_cg_solve_resident",
                      "value": med, "unit": "s", "vs_baseline": med,
                      "values": vals, "iterations": iters,
                      "converged": bool(res.converged),
                      "residual": float(res.residual),
                      "true_rel_residual": true_rel_residual(res.x),
                      "operator_class":
                          f"{mg.fine.mf.resident.mode} kernel recurrence",
                      "rtol": solve_rtol, "n_dofs": mg.fine.mf.n_dofs,
                      "tier": "resident+pallas (median of 3 inline)",
                      "elapsed_s": round(time.perf_counter() - T0, 1)})
        except Exception as e:
            err_line("3d_q4_gmg_cg_solve_resident", e, unit="s")
        del mg, b
        gc.collect()
    elif on_tpu:
        skip("3d_q4_jacobi_cg_solve_resident", "budget or no GMG state")
        skip("3d_q4_gmg_cg_solve_resident", "budget or no GMG state")

    # ---- 7b. fast-tier degree sweep (the reference's bmop north-star is
    # the per-degree TABLE, not one point — SURVEY.md §2 'Operator
    # benchmark'; VERDICT r3 missing item 3).  Resident kernel, bf16s
    # (headline mode), refine per degree to keep 2-17M DoFs; partial
    # tables are emitted if the budget runs out mid-sweep.
    if on_tpu and left() > 150:
        sweep, sweep_err = {}, {}
        for p_ in (2, 3, 4, 5, 6, 7):
            if left() < 90:
                sweep_err[str(p_)] = "budget"
                continue
            r_ = (6 if p_ <= 4 else 5) if big else 3
            try:
                rec = bmop.bench_resident(p_, r_, dtype, N_CHAIN,
                                          mode="bf16s")
                sweep[str(p_)] = {"gdofs": round(rec["gdofs_per_s"], 3),
                                  "refine": r_, "n_dofs": rec["n_dofs"]}
            except Exception as e:
                sweep_err[str(p_)] = f"{type(e).__name__}: {e}"[:120]
        val = sweep.get("4", {}).get("gdofs", 0.0)
        emit({"metric": "resident_degree_sweep", "value": val,
              "unit": "GDoF/s", "vs_baseline": val,
              "note": "value = 3D p=4; full per-degree table attached",
              "mode": "bf16s", "sweep_3d": sweep,
              "errors": sweep_err,
              "elapsed_s": round(time.perf_counter() - T0, 1)})
    elif on_tpu:
        skip("resident_degree_sweep", "budget")

    # ---- 8. secondary apply tiers (attribution only — LAST) ------------
    tier_specs = [("separable", False)]
    if on_tpu:
        tier_specs.append(("structured", False))
    for scheme, pallas in tier_specs:
        name = scheme + ("+pallas" if pallas else "")
        if left() < 60:
            skip(f"apply_{name}", "budget")
            continue
        try:
            _, dofs, _, op, _ = _flagship(dtype, refine, scheme, pallas)
            x = jnp.ones(dofs.n_dofs, jnp.dtype(dtype))
            dp = op.device_args
            gd, _, _ = chain_rate(lambda v: op.vmult_raw_with(dp, v), x,
                               dofs.n_dofs)
            tiers[name] = round(gd, 4)
            apply_line(f"apply_{name}", gd, name, dofs.n_dofs)
            del op, x, dp
            gc.collect()
        except Exception as e:
            tier_errors[name] = f"{type(e).__name__}: {e}"[:300]
            err_line(f"apply_{name}", e)

    # ---- cold-ladder upgrade: with the complete small table recorded,
    # attempt the flagship 17M headline on the remaining budget.  The
    # watchdog re-prints the best completed line and exits 0 if this
    # compile overruns the deadline (measured: a cold 17M chain compile
    # can block the exclusive TPU tunnel for >20 min).
    # Progressive: refine 5 (2.1M) first — its compile was seconds-class
    # at refine 4 and the cost grows with the kernel's npts; attempt the
    # 17M shape only if the 2.1M compile stayed cheap AND ample budget
    # remains (a cold 17M chain compile measured >20 min).
    if on_tpu and not warm and refine < 5:
        # gates measured cold on chip: refine 5 costs ~65 s end-to-end
        # (compile 8 s); refine 6 (17M) compiles in ~12 s on an IDLE
        # machine but was measured >20 min when other processes starve
        # the compile — attempt it after the safe refine-5 line, relying
        # on the watchdog to re-print the best completed line at the
        # deadline if it stalls
        for r_up, need in ((5, 110), (6, 150)):
            if left() < need:
                break
            try:
                rk, nd = _resident_kernel(r_up, "bf16s", dtype)
                xr = rk.pad(jnp.ones(nd, jnp.dtype(dtype)))
                gd, vals, comp_s = chain_rate(rk.raw, xr, nd, n_repeats=3)
                tiers[f"resident-bf16s+pallas@r{r_up}"] = round(gd, 4)
                apply_line(
                    "3d_q4_laplace_matrix_free_apply", gd,
                    "resident-bf16s+pallas", nd,
                    extra={**reps_note, "partial": True, "values": vals,
                           "scale": f"refine-{r_up} upgrade after cold "
                                    "ladder",
                           "roofline_pct": {
                               "vs_copy_floor": round(
                                   100 * gd / COPY_FLOOR_GDOFS["bf16s"],
                                   1),
                               "vs_mxu_bound": round(
                                   100 * gd / MXU_BOUND_GDOFS, 1)},
                           "compile_s": round(comp_s, 1)})
                del rk, xr
                gc.collect()
                if comp_s > 90:  # the next shape up will only be worse
                    break
            except Exception as e:
                tier_errors[f"upgrade-r{r_up}"] = (
                    f"{type(e).__name__}: {e}"[:300])
                err_line(f"apply_resident-bf16s@r{r_up}", e)
                break

    # ---- headline line LAST (driver parses the last line) --------------
    # Re-emit the best headline-eligible record VERBATIM (it carries the
    # pinned protocol: values[], roofline_pct, compile_s — VERDICT r4
    # item 1c) plus the tier table.
    if _BEST["rec"] is None:
        emit({"metric": "3d_q4_laplace_matrix_free_apply", "value": 0.0,
              "unit": "GDoF/s", "vs_baseline": 0.0,
              "error": ("no apply tier completed (budget/skips)"
                        if not tier_errors else
                        f"all apply tiers failed: {tier_errors}"[:300]),
              "elapsed_s": round(time.perf_counter() - T0, 1)})
        sys.exit(0 if not tier_errors else 1)
    rec = dict(_BEST["rec"])
    rec.update(reps_note)
    rec["tiers"] = tiers
    rec["tier_errors"] = tier_errors
    rec["cache_entries_at_start"] = n_cache
    rec["elapsed_s"] = round(time.perf_counter() - T0, 1)
    emit(rec)


def resident_jacobi():
    """Fresh-process solver-resident Jacobi-CG (prints one JSON line)."""
    from tpufem.solvers.resident import resident_jacobi_cg

    refine = int(os.environ.get("TPUFEM_BENCH_REFINE", "6"))
    solve_rtol = 1e-5
    _, dofs, _, op_s, _ = _flagship("float32", refine, "separable", True)
    diag = op_s.diagonal()
    rng = np.random.default_rng(7)
    mask = np.asarray(op_s.mf.interior_mask, np.float64)
    b = jnp.asarray(mask * rng.standard_normal(dofs.n_dofs), jnp.float32)
    for mode in ("f32", "bf16"):
        try:
            if mode == "bf16":
                rk, _ = _resident_kernel(refine, "bf16")
                op_s.mf.resident = rk
            jax.block_until_ready(resident_jacobi_cg(
                op_s, b, diag=diag, rtol=solve_rtol).x)  # compile + warm
            t0 = time.perf_counter()
            res = resident_jacobi_cg(op_s, b, diag=diag, rtol=solve_rtol)
            jax.block_until_ready(res.x)
            dt = round(time.perf_counter() - t0, 4)
            emit({"metric": "3d_q4_jacobi_cg_solve_resident",
                  "value": dt, "unit": "s", "vs_baseline": dt,
                  "iterations": int(res.iterations),
                  "converged": bool(res.converged),
                  "residual": float(res.residual), "rtol": solve_rtol,
                  "n_dofs": dofs.n_dofs,
                  "tier": f"resident-{mode}+pallas (fresh process)"})
        except Exception as e:
            err_line(f"3d_q4_jacobi_cg_solve_resident_{mode}", e,
                     unit="s")


def resident_gmg():
    """Fresh-process resident-GMG CG, ONE timed run (the parent takes the
    median of three of these)."""
    from tpufem.solvers.multigrid import GeometricMultigrid
    from tpufem.solvers.resident import resident_gmg_cg

    refine = int(os.environ.get("TPUFEM_BENCH_REFINE", "6"))
    solve_rtol = 1e-5
    try:
        mg = GeometricMultigrid(3, 4, refine, coarsest_refine=1,
                                dtype="float32", use_pallas=True)
        rng = np.random.default_rng(7)
        mask = np.asarray(mg.fine.mask, np.float64)
        nd = mg.fine.mf.n_dofs
        b = jnp.asarray(mask * rng.standard_normal(nd), jnp.float32)
        jax.block_until_ready(
            resident_gmg_cg(mg, b, rtol=solve_rtol).x)  # compile + warm
        t0 = time.perf_counter()
        res = resident_gmg_cg(mg, b, rtol=solve_rtol)
        jax.block_until_ready(res.x)
        dt = round(time.perf_counter() - t0, 4)
        emit({"metric": "3d_q4_gmg_cg_solve_resident_once",
              "value": dt, "unit": "s", "vs_baseline": dt,
              "iterations": int(res.iterations),
              "converged": bool(res.converged),
              "residual": float(res.residual), "rtol": solve_rtol,
              "n_dofs": nd, "tier": "resident+pallas (fresh process)"})
    except Exception as e:
        err_line("3d_q4_gmg_cg_solve_resident_once", e, unit="s")


if __name__ == "__main__":
    if "--resident-jacobi" in sys.argv:
        resident_jacobi()
    elif "--resident-gmg" in sys.argv:
        resident_gmg()
    else:
        main()
