#!/usr/bin/env python
"""On-chip lab: where do the resident CG's non-apply ms/iteration go?

The flagship resident Jacobi-CG measures ~6.2 ms/iteration of which the
apply sustains 2.3-3.2 ms — the rest is BLAS-1 on the 29M-element halo'd
vectors (117 MB f32 each).  One full HBM pass at the ~819 GB/s roofline
is ~0.14 ms; at the measured ~500 GB/s streaming rate ~0.23 ms.  This
script times, as sustained in-jit fori_loop rates on arrays of the
flagship resident shape:

  1. a single axpy pass            (read 2N, write N)
  2. a single HIGHEST dot          (read 2N)
  3. the FULL cg_solve body with A = identity (the exact production
     body: alpha/beta recurrences, stall tracking on/off, Jacobi M_inv)
  4. a hand-fused body variant (same math, fewer logical ops)

Prints one JSON line per measurement.  Run on the chip:
  python scripts/cg_blas1_lab.py [--shape 272 280 384] [--iters 40]
"""

import argparse
import json
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_tpu")

import jax
import jax.numpy as jnp

from tpufem.utils.cache import enable_persistent_cache

enable_persistent_cache()
import numpy as np


def emit(**kw):
    print(json.dumps(kw), flush=True)


def timed_loop(name, body, state, iters, passes_per_iter, nbytes,
               consts=()):
    """Sustained s/iter of an in-jit fori_loop of `body`; scalar-D2H
    synced (block_until_ready does not reliably wait on this platform).

    ``consts``: device arrays the body reads — threaded as jit ARGUMENTS
    (never jnp closure constants, which intermittently hang this
    platform's remote-TPU lowering; docs/ROOFLINE.md platform quirks)."""

    @jax.jit
    def chain(s, *cs):
        return jax.lax.fori_loop(0, iters, lambda i, s_: body(s_, *cs), s)

    out = chain(state, *consts)  # compile + warm
    leaves = jax.tree_util.tree_leaves(out)
    float(jnp.sum(leaves[0].reshape(-1)[:8]))  # sync
    t0 = time.perf_counter()
    out = chain(state, *consts)
    leaves = jax.tree_util.tree_leaves(out)
    float(jnp.sum(leaves[0].reshape(-1)[:8]))  # sync on the timed run
    dt = (time.perf_counter() - t0) / iters
    gbps = passes_per_iter * nbytes / dt / 1e9
    emit(check=name, s_per_iter=round(dt, 6),
         ms_per_iter=round(dt * 1e3, 3),
         eff_gbps_at_assumed_passes=round(gbps, 1),
         assumed_passes=passes_per_iter)
    return dt


def main(shape, iters):
    rng = np.random.default_rng(0)
    n = int(np.prod(shape))
    nbytes = 4 * n
    emit(check="config", shape=list(shape), elements=n,
         mbytes_per_vector=round(nbytes / 1e6, 1),
         platform=jax.devices()[0].platform)

    x = jnp.asarray(rng.standard_normal(shape), jnp.float32)
    p = jnp.asarray(rng.standard_normal(shape), jnp.float32)
    idiag = jnp.asarray(1.0 + 0.1 * rng.standard_normal(shape) ** 2,
                        jnp.float32)

    # 1. axpy chain: x <- x + a*p (a varies per iter so nothing hoists)
    def axpy_body(s, p_):
        x_, k = s
        return (x_ + (0.5 + 1e-6 * k) * p_, k + 1.0)

    timed_loop("axpy_pass", axpy_body, (x, jnp.float32(0)), iters,
               passes_per_iter=3, nbytes=nbytes, consts=(p,))

    # 2. HIGHEST dot chain (result feeds next iter so nothing hoists)
    def dot_body(s, x_, p_):
        acc, k = s
        v = jnp.dot(x_.reshape(-1), (p_ + acc * 1e-20).reshape(-1),
                    precision=jax.lax.Precision.HIGHEST)
        return (v, k + 1.0)

    timed_loop("dot_highest", dot_body, (jnp.float32(0), jnp.float32(0)),
               iters, passes_per_iter=2, nbytes=nbytes, consts=(x, p))

    # 2b. default-precision dot
    def dotd_body(s, x_, p_):
        acc, k = s
        v = jnp.dot(x_.reshape(-1), (p_ + acc * 1e-20).reshape(-1))
        return (v, k + 1.0)

    timed_loop("dot_default", dotd_body, (jnp.float32(0), jnp.float32(0)),
               iters, passes_per_iter=2, nbytes=nbytes, consts=(x, p))

    # 3. full production CG body, A = identity-ish (1 cheap pass).
    from tpufem.solvers.cg import cg_solve

    def run_cg(track_best, name):
        def A(v):
            return v * 1.0000001  # 1 read + 1 write pass

        t0 = time.perf_counter()

        @jax.jit
        def solve(b, idiag_):
            return cg_solve(A, b, M_inv=lambda r: idiag_ * r,
                            rtol=1e-30, maxiter=iters,
                            track_best=track_best,
                            dot=lambda a_, b_: jnp.dot(
                                a_.reshape(-1), b_.reshape(-1),
                                precision=jax.lax.Precision.HIGHEST))

        res = solve(p, idiag)
        float(res.residual)
        compile_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        res = solve(p, idiag)
        float(res.residual)
        dt = (time.perf_counter() - t0) / iters
        emit(check=name, ms_per_iter=round(dt * 1e3, 3),
             iters=int(res.iterations), compile_s=round(compile_s, 1),
             note="production cg_solve body, A = 2-pass identity")
        return dt

    run_cg(True, "cg_body_track_best")
    run_cg(False, "cg_body_no_track")

    # 4. hand-fused body: same recurrences, ops arranged to give XLA the
    # best shot at multi-output fusion (single expression per vector).
    def fused_body(s, idiag_):
        x_, r, pv_, rz, k = s
        v = pv_ * 1.0000001  # stand-in apply (pv_ reused as p)
        pv = jnp.vdot(pv_.reshape(-1), v.reshape(-1),
                      precision=jax.lax.Precision.HIGHEST)
        alpha = rz / pv
        x2 = x_ + alpha * pv_
        r2 = r - alpha * v
        z2 = idiag_ * r2
        rz2 = jnp.vdot(r2.reshape(-1), z2.reshape(-1),
                       precision=jax.lax.Precision.HIGHEST)
        beta = rz2 / rz
        p2 = z2 + beta * pv_
        return (x2, r2, p2, rz2, k + 1.0)

    timed_loop("hand_fused_body", fused_body,
               (x, p, p, jnp.float32(1.0), jnp.float32(0)), iters,
               passes_per_iter=12, nbytes=nbytes, consts=(idiag,))


if __name__ == "__main__":
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--shape", type=int, nargs=3, default=[272, 280, 384])
    ap.add_argument("--iters", type=int, default=40)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    main(tuple(args.shape), args.iters)
