#!/usr/bin/env python
"""Dated re-probe of the two standing toolchain blocks (VERDICT r4 item 6).

Both the headline gap (31% of the MXU schedule bound) and the
general-metric tier's 10x gap hang on two Mosaic limitations measured in
rounds 2-3.  This script re-tests them against the CURRENT toolchain in
~a minute so each round can record "moved / unchanged" in
docs/ROOFLINE.md instead of assuming permanence:

1. ``Precision.HIGH`` dots inside a Pallas kernel (a 3-pass bf16x3
   x-matmul would cut the f32-HIGHEST 6-pass cost in half);
2. VPU<->MXU co-scheduling: whether Mosaic overlaps an independent
   elementwise (VPU) stream with a matmul (MXU) stream in one kernel —
   measured as t(mxu+vpu) vs t(mxu)+t(vpu) on independent buffers.

Run ON the TPU:  python scripts/toolchain_probe.py
"""

import functools
import json
import time

import jax
import jax.numpy as jnp

from tpufem.utils.cache import enable_persistent_cache

enable_persistent_cache()
import numpy as np
from jax.experimental import pallas as pl


def probe_high_precision():
    """Try to lower a Pallas kernel whose dot pins Precision.HIGH."""

    def kernel(a_ref, b_ref, o_ref):
        o_ref[...] = jax.lax.dot_general(
            a_ref[...], b_ref[...], (((1,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGH,
            preferred_element_type=jnp.float32)

    a = jnp.ones((256, 256), jnp.float32)
    try:
        out = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((256, 256), jnp.float32),
        )(a, a)
        out.block_until_ready()
        return {"probe": "pallas_precision_high", "supported": True,
                "note": "HIGH dots now lower — reopen the bf16x3 "
                        "x-matmul kernel (ROOFLINE.md round-3 plan)"}
    except Exception as e:
        return {"probe": "pallas_precision_high", "supported": False,
                "error": f"{type(e).__name__}: {e}"[:200]}


def _time(fn, x, reps=4):
    # warm INCLUDING a scalar D2H fetch: the first fetch in a process
    # costs 25-300s on this platform and must not land inside a timing
    float(jnp.sum(jnp.abs(fn(x))))
    t0 = time.perf_counter()
    for _ in range(reps):
        y = fn(x)
    float(jnp.sum(jnp.abs(y)))
    return (time.perf_counter() - t0) / reps


def probe_co_scheduling(n_iter=256, m=512):
    """t(mxu+vpu) ~ t(mxu)+t(vpu) means NO co-scheduling (serial units);
    ~ max(...) means the units overlap.  Streams touch INDEPENDENT
    buffers so no data dependency forces serialization."""

    def k_mxu(a_ref, w_ref, o_ref, v_ref, vo_ref):
        acc = a_ref[...]
        for _ in range(n_iter):
            acc = jnp.dot(acc, w_ref[...],
                          preferred_element_type=jnp.float32)
        o_ref[...] = acc
        vo_ref[...] = v_ref[...]

    def k_vpu(a_ref, w_ref, o_ref, v_ref, vo_ref):
        v = v_ref[...]
        for _ in range(n_iter * 4):
            v = v * 1.000001 + 1e-7
        vo_ref[...] = v
        o_ref[...] = a_ref[...]

    def k_both(a_ref, w_ref, o_ref, v_ref, vo_ref):
        acc = a_ref[...]
        v = v_ref[...]
        for _ in range(n_iter):
            acc = jnp.dot(acc, w_ref[...],
                          preferred_element_type=jnp.float32)
            for _ in range(4):
                v = v * 1.000001 + 1e-7
        o_ref[...] = acc
        vo_ref[...] = v

    a = jnp.full((m, m), 1e-3, jnp.float32)
    w = jnp.eye(m, dtype=jnp.float32) * 0.999
    v = jnp.ones((m, m), jnp.float32)
    n_chain = 16  # in-jit chain amortizes the ~7 ms dispatch tax

    def call(kern):
        f = pl.pallas_call(
            kern,
            out_shape=(jax.ShapeDtypeStruct((m, m), jnp.float32),
                       jax.ShapeDtypeStruct((m, m), jnp.float32)),
        )

        @jax.jit
        def g(a_, w_, v_):
            def body(_, carry):
                o, vo = f(carry[0], w_, carry[1])
                return (o * 0.5 + a_ * 0.5, vo * 0.5 + v_ * 0.5)

            return jax.lax.fori_loop(0, n_chain, body, (a_, v_))

        def run(x):
            o, vo = g(a, w, v)
            return o + vo

        return _time(run, None) / n_chain

    t_mxu = call(k_mxu)
    t_vpu = call(k_vpu)
    t_both = call(k_both)
    overlap = (t_mxu + t_vpu - t_both) / max(min(t_mxu, t_vpu), 1e-9)
    return {"probe": "vpu_mxu_co_scheduling",
            "t_mxu_ms": round(t_mxu * 1e3, 3),
            "t_vpu_ms": round(t_vpu * 1e3, 3),
            "t_both_ms": round(t_both * 1e3, 3),
            "overlap_fraction": round(float(overlap), 3),
            "co_scheduled": bool(overlap > 0.5),
            "note": "overlap ~1 = full co-schedule; ~0 = serial units"}


if __name__ == "__main__":
    print(json.dumps({"date": time.strftime("%Y-%m-%d"),
                      "platform": jax.devices()[0].platform,
                      "jax": jax.__version__}), flush=True)
    print(json.dumps(probe_high_precision()), flush=True)
    try:
        print(json.dumps(probe_co_scheduling()), flush=True)
    except Exception as e:
        print(json.dumps({"probe": "vpu_mxu_co_scheduling",
                          "error": f"{type(e).__name__}: {e}"[:200]}),
              flush=True)
