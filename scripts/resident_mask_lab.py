#!/usr/bin/env python
"""On-chip A/B: flat vs fused Dirichlet mask in the resident Jacobi-CG.

The resident CG's operator is y = m·A(m·x) + (1-m)·x; the flat path
spends 2 full HBM elementwise passes per apply on the two mask
applications (the round-2 verdict's unimplemented Jacobi-CG lever).
``ResidentSeparable(dirichlet=True)`` fuses both into the kernel as
separable iota-mask products on VMEM tiles (ops/pallas_separable.py).
This script measures both variants back-to-back on the chip and prints
one JSON line per variant plus a verdict line.

Run:  python scripts/resident_mask_lab.py [--refine 6] [--mode bf16]
(refine 6 = 17M DoFs flagship; needs the TPU tunnel alive.)
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


def run(refine, mode, rtol):
    from tpufem.fem.dof_handler import DoFHandler
    from tpufem.fem.mesh import Mesh
    from tpufem.operators.laplace import LaplaceOperator
    from tpufem.ops.matrix_free import MatrixFree
    from tpufem.solvers.resident import resident_jacobi_cg
    from tpufem.utils.config import FemConfig

    dim, p = 3, 4
    mesh = Mesh.hyper_cube(dim, refine)
    dofs = DoFHandler(mesh, p)
    rng = np.random.default_rng(42)
    b_host = rng.standard_normal(dofs.n_dofs)  # ONE rhs for both variants
    out = {}
    for fused in (False, True):
        mf = MatrixFree.build(
            mesh, dofs,
            FemConfig(dim=dim, degree=p, dtype="float32",
                      scatter="separable", use_pallas=True,
                      pallas_mode=mode, pallas_dirichlet=fused),
        )
        if mf.resident is None:
            raise SystemExit("no resident kernel for this config")
        op = LaplaceOperator(mf)
        diag = op.diagonal()
        mask = np.asarray(mf.interior_mask, np.float64)
        b = jnp.asarray(mask * b_host, jnp.float32)
        # warm (compile + first run), then time
        res = resident_jacobi_cg(op, b, diag=diag, rtol=rtol)
        float(res.residual)
        t0 = time.perf_counter()
        res = resident_jacobi_cg(op, b, diag=diag, rtol=rtol)
        iters = int(res.iterations)
        dt = time.perf_counter() - t0
        key = "fused" if fused else "flat"
        out[key] = {"s": dt, "iterations": iters,
                    "residual": float(res.residual),
                    "converged": bool(res.converged),
                    "x_sum": float(jnp.sum(jnp.abs(res.x)))}
        print(json.dumps({"check": f"resident_jacobi_cg_{key}_mask",
                          "mode": mode, "n_dofs": dofs.n_dofs,
                          **out[key]}), flush=True)
        del mf, op, res
    speedup = out["flat"]["s"] / out["fused"]["s"]
    same_iters = out["flat"]["iterations"] == out["fused"]["iterations"]
    print(json.dumps({"check": "fused_mask_verdict",
                      "speedup": round(speedup, 3),
                      "same_iterations": same_iters,
                      "recommend_fused": bool(speedup > 1.02
                                              and same_iters)}),
          flush=True)


if __name__ == "__main__":
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--refine", type=int, default=6)
    ap.add_argument("--mode", default="bf16",
                    choices=["f32", "bf16", "bf16s"])
    ap.add_argument("--rtol", type=float, default=1e-5)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    run(args.refine, args.mode, args.rtol)
