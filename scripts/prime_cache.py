#!/usr/bin/env python
"""Pre-compile the flagship TPU programs into the persistent XLA cache.

First compilation of the 3D Q4 programs takes 5-40 minutes on a small
host; running this once per container (e.g. at provision time) makes
bench.py, chip_checks.py and the solver apps start fast.  Safe to
re-run: cache hits are no-ops.  Covers (round 2): the fused-kernel apply
tiers, whole Jacobi-CG and GMG-CG solves at the bench size, and the
adaptive box-tier solve.
"""

import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_tpu")

import jax
import jax.numpy as jnp

from tpufem.utils.cache import enable_persistent_cache

enable_persistent_cache()
import numpy as np


def step(name, fn):
    t0 = time.perf_counter()
    try:
        fn()
        print(f"{name:32s} {time.perf_counter() - t0:7.1f} s", flush=True)
    except Exception as e:
        print(f"{name:32s} FAILED: {type(e).__name__}: {e}"[:160],
              flush=True)


def main():
    from tpufem.fem.dof_handler import DoFHandler
    from tpufem.fem.mesh import Mesh
    from tpufem.operators.laplace import LaplaceOperator
    from tpufem.ops.matrix_free import MatrixFree
    from tpufem.solvers.cg import cg_solve, make_jacobi
    from tpufem.utils.config import FemConfig

    on_tpu = jax.devices()[0].platform not in ("cpu",)
    refine = 6 if on_tpu else 3
    mesh = Mesh.hyper_cube(3, refine)
    dofs = DoFHandler(mesh, 4)
    x = jnp.ones(dofs.n_dofs, jnp.float32)

    ops = {}
    for scheme, pallas in (("separable", True), ("separable", False),
                           ("structured", False)):
        name = scheme + ("+pallas" if pallas else "")

        def build(scheme=scheme, pallas=pallas, name=name):
            mf = MatrixFree.build(
                mesh, dofs,
                FemConfig(dim=3, degree=4, dtype="float32",
                          scatter=scheme, use_pallas=pallas),
            )
            op = LaplaceOperator(mf)
            jax.block_until_ready(op.vmult_raw(x))
            ops[name] = op

        step(f"apply {name}", build)

    def jacobi():
        op = ops["separable+pallas" if on_tpu else "structured"]
        inv_diag = 1.0 / op.diagonal()
        solve = jax.jit(lambda dp_, id_, b_: cg_solve(
            lambda v: op.vmult_with(dp_, v), b_,
            M_inv=lambda r: id_ * r, rtol=1e-5, maxiter=3))
        jax.block_until_ready(solve(op.device_args, inv_diag, x).x)

    step("jacobi-cg (bench shape)", jacobi)

    def gmg():
        from tpufem.solvers.multigrid import GeometricMultigrid

        mg = GeometricMultigrid(3, 4, refine, coarsest_refine=1,
                                dtype="float32", use_pallas=on_tpu)
        solve = jax.jit(lambda dp_, gdp_, b_: cg_solve(
            lambda v: mg.fine.op.vmult_with(dp_, v), b_,
            M_inv=lambda r: mg.preconditioner_with(gdp_, r), rtol=1e-5,
            maxiter=2))
        jax.block_until_ready(
            solve(mg.fine.op.device_args, mg.device_args, x).x)

    step("gmg-cg (bench shape)", gmg)

    def adaptive():
        from tpufem.apps.bmop import adaptive_mesh
        from tpufem.fem.constraints import make_hanging_node_constraints
        from tpufem.ops.boxes import BoxLaplaceOperator

        am = adaptive_mesh(3, 5 if on_tpu else 3, 2)
        ad = DoFHandler(am, 2)
        ac = make_hanging_node_constraints(ad)
        op = BoxLaplaceOperator(am, ad, constraints=ac, dtype="float32")
        xp = op.to_patch(np.ones(ad.n_dofs))
        jax.block_until_ready(op.vmult(xp))
        diag = op.diagonal()
        jax.block_until_ready(
            op.cg_solve(xp, diag, rtol=1e-5, maxiter=3).x)

    step("adaptive box solve", adaptive)


if __name__ == "__main__":
    main()
