#!/usr/bin/env python
"""Headline benchmark: 3D Poisson Q4 matrix-free Laplace apply (GDoF/s).

The reference's ``bmop.cu`` protocol (SURVEY.md §2): time N repeated vmults,
report DoF/s.  BASELINE.json headline metric: "3D Poisson Q4 matrix-free
apply GDoF/s".  vs_baseline is measured against the literature anchor of
~1 GDoF/s for 3D high-order Laplace apply on V100-class GPUs (BASELINE.md,
approximate — no published reference numbers were recoverable).

Prints exactly one JSON line:
  {"metric": ..., "value": N, "unit": "GDoF/s", "vs_baseline": N}
"""

import json
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_tpu")

import jax
import jax.numpy as jnp


BASELINE_GDOFS = 1.0  # V100-class anchor, BASELINE.md (approximate)


def main():
    from tpufem.fem.dof_handler import DoFHandler
    from tpufem.fem.mesh import Mesh
    from tpufem.operators.laplace import LaplaceOperator
    from tpufem.ops.matrix_free import MatrixFree
    from tpufem.utils.config import FemConfig

    on_tpu = jax.devices()[0].platform not in ("cpu",)
    refine = 6 if on_tpu else 3  # 64^3 cells / 17M dofs on the chip
    dtype = "float32"

    mesh = Mesh.hyper_cube(3, refine)
    dofs = DoFHandler(mesh, 4)
    x = jnp.ones(dofs.n_dofs, jnp.dtype(dtype))
    reps = 50 if on_tpu else 3

    def measure(use_pallas):
        mf = MatrixFree.build(
            mesh, dofs,
            FemConfig(dim=3, degree=4, dtype=dtype, use_pallas=use_pallas,
                      scatter="separable"),
        )
        op = LaplaceOperator(mf)
        y = op.vmult_raw(x)
        y.block_until_ready()  # compile
        t0 = time.perf_counter()
        for _ in range(reps):
            y = op.vmult_raw(y)
        y.block_until_ready()
        return (time.perf_counter() - t0) / reps

    # report the better of the fused Pallas kernel and the XLA tier;
    # never let a Mosaic toolchain difference fail the benchmark
    dt = measure(False)
    if on_tpu:
        try:
            dt = min(dt, measure(True))
        except Exception:
            pass
    gdofs = dofs.n_dofs / dt / 1e9
    print(json.dumps({
        "metric": "3d_q4_laplace_matrix_free_apply",
        "value": round(gdofs, 4),
        "unit": "GDoF/s",
        "vs_baseline": round(gdofs / BASELINE_GDOFS, 4),
    }))


if __name__ == "__main__":
    main()
