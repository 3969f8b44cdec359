#!/usr/bin/env python
"""Pre-compile the flagship TPU programs into the persistent XLA cache.

First compilation of the 3D Q4 programs takes 5-10 minutes on a small
host; running this once per container (e.g. at provision time) makes
bench.py and the solver apps start fast.  Safe to re-run: cache hits are
no-ops.
"""

import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_tpu")

import jax
import jax.numpy as jnp


def main():
    from tpufem.fem.dof_handler import DoFHandler
    from tpufem.fem.mesh import Mesh
    from tpufem.operators.laplace import LaplaceOperator
    from tpufem.ops.matrix_free import MatrixFree
    from tpufem.utils.config import FemConfig

    on_tpu = jax.devices()[0].platform not in ("cpu",)
    refine = 6 if on_tpu else 3
    mesh = Mesh.hyper_cube(3, refine)
    dofs = DoFHandler(mesh, 4)
    x = jnp.ones(dofs.n_dofs, jnp.float32)
    for scheme, pallas in (("separable", True), ("separable", False),
                           ("structured", False)):
        t0 = time.perf_counter()
        mf = MatrixFree.build(
            mesh, dofs,
            FemConfig(dim=3, degree=4, dtype="float32", scatter=scheme,
                      use_pallas=pallas),
        )
        op = LaplaceOperator(mf)
        jax.block_until_ready(op.vmult_raw(x))
        print(f"{scheme}{'+pallas' if pallas else '':8}: "
              f"{time.perf_counter() - t0:6.1f} s", flush=True)


if __name__ == "__main__":
    main()
