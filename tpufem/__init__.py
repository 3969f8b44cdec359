"""tpufem — TPU-native matrix-free finite-element operator framework.

A from-scratch reimplementation of the capabilities of kalj/dealii-cuda
(CUDA matrix-free FEM example solvers on deal.II), designed TPU-first:

- Host FEM substrate (mesh, Q_p DoF enumeration, constraints, quadrature) in
  numpy — the role deal.II plays for the reference (SURVEY.md L0).
- Matrix-free operator evaluation (the reference's MatrixFreeGpu/FEEvaluationGpu,
  SURVEY.md L3) as batched sum-factorized tensor contractions: XLA einsum path
  and fused Pallas kernels tiled for the MXU.
- On-device Krylov solvers (CG in lax.while_loop), Jacobi/Chebyshev
  preconditioning and geometric multigrid (SURVEY.md L5).
- Multi-chip domain decomposition via jax.sharding Mesh + shard_map with
  ppermute ghost exchange over ICI (the reference's MultiGpuVector/
  GpuPartitioner, SURVEY.md §2 "Distributed communication backend").

Reference citations in docstrings use the file-level layout documented in
SURVEY.md §1-§2 (the reference mount was empty; see SURVEY.md §0).
"""

__version__ = "0.1.0"

from tpufem.utils.config import FemConfig  # noqa: F401
