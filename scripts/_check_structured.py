import time

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
import jax.numpy as jnp
import numpy as np

from tpufem.fem.assemble import assemble_laplace
from tpufem.fem.dof_handler import DoFHandler
from tpufem.fem.mesh import Mesh
from tpufem.operators.laplace import LaplaceOperator
from tpufem.ops.matrix_free import MatrixFree
from tpufem.utils.config import FemConfig

rng = np.random.default_rng(3)
for dim, p, r in [(2, 1, 3), (2, 4, 3), (3, 2, 2), (3, 4, 1)]:
    t0 = time.time()
    mesh = Mesh.hyper_cube(dim, r)
    dofs = DoFHandler(mesh, p)
    mf = MatrixFree.build(mesh, dofs, FemConfig(dim, p))
    assert mf.scheme == "structured", mf.scheme
    op = LaplaceOperator(mf)
    t1 = time.time()
    K = assemble_laplace(dofs)
    t2 = time.time()
    u = rng.standard_normal(dofs.n_dofs)
    y = np.asarray(op.vmult_raw(jnp.asarray(u)))
    t3 = time.time()
    rel = np.linalg.norm(y - K @ u) / np.linalg.norm(K @ u)
    print(
        f"dim={dim} p={p}: rel={rel:.2e} "
        f"(build {t1-t0:.1f}s asm {t2-t1:.1f}s apply {t3-t2:.1f}s)",
        flush=True,
    )
    assert rel < 1e-12

coef = lambda x: 1.0 + np.sum(x**2, axis=1)
mesh = Mesh.hyper_cube(2, 3)
dofs = DoFHandler(mesh, 3)
mf = MatrixFree.build(mesh, dofs, FemConfig(2, 3), coefficient=coef)
assert mf.scheme == "structured"
op = LaplaceOperator(mf)
K = assemble_laplace(dofs, coefficient=coef)
u = rng.standard_normal(dofs.n_dofs)
rel = np.linalg.norm(
    np.asarray(op.vmult_raw(jnp.asarray(u))) - K @ u
) / np.linalg.norm(K @ u)
print(f"structured + coefficient: rel={rel:.2e}", flush=True)
assert rel < 1e-12
print("structured scheme OK")
