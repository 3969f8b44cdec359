"""Multi-chip distributed operator apply and CG via shard_map + ppermute.

Reference analogue: the multi-GPU vmult path (SURVEY.md §3.6):
``src.update_ghost_values()`` → per-device cell_loop → ``dst.compress(add)``
→ per-device dots + host sum.  TPU-native: one ``shard_map`` over a 1D
device mesh; ghost exchange is ``jax.lax.ppermute`` of single node planes
over ICI, dots are per-shard reductions + ``psum``, and the *entire CG
solve* (while_loop included) runs as a single XLA computation across all
chips — no host in the loop at all.
"""

from __future__ import annotations

from functools import partial
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from tpufem.ops.structured import laplace_apply_structured
from tpufem.parallel.partitioner import Partitioner
from tpufem.solvers.cg import CGResult, cg_solve


def make_local_laplace(
    part: Partitioner, S, D_col, scale, w_block
) -> Callable:
    """Per-shard raw vmult on the local slab (+ interface compress).

    Returned function maps a local ghosted block (local_npts_z, npts, ...)
    to the same shape with full sums on every plane — call inside
    shard_map with the partitioner's axis in scope.
    """
    dim, p = part.dim, part.p
    ns_local = (part.local_cells_z,) + (part.n,) * (dim - 1)

    def vmult_local(x_blk):
        y = laplace_apply_structured(
            x_blk, dim, ns_local, p, S, D_col, scale, w_block
        )
        y = y.reshape(part.local_shape)
        return part.compress_add(y)

    return vmult_local


def make_local_laplace_2d(part, S, D_col, scale, w_block) -> Callable:
    """Per-shard raw vmult on a 2-axis (z, y) slab decomposition
    (Partitioner2D): local structured apply + sequential z/y interface
    compress."""
    dim, p = part.dim, part.p

    def vmult_local(x_blk):
        y = laplace_apply_structured(
            x_blk, dim, part.local_cells, p, S, D_col, scale, w_block
        )
        y = y.reshape(part.local_shape)
        return part.compress_add(y)

    return vmult_local


def make_constrained(vmult_local: Callable, mask_blk) -> Callable:
    """Wrap a raw local vmult with constrained-DoF identity semantics
    (same mask algebra as tpufem.operators.laplace)."""

    def vmult(x_blk):
        y = vmult_local(mask_blk * x_blk)
        return mask_blk * y + (1.0 - mask_blk) * x_blk

    return vmult


def distributed_cg_solve(
    part: Partitioner,
    S,
    D_col,
    scale,
    w_block,
    mask: np.ndarray,
    diag: np.ndarray,
    b: np.ndarray,
    x0: Optional[np.ndarray] = None,
    rtol: float = 1e-10,
    maxiter: int = 10000,
    device_mesh=None,
):
    """Full distributed Jacobi-CG: shards the problem, runs one jitted
    shard_map computation, returns the global solution.

    mask/diag/b/x0 are global (npts**dim,) f64-ish numpy arrays; dtype of
    the solve follows S.dtype.
    """
    dims = part.dim
    dtype = S.dtype
    mesh = device_mesh if device_mesh is not None else part.device_mesh()
    sh = part.sharding(mesh)

    def to_dev(g):
        loc = part.to_local(np.asarray(g, dtype))
        return jax.device_put(jnp.asarray(loc), sh)

    b_l = to_dev(b)
    mask_l = to_dev(mask)
    diag_l = to_dev(diag)
    x0_l = to_dev(x0 if x0 is not None else np.zeros_like(np.asarray(b)))

    # variable-coefficient weight blocks carry a real z-cell dim: shard it
    # along the slab axis like every other field (SURVEY.md §3.6)
    w_np = np.asarray(w_block)
    w_sharded = w_np.shape[0] > 1
    if w_sharded:
        cz = part.local_cells_z
        w_l = jax.device_put(
            jnp.asarray(np.stack([
                w_np[k * cz : (k + 1) * cz] for k in range(part.n_shards)
            ])), sh)
    else:
        w_l = jax.device_put(
            jnp.asarray(np.broadcast_to(
                w_np[None], (part.n_shards,) + w_np.shape)), sh)

    spec = P(part.axis_name)

    @jax.jit
    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(spec, spec, spec, spec, spec),
        out_specs=CGResult(spec, P(), P(), P()),
    )
    def solve(b_blk, mask_blk, diag_blk, x0_blk, w_blk):
        b_loc = b_blk[0]
        m = mask_blk[0]
        dg = diag_blk[0]
        x0_loc = x0_blk[0]
        A = make_constrained(
            make_local_laplace(part, S, D_col, scale, w_blk[0]), m
        )
        inv_diag = 1.0 / dg
        res = cg_solve(
            A, b_loc, M_inv=lambda r: inv_diag * r, x0=x0_loc,
            rtol=rtol, maxiter=maxiter, dot=part.dot,
        )
        return CGResult(res.x[None], res.iterations, res.residual,
                        res.converged)

    res = solve(b_l, mask_l, diag_l, x0_l, w_l)
    x_global = part.to_global(np.asarray(res.x))
    return x_global, int(res.iterations), float(res.residual)


def distributed_cg_solve_2d(
    part,  # Partitioner2D
    S,
    D_col,
    scale,
    w_block,
    mask: np.ndarray,
    diag: np.ndarray,
    b: np.ndarray,
    rtol: float = 1e-10,
    maxiter: int = 10000,
    device_mesh=None,
):
    """Jacobi-CG over a two-axis (z, y) device mesh (Partitioner2D)."""
    dtype = S.dtype
    mesh = device_mesh if device_mesh is not None else part.device_mesh()
    sh = part.sharding(mesh)

    def to_dev(g):
        return jax.device_put(jnp.asarray(part.to_local(
            np.asarray(g, dtype))), sh)

    b_l, mask_l, diag_l = to_dev(b), to_dev(mask), to_dev(diag)
    spec = P(part.axis_z, part.axis_y)

    @jax.jit
    @partial(
        jax.shard_map, mesh=mesh, in_specs=(spec,) * 3,
        out_specs=CGResult(spec, P(), P(), P()),
    )
    def solve(b_blk, mask_blk, diag_blk):
        b_loc, m, dg = b_blk[0, 0], mask_blk[0, 0], diag_blk[0, 0]
        A = make_constrained(
            make_local_laplace_2d(part, S, D_col, scale, w_block), m
        )
        inv_diag = 1.0 / dg
        res = cg_solve(A, b_loc, M_inv=lambda r: inv_diag * r,
                       rtol=rtol, maxiter=maxiter, dot=part.dot)
        return CGResult(res.x[None, None], res.iterations,
                        res.residual, res.converged)

    res = solve(b_l, mask_l, diag_l)
    return (part.to_global(np.asarray(res.x)), int(res.iterations),
            float(res.residual))
