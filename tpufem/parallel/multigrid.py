"""Distributed geometric multigrid over a slab-decomposed device mesh.

Reference analogue: the reference composes its multi-GPU vector with the
FULL solver stack — ``MGTransferMatrixFreeGpu`` + Chebyshev-smoothed level
operators all running on ``MultiGpuVector`` (SURVEY.md §2 "GMG transfer",
§3.6).  This module is the TPU equivalent: every level lives in the same
ghosted-slab representation as ``tpufem.parallel.partitioner``, and the
whole GMG-preconditioned CG runs as ONE ``shard_map`` computation.

Level transfer under the slab decomposition (z sharded):
- the fine/coarse slabs are aligned (coarse cell k ↔ fine cells 2k, 2k+1),
  so every fine plane's interpolation support lies inside the shard's own
  ghosted coarse slab → **prolongation is purely local** (a row/col slice
  of the global 1D prolongation, identical values on duplicated interface
  planes by the set-semantics of the embedding rows);
- restriction is the transpose over *owned* fine planes (each duplicated
  interface plane is counted by exactly one shard) followed by one
  interface ``compress_add`` on the coarse level — the same exchange the
  operator apply uses.
- the coarsest level is solved with the replicated dense inverse after an
  all_gather (deterministic, identical on every shard).

The numerical operation sequence matches
``tpufem.solvers.multigrid.GeometricMultigrid._cycle`` exactly, so
GMG-CG iteration counts are directly comparable to the single-device
solver (asserted in tests/test_parallel.py).
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from tpufem.ops.structured import laplace_apply_structured
from tpufem.parallel.partitioner import Partitioner
from tpufem.solvers.cg import CGResult, cg_solve
from tpufem.solvers.chebyshev import ChebyshevParams, chebyshev_smooth
from tpufem.solvers.multigrid import GeometricMultigrid


def _shard_struct_w(struct_w: np.ndarray, part: Partitioner) -> np.ndarray:
    """Slab-shard an interleaved ([nz,qz,]...) weight block along z cells:
    (n_shards, nz_local, qz, rest...).  Broadcastable (size-1 nz) blocks
    are replicated."""
    w = np.asarray(struct_w)
    ns, cz = part.n_shards, part.local_cells_z
    if w.shape[0] == 1:  # constant-coefficient broadcastable block
        return np.broadcast_to(w[None], (ns,) + w.shape)
    return np.stack([w[k * cz : (k + 1) * cz] for k in range(ns)])


class DistributedGMG:
    """Slab-sharded V-cycle built from a (global) GeometricMultigrid.

    All methods ending in ``_local`` operate on per-shard ghosted blocks
    and must run inside a ``shard_map`` with the partitioner's axis in
    scope.  Per-level sharded arrays (interior mask, inverse diagonal,
    quadrature/coefficient weights) travel as explicit arguments — the
    ``lvl_data`` pytree — so they are stored sharded, not replicated.
    """

    def __init__(self, gmg: GeometricMultigrid, n_shards: int,
                 axis_name: str = "shard"):
        self.gmg = gmg
        self.axis_name = axis_name
        dim, p = gmg.dim, gmg.degree
        self.dim, self.p = dim, p
        self.parts: list[Partitioner] = []
        for lvl in gmg.levels:
            n = (lvl.npts - 1) // p
            self.parts.append(
                Partitioner(dim, n, p, n_shards, axis_name=axis_name)
            )
        # per-level structured-apply constants (replicated; O(1) each)
        self._scale = [lvl.mf.struct_scale for lvl in gmg.levels]
        self._S = gmg.levels[0].mf.S
        self._D_col = gmg.levels[0].mf.D_col
        self.n_shards = n_shards

    # ------------------------------------------------------------------
    # sharded per-level data, built on host: pass through shard_map with
    # in_specs = self.lvl_specs()
    def build_lvl_data(self, dtype=None):
        out = []
        for lvl, part in zip(self.gmg.levels, self.parts):
            dt = np.dtype(dtype) if dtype else np.asarray(lvl.mask).dtype
            mask = part.to_local(np.asarray(lvl.mask, dt))
            inv_diag = part.to_local(np.asarray(lvl.inv_diag, dt))
            w = _shard_struct_w(np.asarray(lvl.mf.struct_w, dt), part)
            # Chebyshev eigenvalue-range scalars are device scalars
            # (chebyshev.estimate_lambda_max avoids host read-back) —
            # replicated through the lvl_data pytree, never closure
            # constants (platform rule, MatrixFree.device_args)
            out.append((jnp.asarray(mask), jnp.asarray(inv_diag),
                        jnp.asarray(w), lvl.cheb.theta, lvl.cheb.delta))
        return tuple(out)

    def lvl_specs(self):
        s = P(self.axis_name)
        return tuple((s, s, s, P(), P()) for _ in self.gmg.levels)

    # ------------------------------------------------------------------
    def _vmult_raw_local(self, l: int, x_loc, w_loc):
        part = self.parts[l]
        ns_local = (part.local_cells_z,) + (part.n,) * (self.dim - 1)
        y = laplace_apply_structured(
            x_loc, self.dim, ns_local, self.p, self._S, self._D_col,
            self._scale[l], w_loc,
        )
        return part.compress_add(y.reshape(part.local_shape))

    def _vmult_local(self, l: int, x_loc, m_loc, w_loc):
        y = self._vmult_raw_local(l, m_loc * x_loc, w_loc)
        return m_loc * y + (1.0 - m_loc) * x_loc

    # ------------------------------------------------------------------
    def _axis_slices(self, l: int):
        """(fine-row, coarse-col) index ranges of this shard's slabs in
        the level-l global 1D prolongation."""
        pf, pc = self.parts[l], self.parts[l - 1]
        idx = jax.lax.axis_index(self.axis_name)
        zf0 = idx * pf.local_cells_z * self.p
        zc0 = idx * pc.local_cells_z * self.p
        return zf0, pf.local_npts_z, zc0, pc.local_npts_z

    def _apply_z(self, M, t):
        """Contract the leading (z) dim of a local block with M (out, in)."""
        return jnp.einsum("fi,i...->f...", M, t,
                          preferred_element_type=t.dtype,
                          precision=jax.lax.Precision.HIGHEST)

    def _apply_rest(self, M, t, npts_in: int):
        """Apply M along every non-z axis (full, unsharded axes)."""
        d = self.dim
        for axis in range(1, d):
            t = jnp.moveaxis(
                jnp.einsum("fi,...i->...f", M, jnp.moveaxis(t, axis, -1),
                           preferred_element_type=t.dtype,
                           precision=jax.lax.Precision.HIGHEST),
                -1, axis,
            )
        return t

    def prolongate_local(self, l: int, xc_loc):
        """Coarse level l-1 slab -> fine level l slab; purely local."""
        Pg = self.gmg.P1d[l - 1]
        zf0, lzf, zc0, lzc = self._axis_slices(l)
        P_loc = jax.lax.dynamic_slice(Pg, (zf0, zc0), (lzf, lzc))
        t = self._apply_z(P_loc, xc_loc)
        return self._apply_rest(Pg, t, self.gmg.levels[l - 1].npts)

    def restrict_local(self, l: int, rf_loc):
        """Fine slab -> coarse slab: transpose over owned fine planes,
        then compress the coarse interface planes."""
        Pg = self.gmg.P1d[l - 1]
        part_f, part_c = self.parts[l], self.parts[l - 1]
        zf0, lzf, zc0, lzc = self._axis_slices(l)
        # owner convention: the duplicated interface plane belongs to the
        # shard whose slab STARTS with it — zero the last plane elsewhere
        idx = jax.lax.axis_index(self.axis_name)
        is_last = idx == self.n_shards - 1
        keep = jnp.where(
            is_last,
            jnp.ones((lzf,), rf_loc.dtype),
            jnp.ones((lzf,), rf_loc.dtype).at[-1].set(0.0),
        )
        t = rf_loc * keep.reshape((lzf,) + (1,) * (self.dim - 1))
        P_loc = jax.lax.dynamic_slice(Pg, (zf0, zc0), (lzf, lzc))
        t = self._apply_z(P_loc.T, t)
        t = self._apply_rest(Pg.T, t, self.gmg.levels[l].npts)
        return part_c.compress_add(t)

    def coarse_solve_local(self, b_loc, coarse_inv):
        """Replicated dense coarse inverse after all_gather; deterministic
        and identical on every shard."""
        part = self.parts[0]
        g = jax.lax.all_gather(b_loc, self.axis_name)  # (ns, lz, ...)
        owned = g[:, :-1].reshape((-1,) + g.shape[2:])
        full = jnp.concatenate([owned, g[-1, -1:]], axis=0)
        x = jnp.dot(coarse_inv, full.reshape(-1),
                    precision=jax.lax.Precision.HIGHEST)
        grid = x.reshape((self.gmg.levels[0].npts,) * self.dim)
        z0 = jax.lax.axis_index(self.axis_name) * part.local_cells_z * self.p
        return jax.lax.dynamic_slice_in_dim(grid, z0, part.local_npts_z, 0)

    # ------------------------------------------------------------------
    def vcycle_local(self, b_loc, lvl_data, coarse_inv):
        """One V-cycle on local slabs — operation-for-operation the same
        sequence as GeometricMultigrid._cycle_with."""
        return self._cycle_local(len(self.gmg.levels) - 1, b_loc,
                                 lvl_data, coarse_inv)

    def _cycle_local(self, l: int, b, lvl_data, coarse_inv):
        m, inv_diag, w, theta, delta = lvl_data[l]
        m, inv_diag, w = m[0], inv_diag[0], w[0]
        if l == 0:
            return self.coarse_solve_local(b, coarse_inv)
        cheb = ChebyshevParams(theta, delta,
                               self.gmg.levels[l].cheb.degree)
        A = partial(self._vmult_local, l, m_loc=m, w_loc=w)
        Af = lambda x: A(x)
        b = m * b
        x = chebyshev_smooth(Af, inv_diag, cheb, b)
        r = m * (b - Af(x))
        mc = lvl_data[l - 1][0][0]
        rc = mc * self.restrict_local(l, r)
        xc = self._cycle_local(l - 1, rc, lvl_data, coarse_inv)
        x = x + m * self.prolongate_local(l, xc)
        x = chebyshev_smooth(Af, inv_diag, cheb, b, x0=x)
        return x


def distributed_gmg_cg_solve(
    gmg: GeometricMultigrid,
    n_shards: int,
    b: np.ndarray,
    rtol: float = 1e-10,
    maxiter: int = 1000,
    device_mesh=None,
    axis_name: str = "shard",
):
    """GMG-preconditioned CG with every level slab-sharded: one jitted
    shard_map computation end to end (SURVEY.md §3.6 composed with §3.5).

    Returns (x_global, iterations, residual)."""
    dgmg = DistributedGMG(gmg, n_shards, axis_name=axis_name)
    part = dgmg.parts[-1]
    fine = gmg.levels[-1]
    dtype = np.asarray(fine.mask).dtype
    mesh = device_mesh if device_mesh is not None else part.device_mesh()
    sh = part.sharding(mesh)

    from jax.sharding import NamedSharding

    sh_rep = NamedSharding(mesh, P())  # replicated (the cheb scalars)
    lvl_data = dgmg.build_lvl_data(dtype)
    lvl_data = jax.tree.map(
        lambda a: jax.device_put(a, sh if jnp.ndim(a) else sh_rep),
        lvl_data,
        is_leaf=lambda x: isinstance(x, jnp.ndarray),
    )
    b_l = jax.device_put(
        jnp.asarray(part.to_local(np.asarray(b, dtype))), sh)

    spec = P(axis_name)

    @jax.jit
    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(spec, dgmg.lvl_specs(), P()),
        out_specs=CGResult(spec, P(), P(), P()),
    )
    def solve(b_blk, lvls, coarse_inv):
        b_loc = b_blk[0]
        m, inv_diag, w = lvls[-1][:3]
        A = partial(dgmg._vmult_local, len(gmg.levels) - 1,
                    m_loc=m[0], w_loc=w[0])
        M_inv = lambda r: dgmg.vcycle_local(r, lvls, coarse_inv)
        res = cg_solve(lambda x: A(x), b_loc, M_inv=M_inv,
                       rtol=rtol, maxiter=maxiter, dot=part.dot)
        return CGResult(res.x[None], res.iterations, res.residual,
                        res.converged)

    res = solve(b_l, lvl_data, gmg.coarse_inv)
    x_global = part.to_global(np.asarray(res.x))
    return x_global, int(res.iterations), float(res.residual)
