"""Distributed adaptive GMG: the box-tier V-cycle on a device mesh.

Composes the two adjacent tiers: ``DistributedBoxLaplace`` (the sharded
fine-level apply with cut-plane reconciliation, tpufem.parallel.boxes)
and ``BoxMultigrid`` (the global-coarsening forest hierarchy,
tpufem.solvers.box_multigrid).  Reference analogue: the reference's
multi-GPU partitioner driving the GMG solve of ``poisson_mg.cu``
(SURVEY.md §3.5 + §3.6).

Parallel layout (standard coarse-replication design):
- The FINEST level is sharded: Chebyshev smoothing rides the
  distributed apply (plane ppermutes over ICI), vectors stay in the
  stacked per-shard slab layout.
- Every coarser level is REPLICATED: the restricted defect is psum'd
  once per V-cycle (size N/2^dim — ~1.6 MB at the 3.3M-DoF flagship),
  then all shards run the identical deterministic sub-V-cycle, so no
  further communication and bitwise-identical coarse corrections.
  Fully sharded coarse levels are a follow-up; at 8 devices the
  replicated coarse work is ~N/8 per device and the V-cycle stays
  fine-apply dominated.

The only new machinery is the SHARD-LOCAL form of the finest transfer.
The platform rule (index ops are pathologically slow; dense band/select
matmuls are the fast primitive — docs/ROOFLINE.md) picks the form: the
per-axis 1D transfer factor along each SHARDED lattice axis is
row-sliced per shard into a dense (local rows × coarse region) matrix —
identity-row selections for unchanged/same-spacing groups, subface
embedding rows for the 2:1 group, zero rows on slab padding — stacked
over shards and applied as one tensordot per axis.  Every shard thus
computes exactly the dot products of the single-device transfer for the
rows it owns: prolongation values are bitwise those of the single-device
path; restriction differs only by psum association.  Tangential
(unsharded) axes keep the single-device static slices and matrices.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from tpufem.parallel.boxes import DistributedBoxLaplace
from tpufem.solvers.box_multigrid import BoxMultigrid
from tpufem.solvers.chebyshev import ChebyshevParams, chebyshev_smooth


def _axis_mm(M, U, axis, transpose=False):
    from tpufem.ops.structured import axis_mm_precision

    hp = axis_mm_precision(U.dtype)
    A = M.T if transpose else M
    return jnp.moveaxis(
        jnp.tensordot(A, jnp.moveaxis(U, axis, 0),
                      axes=((1,), (0,)), precision=hp), 0, axis)


class DistributedBoxMultigrid:
    """GMG-preconditioned CG on the stacked per-shard patch vector.

    ``cg_solve`` is ONE jitted shard_map program; iteration counts match
    the single-device :class:`BoxMultigrid` (same smoother scalars, same
    transfer dot products, psum'd dots on a fixed reduction tree).
    """

    def __init__(self, dop: DistributedBoxLaplace, mg: BoxMultigrid):
        if mg.levels[-1].op is not dop.gop:
            raise ValueError(
                "BoxMultigrid must be built with fine_op = dop.gop "
                "(box indices of the finest transfer must match)")
        if len(mg.levels) < 2:
            raise ValueError("need at least 2 levels for a V-cycle")
        self.dop, self.mg = dop, mg
        L = len(mg.levels) - 1
        self._rules = mg._rules[L]
        p, d = dop.p, dop.dim
        sy = dop.sy
        nsh = 2 if sy > 1 else 1
        self._nsh = nsh
        gboxes = dop.gop.boxes
        S = dop.n_shards

        def _local_factor(rule, ax):
            """(S, L_ax, nc_region) per-shard row-slice of the axis-ax
            transfer factor (ax in {0 z, 1 y})."""
            bf = rule["bf"]
            nf = gboxes[bf].lattice_shape[ax]
            Lax = dop.lboxes[bf].lattice_shape[ax]
            if rule["kind"] == "embed":
                F = rule["P"][ax]
            else:
                F = np.eye(nf)
            slab = dop._slab[bf] if ax == 0 else dop._slab_y[bf]
            az, rz = slab[0], slab[1]
            out = np.zeros((S, Lax, F.shape[1]))
            for s in range(S):
                row = s // sy if ax == 0 else s % sy
                a, r = int(az[row]), int(rz[row])
                if r == 0:
                    continue
                l = np.arange(Lax)
                g = a * p + l
                ok = (l <= r * p) & (g < nf)
                out[s][ok] = F[g[ok]]
            return out

        dt = dop.dt
        M0, M1 = [], []
        for rule in self._rules:
            M0.append(jnp.asarray(_local_factor(rule, 0), dt))
            if nsh > 1:
                M1.append(jnp.asarray(_local_factor(rule, 1), dt))
        inv_diag = 1.0 / dop.diagonal_local()
        nh = dop.to_local(mg.levels[L].nh_mask)
        self.mgp = {
            "M0": tuple(M0),
            "inv_diag": jnp.asarray(inv_diag, dt),
            "nh": jnp.asarray(nh, dt),
        }
        if nsh > 1:
            self.mgp["M1"] = tuple(M1)
        gdp = mg.device_args
        self.rep = {
            "gdp_sub": {
                "levels": gdp["levels"][:L],
                "transfers": gdp["transfers"][:L],
                "coarse": gdp["coarse"],
            },
            "tP": gdp["transfers"][L],
            "cheb": (mg.levels[L].cheb.theta, mg.levels[L].cheb.delta),
        }
        self._solvers: dict = {}
        self._vcycle_sm = None

    # ---- traced bodies (per shard) --------------------------------------
    def _prolongate_local(self, mpl, rep, zc):
        """Replicated level-(L-1) patch (hanging rows filled) -> local
        fine slab correction; every local fine box written once."""
        lc = self.mg.levels[-2].op
        out = jnp.zeros(self.dop.NL, zc.dtype)
        for ri, r in enumerate(self._rules):
            bc = lc.boxes[r["bc"]]
            U = zc[bc.offset : bc.offset + bc.n_nodes].reshape(
                bc.lattice_shape)[r["sl"]]
            # ascending axis order 0,1,2 — the SAME association as the
            # single-device _pair_apply, so per-shard prolongation values
            # are bitwise those of the single-device path
            U = _axis_mm(mpl["M0"][ri], U, 0)
            if self._nsh > 1:
                U = _axis_mm(mpl["M1"][ri], U, 1)
            if r["kind"] == "embed":
                for t in range(self._nsh, self.dop.dim):
                    U = _axis_mm(rep["tP"][ri][t], U, t)
            lb = self.dop.lboxes[r["bf"]]
            out = jax.lax.dynamic_update_slice(
                out, U.reshape(-1), (lb.offset,))
        return out

    def _restrict_local(self, prl, mpl, rep, rf):
        """Local fine residual -> REPLICATED level-(L-1) defect: owner-
        weighted per-shard adjoint transfer, one psum, then the coarse
        level's compress + Cᵀ + interior mask (replicated arithmetic)."""
        lc = self.mg.levels[-2].op
        ldc = rep["gdp_sub"]["levels"][-1]
        rw = prl["w_owner"] * rf
        t = jnp.zeros(lc.n_patch, rf.dtype)
        for ri, r in enumerate(self._rules):
            lb = self.dop.lboxes[r["bf"]]
            n = int(np.prod(lb.lattice_shape))
            F = rw[lb.offset : lb.offset + n].reshape(lb.lattice_shape)
            F = _axis_mm(mpl["M0"][ri], F, 0, transpose=True)
            if self._nsh > 1:
                F = _axis_mm(mpl["M1"][ri], F, 1, transpose=True)
            if r["kind"] == "embed":
                for ta in range(self._nsh, self.dop.dim):
                    F = _axis_mm(rep["tP"][ri][ta], F, ta,
                                 transpose=True)
            bc = lc.boxes[r["bc"]]
            C = t[bc.offset : bc.offset + bc.n_nodes].reshape(
                bc.lattice_shape)
            C = C.at[r["sl"]].add(F)
            t = jax.lax.dynamic_update_slice(
                t, C.reshape(-1), (bc.offset,))
        t = jax.lax.psum(t, (self.dop.axis_name, self.dop.axis_name_y))
        t = lc.compress_p(ldc["pr"], t)
        t = lc.distribute_transpose_p(ldc["pr"], t)
        return ldc["pr"]["interior_mask"] * t

    def _mcycle(self, prl, mpl, rep, b):
        """One V-cycle on the local slab vector (M⁻¹ body)."""
        mg = self.mg
        m = prl["interior_mask"]
        cheb = ChebyshevParams(rep["cheb"][0], rep["cheb"][1],
                               mg.smoother_degree)
        A = lambda v: self.dop._local_vmult(prl, v)
        b = m * b
        x = chebyshev_smooth(A, mpl["inv_diag"], cheb, b)
        r = m * (b - A(x))
        rc = self._restrict_local(prl, mpl, rep, r)
        xc = mg._cycle_with(rep["gdp_sub"], len(mg.levels) - 2, rc)
        ldc = rep["gdp_sub"]["levels"][-1]
        zc = mg.levels[-2].op.distribute_p(ldc["pr"], xc)
        x = x + m * mpl["nh"] * self._prolongate_local(mpl, rep, zc)
        return chebyshev_smooth(A, mpl["inv_diag"], cheb, b, x0=x)

    # ---- public sharded API ----------------------------------------------
    def vcycle(self, b_local):
        """Standalone jitted distributed V-cycle (for tests)."""
        if self._vcycle_sm is None:
            spec = P((self.dop.axis_name, self.dop.axis_name_y))
            mesh = self.dop.device_mesh()

            def body(pr, mp, b, rep):
                prl = jax.tree.map(lambda a: a[0], pr)
                mpl = jax.tree.map(lambda a: a[0], mp)
                return self._mcycle(prl, mpl, rep, b[0])[None]

            self._vcycle_sm = jax.jit(jax.shard_map(
                body, mesh=mesh, in_specs=(spec, spec, spec, P()),
                out_specs=spec))
        return self._vcycle_sm(self.dop.params, self.mgp, b_local,
                               self.rep)

    def cg_solve(self, b_local, x0=None, rtol=1e-10, maxiter=1000):
        """Distributed GMG-CG: ONE jitted shard_map program, psum dots
        with owner weights, coarse levels replicated."""
        from tpufem.solvers.cg import CGResult, cg_solve as _cg

        key = (float(rtol), int(maxiter))
        if key not in self._solvers:
            dop = self.dop
            spec = P((dop.axis_name, dop.axis_name_y))
            mesh = dop.device_mesh()
            ax = (dop.axis_name, dop.axis_name_y)

            def body(pr, mp, b, x0_, rep):
                prl = jax.tree.map(lambda a: a[0], pr)
                mpl = jax.tree.map(lambda a: a[0], mp)
                w = prl["w_owner"]

                def dot(u, v):
                    return jax.lax.psum(
                        jnp.dot(w * u, v,
                                precision=jax.lax.Precision.HIGHEST),
                        ax)

                A = lambda v: dop._local_vmult(prl, v)
                M_inv = lambda r: self._mcycle(prl, mpl, rep, r)
                res = _cg(A, b[0], M_inv=M_inv, x0=x0_[0],
                          rtol=key[0], maxiter=key[1], dot=dot)
                return CGResult(res.x[None], res.iterations,
                                res.residual, res.converged)

            self._solvers[key] = jax.jit(jax.shard_map(
                body, mesh=mesh,
                in_specs=(spec, spec, spec, spec, P()),
                out_specs=CGResult(spec, P(), P(), P())))
        if x0 is None:
            x0 = jnp.zeros_like(b_local)
        return self._solvers[key](self.dop.params, self.mgp, b_local,
                                  x0, self.rep)
