"""Distributed vector-valued operators (multi-component FEEvaluation over
the general partitioner).

Reference analogue: the reference's multi-GPU path is scalar-only
(SURVEY.md §2 "Multi-GPU vector + partitioner"); deal.II's ``FESystem``
block convention gives every component the scalar DoF layout.  That is
exactly what makes the TPU composition cheap: a vector field rides as a
``(C, NL)`` per-shard array — one leading axis folded through the SAME
owned/ghost machinery:

- ghost exchange / compress: the scalar pairwise all_to_all / all_gather
  plans applied with a leading component axis (one collective moves all
  components — C times the payload per message, not C messages);
- the cell kernel: per-component sum-factorized basis transforms (a
  vmapped batch — XLA folds C into the contraction's leading dim) with
  the component-COUPLING happening in the quadrature functor in physical
  space (elasticity's stress, etc.), exactly the single-device
  ``operators/vector.py`` contract;
- constraints (hanging nodes + Dirichlet): the scalar tables broadcast
  over components;
- dots: flattened owned-masked per-shard vdot + psum (fixed order —
  bitwise-stable iteration counts, as the scalar path).

The Krylov layer (``cg_solve``, ``chebyshev_smooth``) is shape-agnostic:
it sees (C, NL) arrays and the injected flattening dot.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from tpufem.ops import tensor_ops as tops
from tpufem.parallel.general import (
    GeneralDistributedOperator,
    GeneralPartitioner,
)


class GeneralDistributedVectorOperator(GeneralDistributedOperator):
    """Distributed constrained vector operator + CG over a
    GeneralPartitioner.

    ``quad_op``: the multi-component functor contract of
    ``operators/vector.py`` — (values (C, nc, nq) | None,
    grads (C, nc, dim, nq) | None, ctx) -> (submit_values | None,
    submit_grads | None), stacked arrays (or per-component tuples).
    Global vectors are (C, n_dofs); local sharded vectors are
    (n_shards, C, NL).
    """

    def __init__(self, part: GeneralPartitioner, quad_op, n_components: int,
                 needs_values: bool = True, needs_gradients: bool = True,
                 device_mesh=None, exchange: str = "auto"):
        if quad_op is None:
            raise ValueError("the vector operator requires a quad_op")
        self.C = int(n_components)
        super().__init__(part, device_mesh=device_mesh, exchange=exchange,
                         quad_op=quad_op, needs_values=needs_values,
                         needs_gradients=needs_gradients)

    # -- component-axis hooks -----------------------------------------
    @property
    def _global_shape(self):
        return (self.C, self.part.n_dofs)

    def _to_global(self, arr):
        """(n_shards, C, NL) -> (C, n_dofs) from owned slots."""
        a = np.asarray(arr)
        return np.stack([
            self.part.to_global(a[:, c]) for c in range(self.C)
        ])

    def put_vector(self, u_global) -> jax.Array:
        u = np.asarray(u_global, dtype=self.part.dtype)
        if u.shape != (self.C, self.part.n_dofs):
            raise ValueError(
                f"expected ({self.C}, {self.part.n_dofs}), got {u.shape}")
        loc = np.stack([self.part.to_local(u[c]) for c in range(self.C)],
                       axis=1)  # (n_shards, C, NL)
        return jax.device_put(jnp.asarray(loc), self.sharding)

    # -- collectives with a leading component axis --------------------
    def _update_ghosts(self, x, ex):
        p = self.part
        if self.exchange == "a2a":
            send, recv = ex  # (n_shards, M) each
            sb = x[:, send]  # (C, n_shards, M)
            rb = jax.lax.all_to_all(sb, p.axis_name, 1, 1)
            x = x.at[:, recv.reshape(-1)].set(rb.reshape(self.C, -1))
            return x.at[:, p.NL - 1].set(0.0)
        own = x[:, : p.P]  # (C, P)
        allg = jax.lax.all_gather(own, p.axis_name, axis=1, tiled=True)
        flat = jnp.concatenate(
            [allg, jnp.zeros((self.C, 1), x.dtype)], axis=1)
        return jnp.concatenate(
            [own, flat[:, ex], jnp.zeros((self.C, 1), x.dtype)], axis=1)

    def _compress_add(self, y, ex):
        p = self.part
        if self.exchange == "a2a":
            send, recv = ex
            sb = y[:, recv]  # (C, n_shards, M)
            rb = jax.lax.all_to_all(sb, p.axis_name, 1, 1)
            y = y.at[:, send.reshape(-1)].add(rb.reshape(self.C, -1))
            y = y.at[:, p.P :].set(0.0)
            return self._update_ghosts(y, ex)
        contrib = jnp.zeros((self.C, p.n_shards * p.P + 1), y.dtype)
        contrib = contrib.at[:, ex].add(y[:, p.P : p.P + p.G])
        tot = jax.lax.psum(contrib, p.axis_name)
        me = jax.lax.axis_index(p.axis_name)
        own = y[:, : p.P] + jax.lax.dynamic_slice(
            tot, (0, me * p.P), (self.C, p.P))
        full = jnp.concatenate(
            [own, jnp.zeros((self.C, p.G + 1), y.dtype)], axis=1)
        return self._update_ghosts(full, ex)

    def _ddot(self, owned_mask):
        axis = self.part.axis_name

        def dot(a, b):
            hp = jax.lax.Precision.HIGHEST
            local = jnp.vdot(a * owned_mask, b, precision=hp)
            return jax.lax.psum(local, axis)

        return dot

    # -- cell kernel with component coupling ---------------------------
    def _cell_apply(self, u_loc, met, coef):
        """(C, nc, nn) -> (C, nc, nn): per-component basis transforms,
        component-coupling functor in physical space (the distributed
        multi-component FEEvaluation pipeline)."""
        from tpufem.operators.generic import QuadContext

        d = self.part.dim
        S, D, D_col, w_q = self._S, self._D, self._D_col, self._w_q
        ctx = QuadContext(config=None, metric_kind=self.part.metric_kind,
                          coef_q=coef)
        vals = g_ref = None
        if D_col is not None:
            if self._needs_g:
                v, g_ref = jax.vmap(
                    lambda ul: tops.eval_gradients_collocation(
                        ul, S, D_col, d))(u_loc)
                vals = v if self._needs_v else None
            else:
                vals = jax.vmap(
                    lambda ul: tops.eval_values(ul, S, d))(u_loc)
        else:
            if self._needs_v:
                vals = jax.vmap(
                    lambda ul: tops.eval_values(ul, S, d))(u_loc)
            if self._needs_g:
                g_ref = jax.vmap(
                    lambda ul: tops.eval_gradients_basis(ul, S, D, d)
                )(u_loc)
        hp = jax.lax.Precision.HIGHEST
        if self.part.metric_kind == "cartesian":
            inv_h, det = met
            jxw = det[:, None] * w_q[None, :]
            grads = (None if g_ref is None
                     else g_ref * inv_h[None, :, :, None])
        else:
            inv_jac, jxw = met
            grads = None if g_ref is None else jnp.einsum(
                "cqba,kcbq->kcaq", inv_jac, g_ref, precision=hp)
        sv, sg = self.quad_op(vals, grads, ctx)
        if sv is not None and not isinstance(sv, jnp.ndarray):
            sv = jnp.stack(list(sv))
        if sg is not None and not isinstance(sg, jnp.ndarray):
            sg = jnp.stack(list(sg))
        v_int = None if sv is None else sv * jxw
        if sg is None:
            g_int = None
        elif self.part.metric_kind == "cartesian":
            g_int = sg * inv_h[None, :, :, None] * jxw[None, :, None, :]
        else:
            g_int = jnp.einsum("cqba,kcaq->kcbq", inv_jac,
                               sg * jxw[None, :, None, :], precision=hp)
        if D_col is not None:
            return jax.vmap(
                lambda vi, gi: tops.integrate_collocation(
                    vi, gi, S, D_col, d),
                in_axes=(0 if v_int is not None else None,
                         0 if g_int is not None else None),
            )(v_int, g_int)
        out = None
        if v_int is not None:
            out = jax.vmap(
                lambda vi: tops.integrate_values(vi, S, d))(v_int)
        if g_int is not None:
            gi = jax.vmap(
                lambda g_: tops.integrate_gradients_basis(g_, S, D, d)
            )(g_int)
            out = gi if out is None else out + gi
        return out

    def _local_vmult(self, x, arrays):
        """Constrained apply on consistent (C, NL) local data."""
        (cell_dofs, inc, interior, ghost_src, con, met, coef) = arrays
        m = interior  # (NL,) broadcasts over the component axis
        xm = m * x
        if con is not None:
            cdofs, cmast, cw = con
            vals = jnp.sum(cw * xm[:, cmast], axis=-1)  # (C, CL)
            xm = xm.at[:, cdofs].set(vals)
        u_loc = xm[:, cell_dofs]  # (C, nc, nn)
        v_loc = self._cell_apply(u_loc, met, coef)
        flat = jnp.concatenate(
            [v_loc.reshape(self.C, -1),
             jnp.zeros((self.C, 1), v_loc.dtype)], axis=1)
        y = jnp.sum(flat[:, inc], axis=-1)  # (C, NL)
        if con is not None:
            cdofs, cmast, cw = con
            yc = y[:, cdofs]
            y = y.at[:, cdofs].set(0.0)
            y = y.at[:, cmast.reshape(-1)].add(
                (cw * yc[:, :, None]).reshape(self.C, -1))
        y = self._compress_add(y, ghost_src)
        return m * y + (1.0 - m) * x


def distributed_elasticity_operator(
    part: GeneralPartitioner, mu=1.0, lam=1.0, **kw
) -> GeneralDistributedVectorOperator:
    """Distributed step-8 elasticity over an arbitrary cell partition."""
    from tpufem.operators.vector import elasticity_qop

    return GeneralDistributedVectorOperator(
        part, elasticity_qop(part.dim, mu, lam), n_components=part.dim,
        needs_values=False, needs_gradients=True, **kw)
