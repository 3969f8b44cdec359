"""Gather-free cell loop on uniform tensor-product grids.

The TPU answer to the reference's coalesced SoA gather + colored scatter
(SURVEY.md §2 "MatrixFreeGpu", §3.4): on a *uniform* hyper_cube grid the
cell→DoF map is affine, so

- ``read_dof_values`` = extracting overlapping (p+1)-point patches with
  stride p along each axis — pure reshape/slice/concat ("blocking"), no
  gather primitive;
- ``distribute_local_to_global`` = the transposed overlap-add — slicing,
  padding and one add per axis, no scatter primitive.

XLA lowers these to dense copies at HBM bandwidth, which beats any generic
gather/scatter lowering by ~2 orders of magnitude on TPU (measured: generic
incidence path 166 ms vs structured path ~ms for 3D Q4 at 2.1M DoFs).

Blocked layout after blocking all axes (3D): (nz, pz, ny, py, nx, px) —
spatial axis a (0 = x innermost) has its cell dim at 2*(dim-1-a) and its
local dim at 2*(dim-1-a)+1.  The slowest axis (z) leads so a multi-chip
slab decomposition shards the leading dim (tpufem.parallel).  All
sum-factorization contractions act on the local dims; on the uniform grid
the Cartesian metric is *constant across cells*, so the quadrature-point
scaling is a broadcast of an (q1,)*dim weight block — zero per-cell metric
memory traffic.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def block_axis(t, axis: int, n: int, p: int):
    """Split grid axis (length n*p+1) into overlapping cell patches
    (..., n, p+1); the split pair lands at the END of the dim list."""
    t = jnp.moveaxis(t, axis, -1)
    main = t[..., :-1].reshape(t.shape[:-1] + (n, p))
    last = t[..., p::p][..., None]
    return jnp.concatenate([main, last], axis=-1)


def unblock_axis_add(t, n: int, p: int):
    """Transpose of block_axis: overlap-add (..., n, p+1) -> (..., n*p+1),
    result at the LAST dim position."""
    npts = n * p + 1
    main = t[..., :p].reshape(t.shape[:-2] + (n * p,))
    main = jnp.concatenate(
        [main, jnp.zeros(t.shape[:-2] + (1,), t.dtype)], axis=-1
    )  # (..., npts)
    carry = t[..., p]  # (..., n)
    z = jnp.zeros(t.shape[:-2] + (n, p), t.dtype)
    z = z.at[..., 0].set(carry)
    shifted = jnp.concatenate(
        [jnp.zeros(t.shape[:-2] + (p,), t.dtype), z.reshape(t.shape[:-2] + (n * p,))],
        axis=-1,
    )[..., :npts]  # carry[k] lands at (k+1)*p; drop p-1 trailing zeros
    return main + shifted


def _block_axis_inplace(t, axis: int, n: int, p: int):
    """Split grid axis (length n*p+1) into overlapping (n, p+1) IN PLACE —
    reshape/slice/concat on a middle axis preserve row-major contiguity.

    Measured equivalent to the earlier moveaxis-based formulation (XLA
    canonicalizes both to the same copy): the real cost of blocking is the
    p-strided overlapped extraction itself (~4.5 ms for 9.3M blocked
    elements at 74k Q4 cells ≈ 8 GB/s effective — the strided lane
    pattern, not transposes).  A Pallas blocking kernel is the remaining
    lever (docs/ROOFLINE.md)."""
    sh = t.shape
    sl = [slice(None)] * t.ndim
    sl[axis] = slice(0, n * p)
    main = t[tuple(sl)].reshape(sh[:axis] + (n, p) + sh[axis + 1 :])
    sl[axis] = slice(p, None, p)
    last = jnp.expand_dims(t[tuple(sl)], axis + 1)
    return jnp.concatenate([main, last], axis=axis + 1)


def _unblock_axis_add_inplace(t, axis: int, n: int, p: int):
    """Transpose of _block_axis_inplace: (..., n, p+1, ...) at (axis,
    axis+1) -> (..., n*p+1, ...) with overlap-add, in place."""
    npts = n * p + 1
    sh = t.shape
    pre, post = sh[:axis], sh[axis + 2 :]
    sl = [slice(None)] * t.ndim
    sl[axis + 1] = slice(0, p)
    main = t[tuple(sl)].reshape(pre + (n * p,) + post)
    zpad = jnp.zeros(pre + (1,) + post, t.dtype)
    main = jnp.concatenate([main, zpad], axis=axis)  # (..., npts, ...)
    sl[axis + 1] = p
    carry = t[tuple(sl)]  # (..., n, ...)
    z = jnp.zeros(pre + (n, p) + post, t.dtype)
    zsl = [slice(None)] * z.ndim
    zsl[axis + 1] = 0
    z = z.at[tuple(zsl)].set(carry)
    shifted = jnp.concatenate(
        [jnp.zeros(pre + (p,) + post, t.dtype),
         z.reshape(pre + (n * p,) + post)],
        axis=axis,
    )
    ssl = [slice(None)] * main.ndim
    ssl[axis] = slice(0, npts)
    return main + shifted[tuple(ssl)]


def block_all(u, dim: int, ns, p: int):
    """Grid vector/array -> blocked layout (nz,pz,ny,py,nx,px).

    ns: cells per grid axis in (z, y, x) order — axes may differ (slab-local
    shards have fewer z cells).  u may be flat (prod(npts)) or grid-shaped.
    """
    npts = tuple(n * p + 1 for n in ns)
    t = u.reshape(npts)
    # axis k's grid dim sits at position 2k after blocking axes 0..k-1
    for k in range(dim):
        t = _block_axis_inplace(t, 2 * k, ns[k], p)
    return t


def unblock_all_add(t, dim: int, ns, p: int):
    """Inverse (transpose) of block_all: blocked -> flat grid vector."""
    for k in reversed(range(dim)):
        t = _unblock_axis_add_inplace(t, 2 * k, ns[k], p)
    return t.reshape(-1)


def contract_local(t, M, a: int, dim: int):
    """Contract blocked local dim of spatial axis a (0 = x) with M (q, m)."""
    pos = 2 * (dim - 1 - a) + 1
    t2 = jnp.moveaxis(t, pos, -1)
    out = jnp.einsum("...i,qi->...q", t2, M, preferred_element_type=t.dtype,
                     precision=jax.lax.Precision.HIGHEST)
    return jnp.moveaxis(out, -1, pos)


def sym_metric_components(inv_jac, jxw):
    """Per-qpoint symmetric metric tensor, packed upper triangle.

    G = jxw * (J^-1 @ J^-T) collapses the two d x d rotations of the
    general-metric pointwise stage into ONE symmetric contraction:
      gb[b] = sum_c G[b,c] g[c]  ==  invJ (jxw invJ^T g).
    Returns (..., d*(d+1)/2) with components ordered (xx, xy[, xz], yy
    [, yz, zz]) — reads 6 metric fields per qpoint in 3D instead of the
    unpacked form's 10 (J^-1 is 9 + JxW), and HBM traffic is what bounds
    this tier.  Computed in f64 on host (numpy in, numpy out).
    """
    import numpy as np

    inv_jac = np.asarray(inv_jac, np.float64)
    jxw = np.asarray(jxw, np.float64)
    d = inv_jac.shape[-1]
    G = jxw[..., None, None] * np.einsum(
        "...ba,...ca->...bc", inv_jac, inv_jac)
    comps = [G[..., b, c] for b in range(d) for c in range(b, d)]
    return np.stack(comps, axis=-1)


def _sym_index(d: int):
    """(b, c) -> packed index map for the upper-triangle layout."""
    idx = {}
    k = 0
    for b in range(d):
        for c in range(b, d):
            idx[(b, c)] = idx[(c, b)] = k
            k += 1
    return idx


def global_interp_matrices(p: int, n: int, S, D_col):
    """Global nodal-grid -> quadrature-grid operators for one axis.

    E (n*q1, n*p+1): value interpolation — rows of cell c are S placed at
    columns c*p (the assembled tensor-product factor of read_dof_values +
    evaluate).  Gd: the direct nodal -> d/dx-at-qpoints map, D_col @ S.

    These are the general-metric analogue of the separable tier's global
    1D operators: banded (bandwidth p+1), rows periodic with period q1 —
    but used here as DENSE matmul operands: at (n*q1, n*p+1) sizes the
    MXU absorbs the ~q1/p-fold redundancy and XLA runs each axis pass at
    matmul speed, which beats the blocked formulation's p-strided
    overlapped extraction by an order of magnitude (docs/ROOFLINE.md:
    blocking measured at ~8 GB/s effective).
    """
    import numpy as np

    S = np.asarray(S, np.float64)
    D = np.asarray(D_col, np.float64)
    q1 = S.shape[0]
    E = np.zeros((n * q1, n * p + 1))
    for c in range(n):
        E[c * q1 : (c + 1) * q1, c * p : c * p + p + 1] = S
    Gd = np.zeros((n * q1, n * p + 1))
    DS = D @ S
    for c in range(n):
        Gd[c * q1 : (c + 1) * q1, c * p : c * p + p + 1] = DS
    return E, Gd


# f32 grid contractions run at HIGH (bf16x3 — f32-equivalent mantissa
# coverage for these banded operators, measured parity ~1e-7 rel):
# HIGHEST lowers every f32 matmul to ~6 MXU passes and cost 17% of the
# whole adaptive apply (measured round 3).  f64 (the CPU oracle path)
# keeps HIGHEST.
_AXIS_MM_PRECISION_F32 = jax.lax.Precision.HIGH


def axis_mm_precision(dtype):
    return (_AXIS_MM_PRECISION_F32
            if jnp.dtype(dtype) == jnp.float32
            else jax.lax.Precision.HIGHEST)


def _axis_mm(M, t, axis: int):
    """Contract grid axis `axis` of t with M (out, in) at matmul speed."""
    t2 = jnp.moveaxis(t, axis, -1)
    out = jnp.einsum("...i,qi->...q", t2, M,
                     preferred_element_type=t.dtype,
                     precision=axis_mm_precision(t.dtype))
    return jnp.moveaxis(out, -1, axis)


def laplace_apply_global_general(
    u,
    dim: int,
    ns,
    p: int,
    E_list,  # per-axis (z..x) global value-interp operators (numpy)
    G_list,  # per-axis global derivative-interp operators (numpy)
    gsym_q,  # (nq_z[, nq_y], nq_x, d(d+1)/2) packed jxw * J^-1 J^-T
):
    """General-metric cell loop as global quadrature-grid operators:

        y = sum_b C_b^T [ sum_c G[b,c] g_c ] ,   G = jxw * J^-1 J^-T,
        g_b = C_b u,   C_b = (x) over axes: Gd on axis b, E elsewhere.

    No blocking, no gather: every axis pass is one dense (banded) matmul
    over the full grid — the TPU-native replacement for the reference's
    per-cell shared-memory sum factorization on curved/adaptive metrics
    (matrix_free_gpu.h general mapping mode, SURVEY.md §3.4).  Shared
    partial chains keep it at 8 forward + 8 transpose axis passes in 3D;
    the pointwise stage reads the PACKED symmetric metric (6 fields in
    3D, not 10) — this tier is HBM-bound (docs/ROOFLINE.md).
    """
    if isinstance(ns, int):
        ns = (ns,) * dim
    npts = tuple(n * p + 1 for n in ns)
    t = u.reshape(npts)
    si = _sym_index(dim)
    if dim == 2:
        # axes: 0=z(row), 1=x(col); spatial component a: 0=x maps to
        # tensor axis dim-1-a
        Ez, Ex = E_list[0], E_list[1]
        Gz, Gx = G_list[0], G_list[1]
        ez = _axis_mm(Ez, t, 0)
        g_x = _axis_mm(Gx, ez, 1)           # spatial x derivative
        g_z = _axis_mm(Ex, _axis_mm(Gz, t, 0), 1)
        g = [g_x, g_z]  # spatial order (x, y=z-axis)
        gb = [sum(gsym_q[..., si[b, c]] * g[c] for c in range(dim))
              for b in range(dim)]
        out = _axis_mm(Ez.T, _axis_mm(Gx.T, gb[0], 1), 0)
        out = out + _axis_mm(Gz.T, _axis_mm(Ex.T, gb[1], 1), 0)
        return out.reshape(-1)
    Ez, Ey, Ex = E_list
    Gz, Gy, Gx = G_list
    # forward with shared partials (8 axis passes)
    a0 = _axis_mm(Ez, t, 0)                 # Ez u
    a1 = _axis_mm(Ey, a0, 1)                # Ey Ez u
    g_x = _axis_mm(Gx, a1, 2)
    g_y = _axis_mm(Ex, _axis_mm(Gy, a0, 1), 2)
    g_z = _axis_mm(Ex, _axis_mm(Ey, _axis_mm(Gz, t, 0), 1), 2)
    g = [g_x, g_y, g_z]  # spatial (x, y, z)
    gb = [sum(gsym_q[..., si[b, c]] * g[c] for c in range(dim))
          for b in range(dim)]
    # transpose with shared partials (8 axis passes)
    tx = _axis_mm(Gx.T, gb[0], 2)           # -> nodal x, q y/z
    ty = _axis_mm(Ex.T, _axis_mm(Gy.T, gb[1], 1), 2)
    txy = _axis_mm(Ey.T, tx, 1) + ty        # nodal x/y, q z
    out = _axis_mm(Ez.T, txy, 0)
    out = out + _axis_mm(
        Gz.T, _axis_mm(Ey.T, _axis_mm(Ex.T, gb[2], 2), 1), 0)
    return out.reshape(-1)


def laplace_apply_global_diag(
    u,
    dim: int,
    ns,
    p: int,
    E_list,  # per-axis (z..x) global value-interp operators
    G_list,  # per-axis global derivative-interp operators
    scale,  # (d,) spatial-axis scales inv_h^2 * det (x first)
    wb,  # blocked-layout broadcastable weights ([nz,qz,]ny,qy,nx,qx)
):
    """Diagonal-metric (axis-aligned Cartesian) cell loop as global
    quadrature-grid matmuls.  The metric is diagonal, so the pointwise
    stage is gb[a] = scale[a] * wb * g[a] with ``wb`` a BROADCASTABLE
    blocked array (activity-masked quadrature weights, coefficient folded
    in) — near-zero metric HBM traffic, unlike the packed-general form.
    Used by the box tier's per-box cell loop on adaptive meshes (dead
    lattice cells carry weight 0).
    """
    if isinstance(ns, int):
        ns = (ns,) * dim
    npts = tuple(n * p + 1 for n in ns)
    q1 = E_list[0].shape[0] // ns[0]
    blk = tuple(np.ravel([(n, q1) for n in ns]))
    t = u.reshape(npts)

    def pointwise(g, a):
        gq = g.reshape(blk) * wb * scale[a]
        return gq.reshape(g.shape)

    if dim == 2:
        Ez, Ex = E_list[0], E_list[1]
        Gz, Gx = G_list[0], G_list[1]
        gb_x = pointwise(_axis_mm(Gx, _axis_mm(Ez, t, 0), 1), 0)
        gb_z = pointwise(_axis_mm(Ex, _axis_mm(Gz, t, 0), 1), 1)
        out = _axis_mm(Ez.T, _axis_mm(Gx.T, gb_x, 1), 0)
        out = out + _axis_mm(Gz.T, _axis_mm(Ex.T, gb_z, 1), 0)
        return out.reshape(-1)
    Ez, Ey, Ex = E_list
    Gz, Gy, Gx = G_list
    a0 = _axis_mm(Ez, t, 0)
    a1 = _axis_mm(Ey, a0, 1)
    gb_x = pointwise(_axis_mm(Gx, a1, 2), 0)
    gb_y = pointwise(_axis_mm(Ex, _axis_mm(Gy, a0, 1), 2), 1)
    gb_z = pointwise(
        _axis_mm(Ex, _axis_mm(Ey, _axis_mm(Gz, t, 0), 1), 2), 2)
    tx = _axis_mm(Gx.T, gb_x, 2)
    ty = _axis_mm(Ex.T, _axis_mm(Gy.T, gb_y, 1), 2)
    txy = _axis_mm(Ey.T, tx, 1) + ty
    out = _axis_mm(Ez.T, txy, 0)
    out = out + _axis_mm(
        Gz.T, _axis_mm(Ey.T, _axis_mm(Ex.T, gb_z, 2), 1), 0)
    return out.reshape(-1)


def laplace_apply_structured(
    u,
    dim: int,
    ns,
    p: int,
    S,
    D_col,
    scale,  # (dim,) = inv_h[a]^2 * det  (uniform Cartesian metric)
    w_block,  # (q1,)*dim quadrature weight block (possibly * coefficient,
    #           then shaped (nx,qx,ny,qy,...) broadcastable instead)
):
    """Full Laplace vmult on the uniform grid: block -> S-transform ->
    collocation gradients -> metric scale -> transpose -> overlap-add.

    This is the reference's whole §3.4 kernel box in gather-free form.
    """
    if isinstance(ns, int):
        ns = (ns,) * dim
    t = block_all(u, dim, ns, p)
    # values at quadrature points: contract every local dim with S
    for a in range(dim):
        t = contract_local(t, S, a, dim)
    # gradient components + metric + accumulate transposed application
    acc = None
    for a in range(dim):
        g = contract_local(t, D_col, a, dim)
        g = g * (scale[a] * w_block)
        g = contract_local(g, D_col.T, a, dim)
        acc = g if acc is None else acc + g
    for a in range(dim):
        acc = contract_local(acc, S.T, a, dim)
    return unblock_all_add(acc, dim, ns, p)
