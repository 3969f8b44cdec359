"""Separable global-operator apply: the zero-bookkeeping MXU tier.

On a uniform Cartesian tensor grid with constant coefficient, the
*assembled global* Laplace operator factors exactly:

  A  =  K1 (x) M1 (x) M1  +  M1 (x) K1 (x) M1  +  M1 (x) M1 (x) K1

where K1/M1 are the assembled 1D stiffness/mass matrices (npts x npts,
built with the same Gauss(p+1) quadrature as everything else, so parity
with the oracle is exact).  The apply is then 2d+2 dense contractions of
the plain (npts, npts[, npts]) grid array with 1D operator matrices —
no gather, no scatter, no blocked layouts, and every matmul has a
128-class contraction width that keeps the MXU busy (unlike (p+1)-wide
sum-factorization contractions, which use ~p/128 of the array).

This supersedes both the blocked-structured and dense-local tiers for the
flagship uniform-grid benchmark; those remain for per-cell metric variation
(adaptive/curved/variable-coefficient), where A does not globally factor.

Memory/FLOP note: each contraction costs O(N * npts) FLOPs — linear in
resolution — so this tier is MXU-bound only beyond npts ~ O(1000).
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

from tpufem.fem.quadrature import Quadrature
from tpufem.fem.shapes import ShapeInfo


@lru_cache(maxsize=None)
def global_1d_matrices(p: int, n: int, nq1: int) -> tuple[np.ndarray, np.ndarray]:
    """Assembled 1D reference matrices on n cells (unit interval):
    K1[i,j] = sum_cells int phi_i' phi_j' dxi (cell width 1/n folded in by
    the caller via per-axis scale), M1 likewise for values.  f64.
    Returned UNSCALED for the unit cell: caller multiplies K1 by n (1/h)
    and M1 by 1/n (h) per axis.
    """
    si = ShapeInfo(p, Quadrature.gauss(nq1))
    w = si.quad.weights_1d
    k1 = np.einsum("qi,q,qj->ij", si.D, w, si.D)  # reference-cell 1D stiffness
    m1 = np.einsum("qi,q,qj->ij", si.S, w, si.S)
    npts = n * p + 1
    K1 = np.zeros((npts, npts))
    M1 = np.zeros((npts, npts))
    for c in range(n):
        sl = slice(c * p, c * p + p + 1)
        K1[sl, sl] += k1
        M1[sl, sl] += m1
    return K1, M1


def global_1d_weighted(p: int, n: int, nq1: int, wfun, kind: str
                       ) -> np.ndarray:
    """Assembled 1D matrix on [0,1] (n cells) with a variable weight:

      kind 'K':  X[i,j] = sum_c int w(x) phi_i'(x) phi_j'(x) dx
      kind 'M':  X[i,j] = sum_c int w(x) phi_i(x)  phi_j(x)  dx

    wfun: vectorized callable on logical x (None = weight 1).  Uses the
    same Gauss rule as the general-metric path, and a tensor Gauss rule
    factorizes over axes exactly — so operators assembled from a
    separable metric (Mesh.separable_metric) match the per-qpoint
    general-metric apply to rounding, not just to quadrature order.
    """
    si = ShapeInfo(p, Quadrature.gauss(nq1))
    wq = si.quad.weights_1d
    xq = si.quad.points_1d
    h = 1.0 / n
    npts = n * p + 1
    X = np.zeros((npts, npts))
    B = si.D if kind == "K" else si.S
    scale = (1.0 / h) if kind == "K" else h
    for c in range(n):
        x = (c + xq) * h
        wv = wq * (1.0 if wfun is None else np.asarray(wfun(x)))
        loc = np.einsum("qi,q,qj->ij", B, wv, B) * scale
        sl = slice(c * p, c * p + p + 1)
        X[sl, sl] += loc
    return X


def build_separable_metric_terms(p, dim, nq1, n, separable_metric, dtype):
    """Per-term per-axis 1D operator matrices for an orthogonal separable
    metric: terms[a][b] = K-type for b == a else M-type, with the mesh's
    1D weight functions (axis indices in xyz order)."""
    terms = []
    for a in range(dim):
        mats = []
        for b in range(dim):
            X = global_1d_weighted(
                p, n, nq1, separable_metric[a][b],
                "K" if b == a else "M",
            )
            # numpy on purpose: these become closure CONSTANTS of jitted
            # applies; device constants force a D2H fetch at lowering,
            # which hangs on this platform (docs/ROOFLINE.md round 3)
            mats.append(np.asarray(X, dtype))
        terms.append(mats)
    return terms


def laplace_apply_separable_terms(u, dim: int, npts: int, terms):
    """y = sum_a (X_a,d-1 (x) ... (x) X_a,0) u — the general
    sum-of-tensor-products apply (d^2 contractions; curved orthogonal
    meshes: polar/spherical shells)."""
    t0 = u.reshape((npts,) * dim)
    r = None
    for a in range(dim):
        t = t0
        for b in range(dim):
            t = _contract_grid(t, terms[a][b], b, dim)
        r = t if r is None else r + t
    return r.reshape(-1)


def cartesian_coef_terms(p, dim, nq1, n, lower, upper, coef_axes, dtype):
    """terms[a][b] 1D matrices for a uniform Cartesian mesh with a
    SEPARABLE variable coefficient c(x) = prod_b c_b(x_b):

        A = sum_a  (x)_b X_ab,   X_aa = int c_a phi' phi' dx_a,
                                 X_ab = int c_b phi  phi  dx_b  (b != a)

    assembled with the same tensor Gauss rule as the per-qpoint path, so
    the factorization is exact to rounding (the variable-coefficient
    fast path of VERDICT r4 item 2 — the reference pays ~nothing for a
    variable coefficient, SURVEY.md §2 'Laplace operator').  Physical
    extents are folded into the 1D weights (K-type: /L, M-type: *L)."""
    table = []
    for a in range(dim):
        row = []
        for b in range(dim):
            L = float(upper[b] - lower[b])
            lo = float(lower[b])
            cb = coef_axes[b]
            if a == b:
                row.append(lambda xi, cb=cb, L=L, lo=lo:
                           np.asarray(cb(lo + xi * L)) / L)
            else:
                row.append(lambda xi, cb=cb, L=L, lo=lo:
                           np.asarray(cb(lo + xi * L)) * L)
        table.append(row)
    return build_separable_metric_terms(p, dim, nq1, n, table, dtype)


def build_separable_operators(p, dim, nq1, n, h, dtype):
    """Per-axis scaled (K1_a, M1_a) HOST constants (numpy: embedded into
    jitted programs without the D2H-at-lowering platform hang).

    h: (dim,) physical cell widths. K scales by 1/h (phi' Jacobian^2 times
    h volume), M scales by h.
    """
    K1u, M1u = global_1d_matrices(p, n, nq1)
    Ks, Ms = [], []
    for a in range(dim):
        Ks.append(np.asarray(K1u / h[a], dtype))
        Ms.append(np.asarray(M1u * h[a], dtype))
    return Ks, Ms


def _contract_grid(t, M, axis: int, dim: int):
    """Contract grid dim holding spatial axis `axis` (0 = x) with M."""
    pos = dim - 1 - axis
    t2 = jnp.moveaxis(t, pos, -1)
    out = jnp.einsum("...i,oi->...o", t2, M, preferred_element_type=t.dtype,
                     precision=jax.lax.Precision.HIGHEST)
    return jnp.moveaxis(out, -1, pos)


def laplace_apply_separable(u, dim: int, npts: int, Ks, Ms):
    """y = A u via the separable factorization (8 contractions in 3D,
    4 in 2D, with shared partials)."""
    t = u.reshape((npts,) * dim)
    if dim == 2:
        r = _contract_grid(_contract_grid(t, Ms[0], 0, dim), Ks[1], 1, dim)
        r = r + _contract_grid(_contract_grid(t, Ks[0], 0, dim), Ms[1], 1, dim)
        return r.reshape(-1)
    # dim == 3
    a = _contract_grid(t, Ms[0], 0, dim)  # Mx u
    b = _contract_grid(a, Ms[1], 1, dim)  # My Mx u
    r = _contract_grid(b, Ks[2], 2, dim)  # Kz My Mx u
    c = _contract_grid(a, Ks[1], 1, dim)  # Ky Mx u
    r = r + _contract_grid(c, Ms[2], 2, dim)
    e = _contract_grid(t, Ks[0], 0, dim)  # Kx u
    f = _contract_grid(e, Ms[1], 1, dim)
    r = r + _contract_grid(f, Ms[2], 2, dim)
    return r.reshape(-1)
