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


def global_1d_gradient(p: int, n: int, nq1: int) -> np.ndarray:
    """Assembled mixed 1D matrix on [0,1] (n cells):
    G[i,j] = sum_cells int phi_i'(x) phi_j(x) dx.

    SCALE-FREE in the cell width (the 1/h of phi' cancels the h of dx) —
    the value-gradient coupling factor of vector-valued tensor-product
    operators (elasticity's off-diagonal blocks: G and G^T per mixed
    axis).  f64.
    """
    si = ShapeInfo(p, Quadrature.gauss(nq1))
    w = si.quad.weights_1d
    g1 = np.einsum("qi,q,qj->ij", si.D, w, si.S)
    npts = n * p + 1
    G = np.zeros((npts, npts))
    for c in range(n):
        sl = slice(c * p, c * p + p + 1)
        G[sl, sl] += g1
    return G


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
    """y = sum_t (X_t,d-1 (x) ... (x) X_t,0) u — the general
    sum-of-tensor-products apply (d contractions per term; curved
    orthogonal meshes have d terms, CP-expanded coefficients d*R)."""
    t0 = u.reshape((npts,) * dim)
    r = None
    for term in terms:
        t = t0
        for b in range(dim):
            t = _contract_grid(t, term[b], b, dim)
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


def global_1d_weighted_values(p: int, n: int, nq1: int, wvals: np.ndarray,
                              kind: str) -> np.ndarray:
    """``global_1d_weighted`` with the weight given as per-cell
    per-qpoint VALUES (n, nq1) instead of a callable — the CP-expansion
    path feeds factor values at exactly the quadrature points."""
    si = ShapeInfo(p, Quadrature.gauss(nq1))
    wq = si.quad.weights_1d
    h = 1.0 / n
    npts = n * p + 1
    X = np.zeros((npts, npts))
    B = si.D if kind == "K" else si.S
    scale = (1.0 / h) if kind == "K" else h
    wvals = np.asarray(wvals, np.float64).reshape(n, nq1)
    for c in range(n):
        loc = np.einsum("qi,q,qj->ij", B, wq * wvals[c], B) * scale
        sl = slice(c * p, c * p + p + 1)
        X[sl, sl] += loc
    return X


def cp_decompose_grid(T: np.ndarray, max_rank: int, tol: float,
                      iters: int = 30):
    """CP decomposition of a dim-D tensor sampled on the quadrature
    grid: T ~= sum_r  f_r,0 (x) f_r,1 (x) ... — returns (factors,
    rel_err) with factors[r][a] the axis-a value vector (axes in the
    TENSOR's order).  2D: truncated SVD (optimal).  3D: classic CP-ALS
    with an increasing-rank search; converges fast for the smooth
    coefficients this serves."""
    T = np.asarray(T, np.float64)
    d = T.ndim
    nrm0 = float(np.linalg.norm(T))
    if nrm0 == 0.0:
        return [], 0.0
    if d == 2:
        U, s, Vt = np.linalg.svd(T, full_matrices=False)
        tail = np.sqrt(np.concatenate(
            [np.cumsum((s**2)[::-1])[::-1][1:], [0.0]])) / nrm0
        R = int(np.searchsorted(-tail, -tol) + 1)
        R = min(max(R, 1), max_rank, len(s))
        facs = [[U[:, r] * s[r], Vt[r]] for r in range(R)]
        err = float(tail[R - 1]) if R <= len(tail) else 0.0
        return facs, err
    if d != 3:
        raise ValueError("cp_decompose_grid supports dim 2 and 3")
    rng = np.random.default_rng(0)
    best = ([], 1.0)
    prev = None
    for R in range(1, max_rank + 1):
        A = [rng.standard_normal((T.shape[a], R)) for a in range(3)]
        if prev is not None:
            # warm-start: keep the converged rank-(R-1) factors, add one
            # random column — ALS then refines the residual direction
            for a in range(3):
                A[a][:, : R - 1] = prev[a]
                A[a][:, R - 1] *= 0.01 * np.abs(prev[a]).max()
        for _ in range(iters):
            for a in range(3):
                o1, o2 = [b for b in range(3) if b != a]
                G = (A[o1].T @ A[o1]) * (A[o2].T @ A[o2])
                subs = ["zyx", "zyx", "zyx"]
                lbl = subs[0]
                M = np.einsum(
                    f"{lbl},{lbl[o1]}r,{lbl[o2]}r->{lbl[a]}r",
                    T, A[o1], A[o2], optimize=True)
                A[a] = M @ np.linalg.pinv(G)
        recon = np.einsum("zr,yr,xr->zyx", A[0], A[1], A[2],
                          optimize=True)
        err = float(np.linalg.norm(T - recon) / nrm0)
        if err < best[1]:
            best = ([[A[a][:, r].copy() for a in range(3)]
                     for r in range(R)], err)
        prev = A
        if err <= tol:
            break
    return best


def cp_coef_terms(p, dim, nq1, n, lower, upper, coefficient, dtype,
                  tol: float = 1e-6, max_rank: int = 8):
    """terms for a GENERIC smooth coefficient via CP expansion:
    c(x) ~= sum_r prod_a f_r,a(x_a) sampled at the tensor quadrature
    grid and greedily decomposed; each rank contributes dim
    tensor-product terms (3R total in 3D), so the fused ResidentTerms
    kernel applies at ~2 extra banded stages + X extra matmul lanes per
    rank.  Returns (terms, rel_err): rel_err is the CERTIFIED relative
    Frobenius error of the coefficient at the quadrature points — the
    applied operator equals the per-qpoint operator with the
    reconstructed coefficient exactly (tensor Gauss rule factorizes),
    so the operator perturbation is O(rel_err)."""
    quad = Quadrature.gauss(nq1)
    xq = np.asarray(quad.points_1d)
    # per-axis physical quadrature coordinates, (n*nq1,), TENSOR axis
    # order z..x = reversed spatial order
    ax_pts = []
    for a in range(dim):  # spatial axis a (x first)
        L = float(upper[a] - lower[a])
        h = L / n
        pts = (np.arange(n)[:, None] * h + xq[None, :] * h
               + float(lower[a])).reshape(-1)
        ax_pts.append(pts)
    Q = n * nq1
    # sample c on the tensor quadrature grid, chunked (the flagship grid
    # is 33M points); tensor axes are (z, ..., x): axis t holds spatial
    # dim-1-t
    grids = np.meshgrid(*[ax_pts[dim - 1 - t] for t in range(dim)],
                        indexing="ij")
    pts_all = np.stack([grids[dim - 1 - a] for a in range(dim)],
                       axis=-1).reshape(-1, dim)
    step = max(1, int(2e7 // dim))
    vals = np.empty(pts_all.shape[0])
    for i0 in range(0, len(pts_all), step):
        vals[i0:i0 + step] = np.asarray(
            coefficient(pts_all[i0:i0 + step]))
    T = vals.reshape((Q,) * dim)
    facs, rel_err = cp_decompose_grid(T, max_rank, tol)
    terms = []
    for fr in facs:  # fr[t]: tensor-axis t values (t=0 is z)
        for a in range(dim):  # K-axis (spatial)
            row = []
            for b in range(dim):  # spatial axis of the matrix
                L = float(upper[b] - lower[b])
                w = fr[dim - 1 - b]  # tensor axis for spatial b
                if a == b:
                    X = global_1d_weighted_values(
                        p, n, nq1, w / L, "K")
                else:
                    X = global_1d_weighted_values(
                        p, n, nq1, w * L, "M")
                row.append(np.asarray(X, dtype))
            terms.append(row)
    return terms, rel_err
