"""Fused Pallas kernel for the separable uniform-grid Laplace apply.

This is the Pallas realization of the reference's single fused cell-loop
kernel (SURVEY.md §3.4 "This whole box becomes ONE fused Pallas kernel"),
round-2 design (kernel-lab winner "v15", scripts/kernel_lab.py):

- **Banded z/y stages on the VPU.**  The assembled 1D operators are banded
  (bandwidth 2p+1) and, on a uniform grid, their interior rows are
  *periodic with period p* — so for tile size b ≡ 0 (mod p) every tile
  shares the same per-tap weight vectors, applied as shifted static slices
  of the halo'd VMEM tile (free addressing, VPU FMAs).  The only
  aperiodic rows are global 0 and npts-1, whose center tap misses one
  assembly neighbor — fixed by a branchless one-hot correction on the
  boundary tiles.  This replaced the einsum y/z contractions whose Mosaic
  relayouts dominated the round-1 kernel.
- **One K-stacked x matmul on the MXU.**  The two x-axis applications are
  fused into a single contraction  y = [q1 | q23] @ [Kx^T ; Mx^T]  over
  2X lanes — one large, well-pipelined MXU matmul per tile.
- **Double-buffered input DMA** over a 1D grid: tile t+1 is prefetched
  while tile t computes (guide pattern "Double Buffering").

Mosaic constraints honored (empirical, this toolchain): lane dims of
DMA'd buffers are 128-multiples; no captured jnp constants (band tables
are kernel inputs); no scatter (one-hots via iota compare); tile b kept
at ~24 (larger tiles exceed the VMEM budget and crash the remote compile
helper rather than erroring).

Accuracy: short banded reductions + one HIGHEST-precision matmul give
~1e-7 relative error at 17M DoFs — structured-tier class, unlike the XLA
separable tier's ~1e-5 long-contraction floor, so this kernel is safe to
use inside CG solves (measured in scripts/kernel_lab.py).

Schedule (3D):  s = Bz(u;Mz), t = Bz(u;Kz);  q1 = By(s;My),
q2 = By(s;Ky), q3 = By(t;My);  out = [q1 | q2+q3] @ [Kx^T ; Mx^T].
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Mosaic's DEFAULT scoped-VMEM limit is 16 MB — v5e has 128 MB of
# physical VMEM.  Every tile clamp in rounds 2-4 was calibrated against
# the default; raising the limit unlocks larger tiles (bigger matmul M
# dims, fewer tiles, less halo DMA).  Leave headroom for the pipeline's
# own double buffers.
_VMEM_LIMIT = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)


def _periodic_band(M1: np.ndarray, p: int, b: int,
                   phase: int = 0) -> np.ndarray:
    """(2p+1, b) periodic tap weights: W[o, i] = M1[g, g+o-p] for any
    interior row g with g % p == (phase + i) % p (rows of a uniformly
    assembled 1D operator repeat with period p).  ``phase`` is the row
    class of the tile's first row — tiles whose size is not a multiple
    of p start at a rotating class (p in {5, 7} with 8-aligned tiles)."""
    npts = M1.shape[0]
    W = np.zeros((2 * p + 1, b))
    g0 = p * ((p + npts // 2) // p)  # a deep-interior row of class 0
    if g0 + 2 * p >= npts:  # tiny grids: fall back to the first full row
        g0 = p
    for i in range(b):
        g = g0 + (phase + i) % p
        for o in range(2 * p + 1):
            j = g + o - p
            if 0 <= j < npts:
                W[o, i] = M1[g, j]
    return W


def _phase_bands(M1: np.ndarray, p: int, b: int) -> np.ndarray:
    """(n_phase, 2p+1, b) band tables for every tile start class; a
    single phase when b % p == 0 (all tiles start at class 0)."""
    n_ph = 1 if b % p == 0 else p
    return np.stack([_periodic_band(M1, p, b, phase=(ph * b) % p)
                     for ph in range(n_ph)])


def _deficits(M1: np.ndarray, p: int) -> tuple[float, float]:
    """Center-tap deficits of the aperiodic boundary rows 0 and npts-1
    (each misses one assembly neighbor) vs the periodic class-0 row."""
    npts = M1.shape[0]
    per = _periodic_band(M1, p, 1)[p, 0]
    return float(M1[0, 0] - per), float(M1[npts - 1, npts - 1] - per)


def _exact_bands(M1: np.ndarray, p: int, b: int, nt: int) -> np.ndarray:
    """(nt, 2p+1, b) EXACT per-row tap weights of a banded 1D operator:
    W[t, o, i] = M1[g, g+o-p] for global row g = t*b + i; zero outside
    [0, npts) in either index.  No periodicity assumption — covers
    non-uniformly assembled operators (weighted shell metrics, graded
    grids), where boundary rows and interior rows all differ
    (VERDICT r3 weak item 2: the per-row generalization of
    ``_periodic_band``).  Overhang rows (g >= npts on the last tile) get
    all-zero taps, so no output masking is needed."""
    npts = M1.shape[0]
    W = np.zeros((nt, 2 * p + 1, b))
    for t in range(nt):
        for i in range(b):
            g = t * b + i
            if g >= npts:
                continue
            for o in range(2 * p + 1):
                j = g + o - p
                if 0 <= j < npts:
                    W[t, o, i] = M1[g, j]
    return W


def _kernel(u_hbm, xkm, *args, b, L, X, p, dim, corr, nt, n_grid):
    """args = (wm_y, wk_y[, wm_z, wk_z], out, scratch, sem)."""
    if dim == 3:
        wm_y, wk_y, wm_z, wk_z, out, scratch, sem = args
    else:
        wm_y, wk_y, out, scratch, sem = args
    t = pl.program_id(0)
    slot = t % 2
    nxt = (t + 1) % 2

    def dma(sl, tt):
        if dim == 3:
            src = u_hbm.at[pl.ds((tt // nt) * b, L),
                           pl.ds((tt % nt) * b, L), :]
        else:
            src = u_hbm.at[pl.ds(tt * b, L), :]
        return pltpu.make_async_copy(src, scratch.at[sl], sem.at[sl])

    @pl.when(t == 0)
    def _():
        dma(slot, t).start()

    @pl.when(t + 1 < n_grid)
    def _():
        dma(nxt, t + 1).start()

    dma(slot, t).wait()
    u = scratch[slot]
    nb = 2 * p + 1
    (dm0, dk0, dm1, dk1, t_last, i_last) = corr
    ii = jax.lax.broadcasted_iota(jnp.int32, (b, 1), 0)
    oh0 = (ii == 0).astype(u.dtype)
    oh1 = (ii == i_last).astype(u.dtype)

    if dim == 3:
        iz, iy = t // nt, t % nt

        def band_z(tt_, w9):  # (L, L, X) -> (b, L, X); w9 (9, b, 1, 1)
            acc = None
            for o in range(nb):
                c = tt_[o : o + b] * w9[o]
                acc = c if acc is None else acc + c
            return acc

        def band_y(tt_, w9):  # (b, L, X) -> (b, b, X); w9 (9, b, 1)
            acc = None
            for o in range(nb):
                c = tt_[:, o : o + b, :] * w9[o]
                acc = c if acc is None else acc + c
            return acc

        def corr_z(t_in, acc, d0, d1):
            c0 = jnp.where(iz == 0, d0, 0.0).astype(u.dtype)
            c1 = jnp.where(iz == t_last, d1, 0.0).astype(u.dtype)
            return (acc
                    + (c0 * oh0).reshape(b, 1, 1) * t_in[p : p + 1]
                    + (c1 * oh1).reshape(b, 1, 1)
                    * t_in[p + i_last : p + i_last + 1])

        def corr_y(t_in, acc, d0, d1):
            c0 = jnp.where(iy == 0, d0, 0.0).astype(u.dtype)
            c1 = jnp.where(iy == t_last, d1, 0.0).astype(u.dtype)
            return (acc
                    + (c0 * oh0) * t_in[:, p : p + 1, :]
                    + (c1 * oh1) * t_in[:, p + i_last : p + i_last + 1, :])

        s = corr_z(u, band_z(u, wm_z), dm0[2], dm1[2])
        q1 = corr_y(s, band_y(s, wm_y), dm0[1], dm1[1])
        q2 = corr_y(s, band_y(s, wk_y), dk0[1], dk1[1])
        tq = corr_z(u, band_z(u, wk_z), dk0[2], dk1[2])
        q3 = corr_y(tq, band_y(tq, wm_y), dm0[1], dm1[1])
        qq = jnp.concatenate([q1, q2 + q3], axis=2)  # (b, b, 2X)
    else:
        iy = t

        def band_y2(tt_, w9):  # (L, X) -> (b, X); w9 (9, b, 1)
            acc = None
            for o in range(nb):
                c = tt_[o : o + b] * w9[o]
                acc = c if acc is None else acc + c
            return acc

        def corr_y2(t_in, acc, d0, d1):
            c0 = jnp.where(iy == 0, d0, 0.0).astype(u.dtype)
            c1 = jnp.where(iy == t_last, d1, 0.0).astype(u.dtype)
            return (acc
                    + (c0 * oh0) * t_in[p : p + 1]
                    + (c1 * oh1) * t_in[p + i_last : p + i_last + 1])

        q1 = corr_y2(u, band_y2(u, wm_y), dm0[1], dm1[1])
        q2 = corr_y2(u, band_y2(u, wk_y), dk0[1], dk1[1])
        qq = jnp.concatenate([q1, q2], axis=1)  # (b, 2X)

    out[:] = jax.lax.dot_general(
        qq, xkm[:],
        dimension_numbers=(((qq.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=qq.dtype,
        precision=jax.lax.Precision.HIGHEST,
    )


def _kernel_resident(u_hbm, xkm, wm_y, wk_y, wm_z, wk_z, out, scratch, sem,
                     osc, osem, *, b, L, LY, X, p, H, npts, corr, nt, mode,
                     dirichlet=False, interleave=1):
    """Solver-resident fused apply (kernel-lab winner "v17", 3D).

    Input AND output live in the same halo'd layout (sz, sy, X) with data
    at [p:p+npts, H:H+npts, :npts] and zeros elsewhere, so a solver can
    chain applies with ZERO pad/unpad passes.  The kernel maintains the
    zero-halo invariant itself: boundary tiles extend their output DMA to
    overwrite the halo strips with zeros (sourced from the never-written
    borders of the out scratch) and the last tile row/column masks the
    tiling overhang.

    Mosaic DMA alignment on (A, B, X) f32 arrays: dim-1 offsets/extents
    must be 8-multiples (sublane tiling) — hence the 8-aligned H-row halo
    in y with an aligned LY = b + 2H read window (data starts at H - p
    inside it) — while dim-0 is unconstrained (tight p-row halo in z) and
    dim-2 is always full.

    mode "f32": one HIGHEST-precision K-stacked x matmul (~1e-7 rel).
    mode "bf16": bf16x3 split of the x matmul (hi/lo, lo*lo dropped) —
    ~25% faster apply at ~3e-6 rel (measured, scripts/kernel_lab.py).
    mode "bf16s": vectors STORED bf16 in HBM (halves the DMA floor — the
    round-2 roofline's untried lever #3), banded stages computed in f32
    after an in-VMEM upcast, x matmul on native bf16 MXU with f32
    accumulation; ~4e-3 rel (input quantization) — preconditioner /
    smoother class, not CG-solve class.

    ``dirichlet=True`` fuses the hyper_cube Dirichlet constraint algebra
    y = m·A(m·x) + (1-m)·x into the kernel (the reference's constraint
    save/zero/restore around cell_loop, SURVEY.md §3.4).  On the uniform
    grid the interior mask is SEPARABLE — m(i,j,k) = mz(i)·my(j)·mx(k)
    with zeros exactly on the global boundary planes — so both mask
    applications are iota-compare products on VMEM-resident tiles
    (in-register VPU, no extra inputs), replacing two full HBM
    elementwise passes per apply in the resident CG loop (the
    round-2 verdict's unimplemented Jacobi-CG lever).
    """
    t = pl.program_id(0)
    n_grid = nt * nt
    slot = t % 2
    nxt = (t + 1) % 2
    i_last = (npts - 1) % b

    def dma_in(sl, tt):
        return pltpu.make_async_copy(
            u_hbm.at[pl.ds((tt // nt) * b, L),
                     pl.ds(tt % nt * b, LY), :],
            scratch.at[sl], sem.at[sl])

    @pl.when(t == 0)
    def _():
        dma_in(slot, t).start()

    @pl.when(t + 1 < n_grid)
    def _():
        dma_in(nxt, t + 1).start()

    # zero the out-scratch borders once; compute only ever writes the
    # center [p:p+b, H:H+b], so the borders stay zero and the
    # boundary-extended copies below source genuine zeros from them
    @pl.when(t == 0)
    def _():
        osc[0] = jnp.zeros_like(osc[0])

    def out_dma(tt, action):
        """Start/wait the out copy for tile tt: 9 static geometry classes
        ({lo, mid, hi} per axis); boundary tiles extend their write over
        the halo strips."""
        izz, iyy = tt // nt, tt % nt
        zcls = [(izz == 0, 0, 0, p + b),
                (jnp.logical_and(izz > 0, izz < nt - 1), p, None, b),
                (izz == nt - 1, p, p + (nt - 1) * b, b + p)]
        ycls = [(iyy == 0, 0, 0, H + b),
                (jnp.logical_and(iyy > 0, iyy < nt - 1), H, None, b),
                (iyy == nt - 1, H, H + (nt - 1) * b, b + H)]
        for zc, zsrc, zdst, zlen in zcls:
            for yc, ysrc, ydst, ylen in ycls:
                zd = p + izz * b if zdst is None else zdst
                yd = H + iyy * b if ydst is None else ydst

                @pl.when(jnp.logical_and(zc, yc))
                def _(zsrc=zsrc, zd=zd, zlen=zlen, ysrc=ysrc, yd=yd,
                      ylen=ylen):
                    cp = pltpu.make_async_copy(
                        osc.at[0, pl.ds(zsrc, zlen), pl.ds(ysrc, ylen), :],
                        out.at[pl.ds(zd, zlen), pl.ds(yd, ylen), :],
                        osem)
                    if action == "start":
                        cp.start()
                    else:
                        cp.wait()

    dma_in(slot, t).wait()
    u = scratch[slot]
    if mode == "bf16s":
        # storage is bf16; band stages run in f32 after one VMEM upcast
        u = u.astype(jnp.float32)
    iz, iy = t // nt, t % nt
    nb = 2 * p + 1
    dy = H - p  # y-axis data offset inside the aligned read window

    if dirichlet:
        # separable interior mask on the loaded tile (global padded
        # coords: data at z in [p, p+npts), y in [H, H+npts), x lanes
        # [0, npts)); halo/pad entries are zero already, so only the two
        # boundary planes per axis need zeroing
        lz = jax.lax.broadcasted_iota(jnp.int32, (L, 1, 1), 0) + iz * b
        ly = jax.lax.broadcasted_iota(jnp.int32, (1, LY, 1), 1) + iy * b
        lx = jax.lax.broadcasted_iota(jnp.int32, (1, 1, X), 2)
        m_in = (
            jnp.logical_and(lz != p, lz != p + npts - 1)
            & jnp.logical_and(ly != H, ly != H + npts - 1)
            & jnp.logical_and(lx != 0, lx != npts - 1)
        ).astype(u.dtype)
        u_full = u
        u = u * m_in

    def sel_phase(tab, idx):
        """Pick the band table for this tile's start class.  Tables are
        (n_phase, nb, b, ...); n_phase == 1 when b % p == 0 (every tile
        starts at class 0 — p in {5, 7} rotates through p phases)."""
        n_ph = tab.shape[0]
        w = tab[0]
        for k in range(1, n_ph):
            w = jnp.where(idx % n_ph == k, tab[k], w)
        return w

    wm_z_t, wk_z_t = sel_phase(wm_z, iz), sel_phase(wk_z, iz)
    wm_y_t, wk_y_t = sel_phase(wm_y, iy), sel_phase(wk_y, iy)

    def band_y(tt_, w9):
        acc = None
        for o in range(nb):
            c = tt_[:, dy + o : dy + o + b, :] * w9[o]
            acc = c if acc is None else acc + c
        return acc

    (dm0, dk0, dm1, dk1, t_last, i_last_c) = corr
    ii = jax.lax.broadcasted_iota(jnp.int32, (b, 1), 0)
    oh0 = (ii == 0).astype(u.dtype)
    oh1 = (ii == i_last_c).astype(u.dtype)

    def corr_y(t_in, acc, d0, d1):
        c0 = jnp.where(iy == 0, d0, 0.0).astype(u.dtype)
        c1 = jnp.where(iy == t_last, d1, 0.0).astype(u.dtype)
        return (acc
                + (c0 * oh0) * t_in[:, H : H + 1, :]
                + (c1 * oh1) * t_in[:, H + i_last_c : H + i_last_c + 1, :])

    # single-buffered out scratch: the previous tile's out copy had this
    # tile's whole compute time to drain; wait before the first chunk
    # store overwrites it
    @pl.when(t >= 1)
    def _():
        out_dma(t - 1, "wait")

    # ---- compute, in `interleave` z-row chunks ------------------------
    # Round-5 restructure: the VPU band stages and the MXU x-matmul of
    # ONE chunk are dependent, but chunk k's matmul and chunk k+1's
    # bands are not — emitted back-to-back in straight-line code (no
    # pl.when parity branches, the round-2 v19 mistake), the Mosaic
    # scheduler co-issues the two units (measured overlap 0.71,
    # scripts/toolchain_probe.py; docs/ROOFLINE.md round-5 section).
    # interleave=1 reproduces the round-4 single-block schedule.
    nchunks = interleave if interleave > 0 and b % interleave == 0 else 1
    cb = b // nchunks
    for k in range(nchunks):
        r0 = k * cb
        iic = jax.lax.broadcasted_iota(jnp.int32, (cb, 1), 0) + r0
        ohz0 = (iic == 0).astype(u.dtype)
        ohz1 = (iic == i_last_c).astype(u.dtype)

        def band_z_c(tt_, w9, r0=r0):
            acc = None
            for o in range(nb):
                c = tt_[r0 + o : r0 + o + cb] * w9[o][r0 : r0 + cb]
                acc = c if acc is None else acc + c
            return acc

        def corr_z_c(t_in, acc, d0, d1, ohz0=ohz0, ohz1=ohz1):
            c0 = jnp.where(iz == 0, d0, 0.0).astype(u.dtype)
            c1 = jnp.where(iz == t_last, d1, 0.0).astype(u.dtype)
            return (acc
                    + (c0 * ohz0).reshape(cb, 1, 1) * t_in[p : p + 1]
                    + (c1 * ohz1).reshape(cb, 1, 1)
                    * t_in[p + i_last_c : p + i_last_c + 1])

        s = corr_z_c(u, band_z_c(u, wm_z_t), dm0[2], dm1[2])
        q1 = corr_y(s, band_y(s, wm_y_t), dm0[1], dm1[1])
        q2 = corr_y(s, band_y(s, wk_y_t), dk0[1], dk1[1])
        tq = corr_z_c(u, band_z_c(u, wk_z_t), dk0[2], dk1[2])
        q3 = corr_y(tq, band_y(tq, wm_y_t), dm0[1], dm1[1])
        qq = jnp.concatenate([q1, q2 + q3], axis=2)  # (cb, b, 2X)

        if mode in ("bf16", "bf16s"):
            # bf16x3: a ~= hi + lo exactly in bf16 pairs; lo*lo dropped.
            # bf16s inputs are already bf16-quantized, so the lo terms
            # carry no information — one native bf16 MXU pass suffices.
            qh = qq.astype(jnp.bfloat16)
            xh = xkm[:].astype(jnp.bfloat16)

            def mm(a, bb):
                return jax.lax.dot_general(
                    a, bb, dimension_numbers=(((2,), (0,)), ((), ())),
                    preferred_element_type=qq.dtype,
                    precision=jax.lax.Precision.DEFAULT)

            if mode == "bf16s":
                res = mm(qh, xh)
            else:
                ql = (qq - qh.astype(qq.dtype)).astype(jnp.bfloat16)
                xl = (xkm[:] - xh.astype(qq.dtype)).astype(jnp.bfloat16)
                res = mm(qh, xh) + (mm(qh, xl) + mm(ql, xh))
        else:
            res = jax.lax.dot_general(
                qq, xkm[:], dimension_numbers=(((2,), (0,)), ((), ())),
                preferred_element_type=qq.dtype,
                precision=jax.lax.Precision.HIGHEST)

        # mask the tiling overhang (rows beyond npts-1) on the last tiles
        mz = jnp.where(iz == nt - 1,
                       (iic <= i_last).astype(u.dtype),
                       1.0).reshape(cb, 1, 1)
        my = jnp.where(iy == nt - 1,
                       (ii <= i_last).astype(u.dtype), 1.0).reshape(1, b, 1)
        res = res * mz * my

        if dirichlet:
            # output combine y = m·res + (1-m)·u on the chunk (global
            # interior coords of row r: z = iz*b + r, y = iy*b + r)
            rz = (jax.lax.broadcasted_iota(jnp.int32, (cb, 1, 1), 0)
                  + iz * b + r0)
            ry = jax.lax.broadcasted_iota(jnp.int32, (1, b, 1), 1) + iy * b
            rx = jax.lax.broadcasted_iota(jnp.int32, (1, 1, X), 2)
            mc = (
                jnp.logical_and(rz != 0, rz != npts - 1)
                & jnp.logical_and(ry != 0, ry != npts - 1)
                & jnp.logical_and(rx != 0, rx != npts - 1)
            ).astype(u.dtype)
            uc = u_full[p + r0 : p + r0 + cb, H : H + b, :]
            res = mc * res + (1.0 - mc) * (uc * mz * my)
        osc[0, p + r0 : p + r0 + cb, H : H + b, :] = res.astype(osc.dtype)

    out_dma(t, "start")

    @pl.when(t == n_grid - 1)
    def _():
        out_dma(t, "wait")


def _check_mosaic_dtype(dtype, interpret):
    """Mosaic compiles f32/bf16 kernels only: a compiled f64 kernel hangs
    this platform's toolchain at lowering (verified on the live chip via
    ``heat --resident`` with dtype=float64).  Refuse up front so callers
    (``_terms_with_kernel``, ``MatrixFree.build``) fall back to the XLA
    tiers, which handle f64 fine."""
    if not interpret and jnp.dtype(dtype).itemsize == 8:
        raise ValueError("Pallas kernels are f32/bf16 only; f64 runs "
                         "interpret-mode (CPU) or the XLA tiers")


class ResidentSeparable:
    """Solver-resident fused apply: halo'd layout in, same layout out.

    ``raw`` chains with zero pad/unpad passes — the CG in
    ``tpufem.solvers.resident`` keeps ALL solver vectors in this layout.
    Measured on-chip (3D Q4, 17M DoFs): 3.2 ms/apply = 5.3 GDoF/s in bf16
    mode vs 4.0 ms for the pad/unpad kernel (scripts/kernel_lab.py v17).

    3D only (the 2D flagship is small enough for the plain kernel); raises
    ValueError when the tiling constraints cannot be met — callers fall
    back to :class:`PallasSeparable`.
    """

    def __init__(self, npts, p, Ks_np, Ms_np, dtype, tile=None, mode="f32",
                 interpret=False, dirichlet=False, interleave=None):
        """``interleave``: number of z-row chunks the per-tile compute is
        split into (chunk k's MXU matmul co-issues with chunk k+1's VPU
        bands — round-5 toolchain re-probe; docs/ROOFLINE.md).  None =
        per-mode default; 1 = the round-4 single-block schedule."""
        _check_mosaic_dtype(dtype, interpret)
        # storage dtype: bf16s keeps the HBM-resident vectors in bf16
        # (halving the DMA floor); compute stays in `dtype` (f32)
        cdt = jnp.dtype(dtype)
        sdt = jnp.dtype(jnp.bfloat16) if mode == "bf16s" else cdt
        # y-halo must be sublane-aligned (DMA rule; 8 rows for f32
        # storage, 16 for bf16 storage) and >= p; tile must be a multiple
        # of sub so tile offsets stay sublane-aligned.  Tiles that are
        # ALSO multiples of p start every tile at periodic-row class 0
        # (single band table); otherwise per-phase tables rotate through
        # the p start classes (p in {5, 7} — VERDICT r2 missing item 3).
        sub = 16 if sdt.itemsize == 2 else 8
        H = sub * max(1, -(-p // sub))
        lcm = sub * p // int(np.gcd(sub, p))
        if tile is None:
            # chip-swept at the 17M flagship with vmem_limit_bytes
            # raised past Mosaic's 16M default (the silent ceiling the
            # round-2/3 clamps were calibrated against): f32 24 > 16 >
            # 32, bf16 24 > 32 > 48, bf16s 48 > 32 > 64 (chained
            # protocol, _VMEM_LIMIT)
            tile = {"f32": 24, "bf16": 24, "bf16s": 48}[mode]
        if lcm <= tile:
            b = tile - tile % lcm  # p-aligned: single-phase tables
            step = lcm
        else:
            b = max(tile - tile % sub, sub)  # phased tables
            step = sub
        while b >= npts and b > step:
            b -= step  # small grids: shrink until >= 2 tiles
        nt = -(-npts // b)
        if nt < 2:
            raise ValueError("resident kernel needs >= 2 tiles per axis")
        if (b > (48 if sdt.itemsize == 2 else 32)
                and not os.environ.get("TPUFEM_TERMS_BX_MAX")):
            # empirically f32 b >= 40 exceeds what the Mosaic toolchain
            # compiles (VMEM budget); env knob = lab recalibration
            raise ValueError(f"tile {b} too large for the VMEM budget")
        L = b + 2 * p
        LY = b + 2 * H
        X = npts if interpret else 128 * (-(-npts // 128))
        sz = nt * b + 2 * p
        sy = nt * b + 2 * H
        self.npts, self.p, self.b, self.nt = npts, p, b, nt
        self.H, self.L, self.LY, self.X = H, L, LY, X
        self.sz, self.sy = sz, sy
        self.mode = mode
        # self.dt is the LAYOUT dtype (what pad/unpad and the solver
        # vectors use); band/matmul constants stay in the compute dtype
        dt = sdt
        self.dt = dt
        self.compute_dt = cdt

        Ks = [np.asarray(K) for K in Ks_np]
        Ms = [np.asarray(M) for M in Ms_np]
        i_last = (npts - 1) % b
        t_last = (npts - 1) // b
        wm = {a: _phase_bands(Ms[a], p, b) for a in (1, 2)}
        wk = {a: _phase_bands(Ks[a], p, b) for a in (1, 2)}
        corr = ({a: _deficits(Ms[a], p)[0] for a in (1, 2)},
                {a: _deficits(Ks[a], p)[0] for a in (1, 2)},
                {a: _deficits(Ms[a], p)[1] for a in (1, 2)},
                {a: _deficits(Ks[a], p)[1] for a in (1, 2)},
                t_last, i_last)
        xkm = np.zeros((2 * X, X))
        xkm[:npts, :npts] = Ks[0].T
        xkm[X : X + npts, :npts] = Ms[0].T
        # NUMPY on purpose: these are baked into every enclosing jit
        # program as compile-time constants.  Device (jnp) constants force
        # a D2H fetch per lowering (jax embeds the VALUE into the MLIR),
        # which on this machine's remote-TPU runtime intermittently hangs
        # for minutes (observed: faulthandler stack in
        # _array_mlir_constant_handler -> array._value) — the root cause
        # of the round-2 "bimodal compile/execute" platform quirk.  Host
        # numpy constants embed with a plain memcpy.
        mats = [np.asarray(xkm, cdt),
                np.asarray(wm[1][:, :, :, None], cdt),
                np.asarray(wk[1][:, :, :, None], cdt),
                np.asarray(wm[2][:, :, :, None, None], cdt),
                np.asarray(wk[2][:, :, :, None, None], cdt)]
        self.dirichlet = bool(dirichlet)
        if interleave is None:
            # chip-swept at the 17M flagship (A/B alternating, same
            # process): f32 5.27->5.94, bf16 6.02->6.48, bf16s
            # 8.35->8.52 GDoF/s (docs/ROOFLINE.md round-5 section)
            default_il = {"f32": 6, "bf16": 6, "bf16s": 12}[mode]
            interleave = int(os.environ.get("TPUFEM_RESIDENT_INTERLEAVE",
                                            str(default_il)))
        # pick the largest divisor of b not exceeding the request so any
        # tile size composes
        while interleave > 1 and b % interleave:
            interleave -= 1
        self.interleave = interleave
        kern = functools.partial(
            _kernel_resident, b=b, L=L, LY=LY, X=X, p=p, H=H, npts=npts,
            corr=corr, nt=nt, mode=mode, dirichlet=self.dirichlet,
            interleave=interleave)
        full = pl.BlockSpec(memory_space=pltpu.VMEM)
        pc = pl.pallas_call(
            kern, grid=(nt * nt,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)] + [full] * 5,
            out_specs=pl.BlockSpec(memory_space=pl.ANY),
            out_shape=jax.ShapeDtypeStruct((sz, sy, X), dt),
            scratch_shapes=[pltpu.VMEM((2, L, LY, X), dt),
                            pltpu.SemaphoreType.DMA((2,)),
                            pltpu.VMEM((1, L, LY, X), dt),
                            pltpu.SemaphoreType.DMA(())],
            compiler_params=None if interpret else _VMEM_LIMIT,
            interpret=interpret)
        self.raw = lambda gp: pc(gp, *mats)
        self._raw_jit = jax.jit(self.raw)
        self.pad = jax.jit(lambda u: jnp.pad(
            u.astype(dt).reshape((npts,) * 3),
            [(p, sz - npts - p), (H, sy - npts - H), (0, X - npts)]))
        # dtype-PRESERVING pad: the resident CG keeps x/r in the compute
        # dtype even when the kernel's layout dtype is bf16 (bf16s)
        self.pad_any = jax.jit(lambda u: jnp.pad(
            u.reshape((npts,) * 3),
            [(p, sz - npts - p), (H, sy - npts - H), (0, X - npts)]))
        self.unpad = jax.jit(
            lambda gp: gp[p : p + npts, H : H + npts, :npts].reshape(-1))
        self._call = jax.jit(lambda u: self.unpad(self.raw(self.pad(u))))

    def __call__(self, u):
        return self._call(u)


class PallasSeparable:
    """Compiled fused apply for one (dim, npts, p, dtype, tile) shape."""

    def __init__(self, dim, npts, p, Ks_np, Ms_np, dtype, tile=None,
                 interpret=False):
        _check_mosaic_dtype(dtype, interpret)
        self.dim, self.npts, self.p = dim, npts, p
        if tile is None:
            tile = p * max(1, 24 // p)  # b % p == 0 (periodic tap classes)
        tile -= tile % p
        while tile > max(npts, p):
            tile -= p
        tile = max(tile, p)
        self.b = tile
        b = tile
        self.n_tiles = nt = -(-npts // tile)
        self.size = nt * tile + 2 * p  # padded z/y extent
        self.L = tile + 2 * p
        # lane (x) padding: Mosaic needs 128-multiples on compiled TPU
        self.X = npts if interpret else 128 * (-(-npts // 128))
        X, L = self.X, self.L
        dt = jnp.dtype(dtype)
        self.dt = dt
        self.interpret = interpret

        Ms = [np.asarray(M) for M in Ms_np]
        Ks = [np.asarray(K) for K in Ks_np]
        # periodic band tables for the non-x axes (y=1[, z=2])
        wm = {a: _periodic_band(Ms[a], p, b) for a in range(1, dim)}
        wk = {a: _periodic_band(Ks[a], p, b) for a in range(1, dim)}
        # boundary-row center-tap corrections per axis
        dm0 = {a: _deficits(Ms[a], p)[0] for a in range(1, dim)}
        dm1 = {a: _deficits(Ms[a], p)[1] for a in range(1, dim)}
        dk0 = {a: _deficits(Ks[a], p)[0] for a in range(1, dim)}
        dk1 = {a: _deficits(Ks[a], p)[1] for a in range(1, dim)}
        i_last = (npts - 1) % b
        t_last = (npts - 1) // b
        corr = (dm0, dk0, dm1, dk1, t_last, i_last)

        # K-stacked x operator [Kx^T ; Mx^T]: (2X, X)
        xkm = np.zeros((2 * X, X))
        xkm[:npts, :npts] = Ks[0].T
        xkm[X : X + npts, :npts] = Ms[0].T
        # numpy constants — see the D2H-at-lowering note in
        # ResidentSeparable.__init__ (device constants hang lowering on
        # this platform)
        mats = [np.asarray(xkm, dt),
                np.asarray(wm[1][:, :, None], dt),
                np.asarray(wk[1][:, :, None], dt)]
        if dim == 3:
            mats += [np.asarray(wm[2][:, :, None, None], dt),
                     np.asarray(wk[2][:, :, None, None], dt)]

        n_grid = nt * nt if dim == 3 else nt
        kern = functools.partial(
            _kernel, b=b, L=L, X=X, p=p, dim=dim, corr=corr, nt=nt,
            n_grid=n_grid,
        )
        full = pl.BlockSpec(memory_space=pltpu.VMEM)
        if dim == 3:
            out_spec = pl.BlockSpec(
                (b, b, X), lambda t, n=nt: (t // n, t % n, 0),
                memory_space=pltpu.VMEM)
            out_shape = jax.ShapeDtypeStruct((nt * b, nt * b, X), dt)
            scratch = [pltpu.VMEM((2, L, L, X), dt),
                       pltpu.SemaphoreType.DMA((2,))]
        else:
            out_spec = pl.BlockSpec((b, X), lambda t: (t, 0),
                                    memory_space=pltpu.VMEM)
            out_shape = jax.ShapeDtypeStruct((nt * b, X), dt)
            scratch = [pltpu.VMEM((2, L, X), dt),
                       pltpu.SemaphoreType.DMA((2,))]

        pc = pl.pallas_call(
            kern,
            grid=(n_grid,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)]
            + [full] * len(mats),
            out_specs=out_spec,
            out_shape=out_shape,
            scratch_shapes=scratch,
            compiler_params=None if interpret else _VMEM_LIMIT,
            interpret=interpret,
        )

        size = self.size

        # raw kernel on an already-padded halo'd block (padded-space
        # solver / kernel-lab use: kills the per-apply pad/unpad passes)
        self._raw_call = jax.jit(lambda gp: pc(gp, *mats))

        def apply(u):
            g = u.reshape((npts,) * dim)
            pad = [(p, size - npts - p)] * (dim - 1) + [(0, X - npts)]
            gp = jnp.pad(g, pad)
            y = pc(gp, *mats)
            sl = tuple(slice(0, npts) for _ in range(dim))
            return y[sl].reshape(-1)

        self._call = jax.jit(apply)

    def __call__(self, u):
        return self._call(u)


def _kernel_resident_terms(u_hbm, xkm, wz, wy, out, scratch, sem,
                           osc, osem, *, b, L, LY, X, p, H, npts,
                           n_terms, nt, mode, interleave=1):
    """Solver-resident fused apply for sum-of-tensor-product operators
    (see :class:`ResidentTerms`).  Same halo'd layout / DMA machinery as
    ``_kernel_resident``; band weights are EXACT per-row tables selected
    by tile index (``_exact_bands``), so there are no phase tables, no
    boundary-deficit corrections and no output overhang mask.

    Schedule per term a:  t_a = Bz(u; wz[a]),  q_a = By(t_a; wy[a]);
    out = [q_0 | ... | q_{T-1}] @ [X_00^T ; ... ; X_{T-1,0}^T]
    — one K-stacked (b^2, T*X) x (T*X, X) MXU contraction per tile.
    """
    t = pl.program_id(0)
    n_grid = nt * nt
    slot = t % 2
    nxt = (t + 1) % 2

    def dma_in(sl, tt):
        return pltpu.make_async_copy(
            u_hbm.at[pl.ds((tt // nt) * b, L),
                     pl.ds(tt % nt * b, LY), :],
            scratch.at[sl], sem.at[sl])

    @pl.when(t == 0)
    def _():
        dma_in(slot, t).start()

    @pl.when(t + 1 < n_grid)
    def _():
        dma_in(nxt, t + 1).start()

    @pl.when(t == 0)
    def _():
        osc[0] = jnp.zeros_like(osc[0])

    def out_dma(tt, action):
        izz, iyy = tt // nt, tt % nt
        zcls = [(izz == 0, 0, 0, p + b),
                (jnp.logical_and(izz > 0, izz < nt - 1), p, None, b),
                (izz == nt - 1, p, p + (nt - 1) * b, b + p)]
        ycls = [(iyy == 0, 0, 0, H + b),
                (jnp.logical_and(iyy > 0, iyy < nt - 1), H, None, b),
                (iyy == nt - 1, H, H + (nt - 1) * b, b + H)]
        for zc, zsrc, zdst, zlen in zcls:
            for yc, ysrc, ydst, ylen in ycls:
                zd = p + izz * b if zdst is None else zdst
                yd = H + iyy * b if ydst is None else ydst

                @pl.when(jnp.logical_and(zc, yc))
                def _(zsrc=zsrc, zd=zd, zlen=zlen, ysrc=ysrc, yd=yd,
                      ylen=ylen):
                    cp = pltpu.make_async_copy(
                        osc.at[0, pl.ds(zsrc, zlen), pl.ds(ysrc, ylen), :],
                        out.at[pl.ds(zd, zlen), pl.ds(yd, ylen), :],
                        osem)
                    if action == "start":
                        cp.start()
                    else:
                        cp.wait()

    dma_in(slot, t).wait()
    u = scratch[slot]
    if mode == "bf16s":
        u = u.astype(jnp.float32)
    iz, iy = t // nt, t % nt
    nb = 2 * p + 1
    dy = H - p

    # band tables are pipeline-streamed per tile (BlockSpec index_maps
    # iz / iy): keeping the whole (n_terms, nt, nb, b, 1[, 1]) tables
    # VMEM-resident pads the trailing singleton dims to the (8, 128)
    # Mosaic tile — ~30 MB at shell/varcoef shapes — which forced the
    # round-4 b*X tile clamp.  The z table is stored with ONE singleton
    # (b, 1) and reshaped to (b, 1, 1) at use.
    wz_t = wz[0]  # (n_terms, nb, b, 1)
    wy_t = wy[0]  # (n_terms, nb, b, 1)

    def band_y(tt_, w9):
        acc = None
        for o in range(nb):
            c = tt_[:, dy + o : dy + o + b, :] * w9[o]
            acc = c if acc is None else acc + c
        return acc

    @pl.when(t >= 1)
    def _():
        out_dma(t - 1, "wait")

    # z-row chunks emitted in straight-line code: chunk k's MXU matmul
    # co-issues with chunk k+1's VPU bands (the round-5 interleave — see
    # _kernel_resident and docs/ROOFLINE.md round-5 section)
    nchunks = interleave if interleave > 0 and b % interleave == 0 else 1
    cb = b // nchunks
    for k in range(nchunks):
        r0 = k * cb

        def band_z_c(tt_, w9, r0=r0):
            acc = None
            for o in range(nb):
                c = (tt_[r0 + o : r0 + o + cb]
                     * w9[o][r0 : r0 + cb][..., None])
                acc = c if acc is None else acc + c
            return acc

        qs = []
        for a in range(n_terms):
            ta = band_z_c(u, wz_t[a])      # (cb, LY, X)
            qs.append(band_y(ta, wy_t[a]))  # (cb, b, X)
        qq = jnp.concatenate(qs, axis=2)  # (cb, b, n_terms*X)

        if mode in ("bf16", "bf16s"):
            qh = qq.astype(jnp.bfloat16)
            xh = xkm[:].astype(jnp.bfloat16)

            def mm(a, bb):
                return jax.lax.dot_general(
                    a, bb, dimension_numbers=(((2,), (0,)), ((), ())),
                    preferred_element_type=qq.dtype,
                    precision=jax.lax.Precision.DEFAULT)

            if mode == "bf16s":
                res = mm(qh, xh)
            else:
                ql = (qq - qh.astype(qq.dtype)).astype(jnp.bfloat16)
                xl = (xkm[:] - xh.astype(qq.dtype)).astype(jnp.bfloat16)
                res = mm(qh, xh) + (mm(qh, xl) + mm(ql, xh))
        else:
            res = jax.lax.dot_general(
                qq, xkm[:], dimension_numbers=(((2,), (0,)), ((), ())),
                preferred_element_type=qq.dtype,
                precision=jax.lax.Precision.HIGHEST)
        osc[0, p + r0 : p + r0 + cb, H : H + b, :] = res.astype(osc.dtype)

    out_dma(t, "start")

    @pl.when(t == n_grid - 1)
    def _():
        out_dma(t, "wait")


class ResidentTerms:
    """Solver-resident fused apply for SUM-OF-TENSOR-PRODUCT operators

        A = sum_a  X_{a,2} (x) X_{a,1} (x) X_{a,0}        (z, y, x)

    with arbitrary banded (bandwidth 2p+1) 1D matrices — the exact
    separable-metric factorization of orthogonal curved meshes
    (polar/spherical shells, ``Mesh.separable_metric``) and of graded/
    stretched rectilinear grids (SURVEY.md §2 'Laplace operator' curved
    case; reference runs these through the SAME fused kernel).

    Differences vs :class:`ResidentSeparable` (the uniform-grid
    specialization):
    - band weights are EXACT per-row VMEM tables (``_exact_bands``)
      selected by tile index — no periodic-row assumption, no phase
      rotation, no boundary-deficit corrections, no overhang mask;
    - no shared z-partial between terms (each term has its own 1D
      matrices): 2 banded stages per term = 6 for 3D Laplace, vs 5;
    - the K-stacked x matmul is (b^2, 3X) x (3X, X).

    Same halo'd layout contract as ResidentSeparable: input AND output
    in (sz, sy, X) with data at [p:p+npts, H:H+npts, :npts], zeros
    elsewhere; ``raw`` chains with zero pad/unpad passes.  3D only.
    """

    def __init__(self, npts, p, terms_np, dtype, tile=None, mode="f32",
                 interpret=False, interleave=None):
        _check_mosaic_dtype(dtype, interpret)
        cdt = jnp.dtype(dtype)
        sdt = jnp.dtype(jnp.bfloat16) if mode == "bf16s" else cdt
        sub = 16 if sdt.itemsize == 2 else 8
        H = sub * max(1, -(-p // sub))
        if tile is None:
            # chip-swept at the 17M 3-term flagship AND the 2.1M shell
            # scale with vmem_limit_bytes raised past Mosaic's 16M
            # default: f32 24 > 16 > 32 (both scales), bf16s 48 > 32
            # (both), bf16 32 > 24 at 17M but 24 >= 16 > 32 at 2.1M
            tile = {"f32": 24, "bf16": 32, "bf16s": 48}[mode]
            if mode == "bf16" and npts <= 256:
                tile = 24
        b = max(tile - tile % sub, sub)  # exact tables: no p-alignment
        while b >= npts and b > sub:
            b -= sub  # small grids: shrink until >= 2 tiles
        X = npts if interpret else 128 * (-(-npts // 128))
        # measured compile-OK boundary with _VMEM_LIMIT (100 MB): f32
        # b=40 and bf16s b=64 both compile at X=384 — the clamp keeps a
        # margin under those; the live set is the per-term (b, LY, X)
        # chains + the (b*b, n_terms*X) qq + xkm, all linear in the
        # term count beyond 3
        bx_max = ((24576 if mode == "bf16s" else 15360) * 3
                  // max(len(terms_np), 3))
        # lab knob for on-chip recalibration sweeps (kernel_lab use)
        env_bx = os.environ.get("TPUFEM_TERMS_BX_MAX")
        if env_bx:
            bx_max = int(env_bx)
        if not interpret:
            while b * X > bx_max and b > sub:
                b -= sub
        nt = -(-npts // b)
        if nt < 2:
            raise ValueError("resident kernel needs >= 2 tiles per axis")
        if b > (48 if sdt.itemsize == 2 else 32) and not env_bx:
            raise ValueError(f"tile {b} too large for the VMEM budget")
        if b * X > bx_max and not interpret:
            raise ValueError(f"tile {b} x lanes {X} exceeds the VMEM "
                             "budget")
        L = b + 2 * p
        LY = b + 2 * H
        sz = nt * b + 2 * p
        sy = nt * b + 2 * H
        self.npts, self.p, self.b, self.nt = npts, p, b, nt
        self.H, self.L, self.LY, self.X = H, L, LY, X
        self.sz, self.sy = sz, sy
        self.mode = mode
        self.dt = sdt
        self.compute_dt = cdt
        self.dirichlet = False  # mask algebra stays in HBM for this tier

        terms = [[np.asarray(m) for m in t3] for t3 in terms_np]
        n_terms = len(terms)
        assert all(len(t3) == 3 for t3 in terms), "3D terms only"
        # exact per-row band tables, (nt, n_terms, nb, b, 1) — tile
        # axis LEADING so each grid step streams only its own slab
        # (see the kernel's table-layout note)
        wz = np.stack([_exact_bands(t3[2], p, b, nt) for t3 in terms])
        wy = np.stack([_exact_bands(t3[1], p, b, nt) for t3 in terms])
        # K-stacked x operator [X_00^T ; X_10^T ; X_20^T]: (n_terms*X, X)
        xkm = np.zeros((n_terms * X, X))
        for a, t3 in enumerate(terms):
            xkm[a * X : a * X + npts, :npts] = t3[0].T
        # numpy constants on purpose — device constants D2H-hang at
        # lowering on this platform (see ResidentSeparable.__init__)
        nb = 2 * p + 1
        mats = [np.asarray(xkm, cdt),
                np.asarray(wz.transpose(1, 0, 2, 3)[..., None], cdt),
                np.asarray(wy.transpose(1, 0, 2, 3)[..., None], cdt)]
        if interleave is None:
            # same per-mode defaults as ResidentSeparable (round-5
            # interleave; chip-swept — docs/ROOFLINE.md)
            default_il = {"f32": 6, "bf16": 6, "bf16s": 12}[mode]
            interleave = int(os.environ.get("TPUFEM_RESIDENT_INTERLEAVE",
                                            str(default_il)))
        while interleave > 1 and b % interleave:
            interleave -= 1
        self.interleave = interleave
        kern = functools.partial(
            _kernel_resident_terms, b=b, L=L, LY=LY, X=X, p=p, H=H,
            npts=npts, n_terms=n_terms, nt=nt, mode=mode,
            interleave=interleave)
        full = pl.BlockSpec(memory_space=pltpu.VMEM)
        tab_blk = (1, n_terms, nb, b, 1)
        wz_spec = pl.BlockSpec(tab_blk, lambda t: (t // nt, 0, 0, 0, 0))
        wy_spec = pl.BlockSpec(tab_blk, lambda t: (t % nt, 0, 0, 0, 0))
        pc = pl.pallas_call(
            kern, grid=(nt * nt,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY), full,
                      wz_spec, wy_spec],
            out_specs=pl.BlockSpec(memory_space=pl.ANY),
            out_shape=jax.ShapeDtypeStruct((sz, sy, X), sdt),
            scratch_shapes=[pltpu.VMEM((2, L, LY, X), sdt),
                            pltpu.SemaphoreType.DMA((2,)),
                            pltpu.VMEM((1, L, LY, X), sdt),
                            pltpu.SemaphoreType.DMA(())],
            compiler_params=None if interpret else _VMEM_LIMIT,
            interpret=interpret)
        self.raw = lambda gp: pc(gp, *mats)
        self._raw_jit = jax.jit(self.raw)
        self.pad = jax.jit(lambda u: jnp.pad(
            u.astype(sdt).reshape((npts,) * 3),
            [(p, sz - npts - p), (H, sy - npts - H), (0, X - npts)]))
        self.pad_any = jax.jit(lambda u: jnp.pad(
            u.reshape((npts,) * 3),
            [(p, sz - npts - p), (H, sy - npts - H), (0, X - npts)]))
        self.unpad = jax.jit(
            lambda gp: gp[p : p + npts, H : H + npts, :npts].reshape(-1))
        self._call = jax.jit(lambda u: self.unpad(self.raw(self.pad(u))))

    def __call__(self, u):
        return self._call(u)


def _xblocks(terms_x: list, X: int, npts: int) -> tuple:
    """Block-tridiagonal x-stage operators for the 2D block-x path.

    The x factors are banded (width 2p+1 <= 129), so output lane-block
    j (128 lanes) reads only input lane-blocks j-1..j+1.  For each j
    build the K-stacked (n_terms*384, 128) operator
    ``op[a*384 + r, col] = M_a[j*128 + col, (j-1)*128 + r]`` (zero
    outside [0, npts) in either global index) and dedupe identical
    blocks: on a uniform grid interior rows repeat with period p, so
    the unique set is O(p) (one per (j*128 mod p) class + the two
    boundary blocks) — VMEM stays O(p) instead of the dense path's
    O(npts^2).  Returns (ops (n_uniq, n_terms*384, 128), groups) with
    groups[k] = sorted tuple of the j's sharing op k — same-class
    interior blocks form an arithmetic progression, which the kernel
    turns into ONE fori_loop with a static matmul operand (unrolling
    all nbx blocks gives every iteration its own Mosaic stack slot and
    blows the 16 MB scoped-VMEM limit)."""
    nbx = X // 128
    n_terms = len(terms_x)
    mats = []
    for m in terms_x:
        mx = np.zeros((X, X))
        mx[:npts, :npts] = np.asarray(m)
        mats.append(mx)
    uniq: dict = {}
    ops, idx = [], []
    for j in range(nbx):
        op = np.zeros((n_terms * 384, 128))
        lo = (j - 1) * 128
        r0, r1 = max(0, -lo), min(384, X - lo)
        for a in range(n_terms):
            op[a * 384 + r0 : a * 384 + r1, :] = \
                mats[a][j * 128 : (j + 1) * 128, lo + r0 : lo + r1].T
        key = op.tobytes()
        k = uniq.get(key)
        if k is None:
            k = len(ops)
            uniq[key] = k
            ops.append(op)
        idx.append(k)
    groups = tuple(
        tuple(j for j in range(nbx) if idx[j] == k)
        for k in range(len(ops)))
    return np.stack(ops), groups


def _kernel_resident_2d(u_hbm, xkm, wy, out, scratch, sem, osc, osem,
                        *args, b, LY, X, p, H, npts, n_terms, nt, mode,
                        blk_groups=None):
    """2D solver-resident fused apply (see :class:`ResidentTerms2D`).
    One banded VPU stage per term + either one K-stacked x matmul
    (dense path) or, when ``blk_groups`` is set, a block-tridiagonal
    sweep of (b, n_terms*384) x (n_terms*384, 128) matmuls sharing
    deduped operators (large-npts path); exact per-row band tables
    (``_exact_bands``); halo'd (sy, X) layout in/out with
    kernel-maintained zero borders."""
    t = pl.program_id(0)
    slot = t % 2
    nxt = (t + 1) % 2

    def dma_in(sl, tt):
        return pltpu.make_async_copy(
            u_hbm.at[pl.ds(tt * b, LY), :], scratch.at[sl], sem.at[sl])

    @pl.when(t == 0)
    def _():
        dma_in(slot, t).start()

    @pl.when(t + 1 < nt)
    def _():
        dma_in(nxt, t + 1).start()

    @pl.when(t == 0)
    def _():
        osc[0] = jnp.zeros_like(osc[0])

    def out_dma(tt, action):
        ycls = [(tt == 0, 0, 0, H + b),
                (jnp.logical_and(tt > 0, tt < nt - 1), H, None, b),
                (tt == nt - 1, H, H + (nt - 1) * b, b + H)]
        for yc, ysrc, ydst, ylen in ycls:
            yd = H + tt * b if ydst is None else ydst

            @pl.when(yc)
            def _(ysrc=ysrc, yd=yd, ylen=ylen):
                cp = pltpu.make_async_copy(
                    osc.at[0, pl.ds(ysrc, ylen), :],
                    out.at[pl.ds(yd, ylen), :], osem)
                if action == "start":
                    cp.start()
                else:
                    cp.wait()

    dma_in(slot, t).wait()
    nb = 2 * p + 1
    dy = H - p

    # wy is pipeline-streamed per tile (BlockSpec index_map t -> tile t),
    # so only this tile's (n_terms, nb, b, 1) slab is in VMEM — keeping
    # the whole (n_terms, nt, nb, b, 1) table resident lane-pads the
    # singleton dim 128x (~38 MB at nt=32, measured Mosaic stack
    # overflow) and needs a where-chain select.
    wy_t = wy[0]  # (n_terms, nb, b, 1)

    def band_y(u, w9):  # (LY, X) -> (b, X)
        acc = None
        for o in range(nb):
            c = u[dy + o : dy + o + b] * w9[o]
            acc = c if acc is None else acc + c
        return acc

    def mm_fast(a, bb, out_dt):
        return jax.lax.dot_general(
            a, bb, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=out_dt,
            precision=jax.lax.Precision.DEFAULT)

    def mm_x(qq, xop, xop_f32):
        """Mode-dispatched x matmul: qq (b, K) @ xop (K, N)."""
        if mode == "bf16s":
            return mm_fast(qq.astype(jnp.bfloat16),
                           xop.astype(jnp.bfloat16), qq.dtype)
        if mode == "bf16":
            qh = qq.astype(jnp.bfloat16)
            ql = (qq - qh.astype(qq.dtype)).astype(jnp.bfloat16)
            xh = xop_f32.astype(jnp.bfloat16)
            xl = (xop_f32 - xh.astype(qq.dtype)).astype(jnp.bfloat16)
            return (mm_fast(qh, xh, qq.dtype)
                    + (mm_fast(qh, xl, qq.dtype)
                       + mm_fast(ql, xh, qq.dtype)))
        return jax.lax.dot_general(
            qq, xop, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=qq.dtype,
            precision=jax.lax.Precision.HIGHEST)

    def wait_prev():
        @pl.when(t >= 1)
        def _():
            out_dma(t - 1, "wait")

    if blk_groups is None:
        u = scratch[slot]
        if mode == "bf16s":
            u = u.astype(jnp.float32)
        qq = jnp.concatenate(
            [band_y(u, wy_t[a]) for a in range(n_terms)],
            axis=1)  # (b, n_terms*X)
        res = mm_x(qq, xkm[:], xkm[:]).astype(osc.dtype)
        wait_prev()
        osc[0, H : H + b, :] = res
    else:
        # Block-tridiagonal x sweep.  The banded-y outputs are staged
        # through the qsc scratch ref (one (b, X+256) slab per term,
        # side strips zeroed once): the ref round-trip keeps the live
        # vector set O(b*X) per term, and it normalizes band_y's
        # sublane-offset layout, which Mosaic's concat refuses to mix
        # with fresh zeros.  BOTH sweeps run as fori_loops with
        # 128-aligned pl.ds lane offsets — a fully unrolled sweep gives
        # every iteration its own Mosaic stack slot and overflows the
        # 16 MB scoped-VMEM limit at X ~ 4k (measured: 45.4M).
        (qsc,) = args

        @pl.when(t == 0)
        def _():
            qsc[:, :, :128] = jnp.zeros((n_terms, b, 128), qsc.dtype)
            qsc[:, :, 128 + X :] = jnp.zeros((n_terms, b, 128), qsc.dtype)

        # lane-chunked banded y, one register-accumulated CH-lane
        # chunk per fori step (+ a static tail for X % CH)
        CH = 1024

        def ych(a, w9, c0, cl):
            acc = None
            for o in range(nb):
                v = scratch[slot, dy + o : dy + o + b, pl.ds(c0, cl)]
                if mode == "bf16s":
                    v = v.astype(jnp.float32)
                cc = v * w9[o]
                acc = cc if acc is None else acc + cc
            qsc[a, :, pl.ds(128 + c0, cl)] = acc

        nfull, rem = X // CH, X % CH
        for a in range(n_terms):
            w9 = wy_t[a]  # (nb, b, 1)

            def ybody(c, carry, a=a, w9=w9):
                ych(a, w9, pl.multiple_of(c * CH, CH), CH)
                return carry

            if nfull:
                jax.lax.fori_loop(0, nfull, ybody, 0)
            if rem:
                ych(a, w9, nfull * CH, rem)
        wait_prev()

        # x sweep grouped by unique operator: each group's op is a
        # STATIC matmul operand; same-class interior blocks form an
        # arithmetic progression -> one fori_loop per group
        def xblk(xop, j128):
            qwin = jnp.concatenate(
                [qsc[a, :, pl.ds(j128, 384)] for a in range(n_terms)],
                axis=1)
            osc[0, H : H + b, pl.ds(j128, 128)] = \
                mm_x(qwin, xop, xop).astype(osc.dtype)

        for k, js in enumerate(blk_groups):
            xop = xkm[k]
            ap = len(js) > 2 and len(set(np.diff(js))) == 1
            if ap:
                j0, stride = js[0], js[1] - js[0]

                def xbody(m, carry, xop=xop, j0=j0, stride=stride):
                    xblk(xop, pl.multiple_of(
                        (j0 + m * stride) * 128, 128))
                    return carry

                jax.lax.fori_loop(0, len(js), xbody, 0)
            else:
                for j in js:
                    xblk(xop, j * 128)

    out_dma(t, "start")

    @pl.when(t == nt - 1)
    def _():
        out_dma(t, "wait")


class ResidentTerms2D:
    """2D solver-resident fused apply for A = sum_a X_{a,1} (x) X_{a,0}
    (y, x) — the 2D form of :class:`ResidentTerms` (uniform grids pass
    the 2-term Laplace factorization; 2D shells their weighted terms).
    Halo'd (sy, X) layout with data at [H:H+npts, :npts]; ``raw`` chains
    with zero pad/unpad passes."""

    def __init__(self, npts, p, terms_np, dtype, tile=None, mode="f32",
                 interpret=False, x_mode="auto"):
        _check_mosaic_dtype(dtype, interpret)
        cdt = jnp.dtype(dtype)
        sdt = jnp.dtype(jnp.bfloat16) if mode == "bf16s" else cdt
        sub = 16 if sdt.itemsize == 2 else 8
        H = sub * max(1, -(-p // sub))
        n_terms = len(terms_np)
        odt = jnp.dtype(jnp.bfloat16) if mode == "bf16s" else cdt
        dense_bytes = n_terms * (128 * -(-npts // 128)) ** 2 * odt.itemsize
        if x_mode == "auto":
            # dense single K-stacked x matmul while the operator fits
            # VMEM; beyond npts ~ 600 switch to the block-tridiagonal
            # x sweep (the large-grid path, ROADMAP r4 gap 3)
            x_mode = "dense" if dense_bytes <= 6 << 20 else "block"
        if tile is None:
            # 2D tiles are (LY, X) only — much smaller than 3D; larger
            # tiles amortize the matmul M dimension.  The block path
            # holds per-term (b, X+256) padded q fields in VMEM, so it
            # runs a smaller default tile.
            if x_mode == "block":
                # chip-swept at npts=4097: f32 96>64>112, bf16 96>64,
                # bf16s 128>144 (160 overflows scoped VMEM)
                tile = {"f32": 96, "bf16": 96, "bf16s": 128}[mode]
            else:
                tile = {"f32": 128, "bf16": 128, "bf16s": 256}[mode]
        b = max(tile - tile % sub, sub)
        while b >= npts and b > sub:
            b -= sub  # small grids: shrink until >= 2 tiles
        nt = -(-npts // b)
        if nt < 2:
            raise ValueError("resident kernel needs >= 2 tiles per axis")
        LY = b + 2 * H
        X = npts if (interpret and x_mode == "dense") \
            else 128 * (-(-npts // 128))
        sy = nt * b + 2 * H
        self.npts, self.p, self.b, self.nt = npts, p, b, nt
        self.H, self.LY, self.X, self.sy = H, LY, X, sy
        self.mode = mode
        self.x_mode = x_mode
        self.dt = sdt
        self.compute_dt = cdt
        self.dirichlet = False

        terms = [[np.asarray(m) for m in t2] for t2 in terms_np]
        assert all(len(t2) == 2 for t2 in terms), "2D terms only"
        wy = np.stack([_exact_bands(t2[1], p, b, nt) for t2 in terms])
        blk_groups = None
        if x_mode == "dense":
            if dense_bytes > 6 << 20:
                raise ValueError(f"x operator ({n_terms}x{X}x{X}) "
                                 "exceeds the VMEM budget")
            xkm = np.zeros((n_terms * X, X))
            for a, t2 in enumerate(terms):
                xkm[a * X : a * X + npts, :npts] = t2[0].T
        else:
            if 2 * p + 1 > 129:
                raise ValueError("block-x path needs bandwidth <= 129")
            xkm, blk_groups = _xblocks([t2[0] for t2 in terms], X, npts)
            if xkm.size * odt.itemsize > 6 << 20:
                # general (non-repeating) terms on a huge grid: the
                # deduped block set itself outgrows VMEM — stay on the
                # XLA terms tier
                raise ValueError(
                    f"{xkm.shape[0]} unique x blocks exceed the VMEM "
                    "budget")
        # bf16s never needs the f32 operator — store it narrow (halves
        # the VMEM bill; the in-kernel astype becomes a no-op)
        nb = 2 * p + 1
        mats = [np.asarray(xkm, odt),
                np.asarray(wy.transpose(1, 0, 2, 3)[..., None], cdt)]
        kern = functools.partial(
            _kernel_resident_2d, b=b, LY=LY, X=X, p=p, H=H, npts=npts,
            n_terms=n_terms, nt=nt, mode=mode, blk_groups=blk_groups)
        full = pl.BlockSpec(memory_space=pltpu.VMEM)
        wy_spec = pl.BlockSpec((1, n_terms, nb, b, 1),
                               lambda t: (t, 0, 0, 0, 0))
        pc = pl.pallas_call(
            kern, grid=(nt,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY), full, wy_spec],
            out_specs=pl.BlockSpec(memory_space=pl.ANY),
            out_shape=jax.ShapeDtypeStruct((sy, X), sdt),
            scratch_shapes=[pltpu.VMEM((2, LY, X), sdt),
                            pltpu.SemaphoreType.DMA((2,)),
                            pltpu.VMEM((1, LY, X), sdt),
                            pltpu.SemaphoreType.DMA(())]
            + ([pltpu.VMEM((n_terms, b, X + 256), cdt)]
               if blk_groups is not None else []),
            compiler_params=None if interpret else _VMEM_LIMIT,
            interpret=interpret)
        self.raw = lambda gp: pc(gp, *mats)
        self._raw_jit = jax.jit(self.raw)
        self.pad = jax.jit(lambda u: jnp.pad(
            u.astype(sdt).reshape((npts,) * 2),
            [(H, sy - npts - H), (0, X - npts)]))
        self.pad_any = jax.jit(lambda u: jnp.pad(
            u.reshape((npts,) * 2),
            [(H, sy - npts - H), (0, X - npts)]))
        self.unpad = jax.jit(
            lambda gp: gp[H : H + npts, :npts].reshape(-1))
        self._call = jax.jit(lambda u: self.unpad(self.raw(self.pad(u))))

    def __call__(self, u):
        return self._call(u)
