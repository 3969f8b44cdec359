#!/usr/bin/env python
"""Kernel lab: measure Pallas apply-kernel variants on the real chip.

Round-2 roofline work (VERDICT item 2).  Each variant computes the same
separable 3D Laplace apply  y = (K (x) M (x) M + ...) u  on the flagship
problem (3D Q4, refine 6, 17M DoFs, f32) and is checked against the
XLA separable tier before timing.  Run ON the TPU:

    python scripts/kernel_lab.py [--refine 6] [--variants v0 v2 ...]
"""

from __future__ import annotations

import argparse
import functools
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_tpu")

import jax
import jax.numpy as jnp

from tpufem.utils.cache import enable_persistent_cache

enable_persistent_cache()
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpufem.fem.dof_handler import DoFHandler
from tpufem.fem.mesh import Mesh
from tpufem.ops.separable import global_1d_matrices, laplace_apply_separable


def hp(expr, a, m, prec):
    return jnp.einsum(expr, a, m, preferred_element_type=a.dtype,
                      precision=prec)


# ----------------------------------------------------------------------
# V2: relayout-free matmul schedule.  Every contraction is a plain 2D or
# natural batched matmul:
#   z:  (b, L) @ (L, L*X)      -- collapse (y, x) into lanes-major dim
#   y:  batched over z: (b, L) @ (L, X)
#   x:  (b*b*?, X) @ (X, X)
def _kernel_v2(u_hbm, mz, kz, my, ky, mx, kx, out, scratch, sem, *, b, L, X,
               prec):
    iz, iy = pl.program_id(0), pl.program_id(1)
    dma = pltpu.make_async_copy(
        u_hbm.at[pl.ds(iz * b, L), pl.ds(iy * b, L), :], scratch, sem)
    dma.start()
    dma.wait()
    u = scratch[:]  # (L, L, X)
    # ---- x contractions: (L*L, X) @ (X, X)
    u2 = u.reshape(L * L, X)
    ax = jnp.dot(u2, mx[:].T, preferred_element_type=u.dtype,
                 precision=prec).reshape(L, L, X)
    gx = jnp.dot(u2, kx[:].T, preferred_element_type=u.dtype,
                 precision=prec).reshape(L, L, X)
    # ---- y contractions: batched matmul over z: out[z] = M @ u[z]
    m_ax = hp("by,zyx->zbx", my[:], ax, prec)
    k_ax = hp("by,zyx->zbx", ky[:], ax, prec)
    m_gx = hp("by,zyx->zbx", my[:], gx, prec)
    # ---- z contractions: (b, L) @ (L, b*X)
    t1 = m_ax.reshape(L, b * X)
    t2 = (k_ax + m_gx).reshape(L, b * X)
    y = (jnp.dot(kz[:], t1, preferred_element_type=u.dtype, precision=prec)
         + jnp.dot(mz[:], t2, preferred_element_type=u.dtype,
                   precision=prec))
    out[:] = y.reshape(b, b, X)


# ----------------------------------------------------------------------
# V3: banded x on the VPU.  The x-axis 1D operators are banded (2p+1);
# apply them as shifted elementwise FMAs with per-position band tables
# instead of dense X-wide matmuls.  z/y stay as relayout-free matmuls.
def _kernel_v3(u_hbm, mz, kz, my, ky, mbx, kbx, out, scratch, sem,
               *, b, L, X, p, prec):
    iz, iy = pl.program_id(0), pl.program_id(1)
    dma = pltpu.make_async_copy(
        u_hbm.at[pl.ds(iz * b, L), pl.ds(iy * b, L), :], scratch, sem)
    dma.start()
    dma.wait()
    nb = 2 * p + 1
    ax = None
    gx = None
    for o in range(nb):
        sl = scratch[:, :, o : o + X]  # static lane-shifted slice
        ax = sl * mbx[o] if ax is None else ax + sl * mbx[o]
        gx = sl * kbx[o] if gx is None else gx + sl * kbx[o]
    m_ax = hp("by,zyx->zbx", my[:], ax, prec)
    k_ax = hp("by,zyx->zbx", ky[:], ax, prec)
    m_gx = hp("by,zyx->zbx", my[:], gx, prec)
    t1 = m_ax.reshape(L, b * X)
    t2 = (k_ax + m_gx).reshape(L, b * X)
    y = (jnp.dot(kz[:], t1, preferred_element_type=ax.dtype, precision=prec)
         + jnp.dot(mz[:], t2, preferred_element_type=ax.dtype,
                   precision=prec))
    out[:] = y.reshape(b, b, X)



# V6: x as clean (L*L, X) matmul; y/z as v0-style einsums (isolates the
# effect of the x-contraction form).
def _kernel_v6(u_hbm, mz, kz, my, ky, mx, kx, out, scratch, sem, *, b, L, X,
               prec):
    iz, iy = pl.program_id(0), pl.program_id(1)
    dma = pltpu.make_async_copy(
        u_hbm.at[pl.ds(iz * b, L), pl.ds(iy * b, L), :], scratch, sem)
    dma.start()
    dma.wait()
    u = scratch[:]
    u2 = u.reshape(L * L, X)
    ax = jnp.dot(u2, mx[:].T, preferred_element_type=u.dtype,
                 precision=prec).reshape(L, L, X)
    gx = jnp.dot(u2, kx[:].T, preferred_element_type=u.dtype,
                 precision=prec).reshape(L, L, X)
    m_ax = hp("zyx,by->zbx", ax, my[:], prec)
    k_ax = hp("zyx,by->zbx", ax, ky[:], prec)
    m_gx = hp("zyx,by->zbx", gx, my[:], prec)
    y = hp("zyx,bz->byx", m_ax, kz[:], prec) + hp(
        "zyx,bz->byx", k_ax + m_gx, mz[:], prec)
    out[:] = y


# V8: explicit transpose pipeline — every contraction is a natural
# (rows, K) @ (K, N) MXU matmul with K in lanes of the left operand:
#   x: (z*y, X) @ (X, X)
#   y: transpose zyx->zxy, then (z*x, L) @ (L, b)
#   z: transpose zxb->xbz, then (x*b, L) @ (L, b), transpose back
def _kernel_v8(u_hbm, mz, kz, my, ky, mx, kx, out, scratch, sem, *, b, L, X,
               prec):
    iz, iy = pl.program_id(0), pl.program_id(1)
    dma = pltpu.make_async_copy(
        u_hbm.at[pl.ds(iz * b, L), pl.ds(iy * b, L), :], scratch, sem)
    dma.start()
    dma.wait()
    u = scratch[:]

    def mm(a2, M):  # (rows, K) @ (K, cols)
        return jnp.dot(a2, M, preferred_element_type=a2.dtype,
                       precision=prec)

    u2 = u.reshape(L * L, X)
    ax = mm(u2, mx[:].T).reshape(L, L, X)
    gx = mm(u2, kx[:].T).reshape(L, L, X)
    # y stage: zyx -> zxy
    axT = jnp.transpose(ax, (0, 2, 1)).reshape(L * X, L)
    gxT = jnp.transpose(gx, (0, 2, 1)).reshape(L * X, L)
    m_ax = mm(axT, my[:].T).reshape(L, X, b)   # (z, x, by)
    k_ax = mm(axT, ky[:].T).reshape(L, X, b)
    m_gx = mm(gxT, my[:].T).reshape(L, X, b)
    # z stage: zxb -> xbz
    t1 = jnp.transpose(m_ax, (1, 2, 0)).reshape(X * b, L)
    t2 = jnp.transpose(k_ax + m_gx, (1, 2, 0)).reshape(X * b, L)
    y = (mm(t1, kz[:].T) + mm(t2, mz[:].T)).reshape(X, b, b)
    out[:] = jnp.transpose(y, (2, 1, 0))  # (bz, by, X)



# VX / VXY: stage-ablation timers (x only / x + y) — output is wrong on
# purpose; they exist to attribute time inside the v0 schedule.
def _kernel_vx(u_hbm, mz, kz, my, ky, mx, kx, out, scratch, sem, *, b, L, X,
               prec):
    iz, iy = pl.program_id(0), pl.program_id(1)
    dma = pltpu.make_async_copy(
        u_hbm.at[pl.ds(iz * b, L), pl.ds(iy * b, L), :], scratch, sem)
    dma.start()
    dma.wait()
    u = scratch[:]
    ax = hp("zyx,ox->zyo", u, mx[:], prec)
    gx = hp("zyx,ox->zyo", u, kx[:], prec)
    out[:] = ax[:b, :b] + gx[:b, :b]


def _kernel_vxy(u_hbm, mz, kz, my, ky, mx, kx, out, scratch, sem, *, b, L, X,
                prec):
    iz, iy = pl.program_id(0), pl.program_id(1)
    dma = pltpu.make_async_copy(
        u_hbm.at[pl.ds(iz * b, L), pl.ds(iy * b, L), :], scratch, sem)
    dma.start()
    dma.wait()
    u = scratch[:]
    ax = hp("zyx,ox->zyo", u, mx[:], prec)
    gx = hp("zyx,ox->zyo", u, kx[:], prec)
    m_ax = hp("zyx,by->zbx", ax, my[:], prec)
    k_ax = hp("zyx,by->zbx", ax, ky[:], prec)
    m_gx = hp("zyx,by->zbx", gx, my[:], prec)
    out[:] = (m_ax + k_ax + m_gx)[:b]


# V9: v0 schedule with every contraction as a manual 3-pass bf16 product
# (the HIGH algorithm Mosaic's dot rejects directly): ~f32 accuracy at
# half the MXU passes of HIGHEST.
def _split_bf16(a):
    hi = a.astype(jnp.bfloat16)
    lo = (a - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


def _es3(expr, a, m):
    ah, al = _split_bf16(a)
    mh, ml = _split_bf16(m)
    d = jax.lax.Precision.DEFAULT
    f = lambda x, y: jnp.einsum(expr, x, y,
                                preferred_element_type=jnp.float32,
                                precision=d)
    return f(ah, mh) + f(al, mh) + f(ah, ml)


def _kernel_v9(u_hbm, mz, kz, my, ky, mx, kx, out, scratch, sem, *, b, L, X,
               prec):
    iz, iy = pl.program_id(0), pl.program_id(1)
    dma = pltpu.make_async_copy(
        u_hbm.at[pl.ds(iz * b, L), pl.ds(iy * b, L), :], scratch, sem)
    dma.start()
    dma.wait()
    u = scratch[:]
    ax = _es3("zyx,ox->zyo", u, mx[:])
    gx = _es3("zyx,ox->zyo", u, kx[:])
    m_ax = _es3("zyx,by->zbx", ax, my[:])
    k_ax = _es3("zyx,by->zbx", ax, ky[:])
    m_gx = _es3("zyx,by->zbx", gx, my[:])
    y = _es3("zyx,bz->byx", m_ax, kz[:]) + _es3(
        "zyx,bz->byx", k_ax + m_gx, mz[:])
    out[:] = y



# V12: x on the MXU (dense einsum) + banded y/z on the VPU.  On a uniform
# grid the interior rows of the assembled 1D operators are periodic with
# period p, so for b % p == 0 every tile shares the same per-tap weight
# vectors (compile-time constants).  The only aperiodic rows are global 0
# and npts-1, whose CENTER tap differs (one assembly neighbor missing) —
# fixed by a branchless one-hot correction on the boundary tiles.
def _kernel_v12(u_hbm, mx, kx, wm_y, wk_y, wm_z, wk_z, out, scratch, sem,
                *, b, L, X, p, npts, corr, prec):
    iz, iy = pl.program_id(0), pl.program_id(1)
    dma = pltpu.make_async_copy(
        u_hbm.at[pl.ds(iz * b, L), pl.ds(iy * b, L), :], scratch, sem)
    dma.start()
    dma.wait()
    u = scratch[:]
    ax = hp("zyx,ox->zyo", u, mx[:], prec)
    gx = hp("zyx,ox->zyo", u, kx[:], prec)

    nb = 2 * p + 1

    def band_y(t, w9):  # (L, L, X) -> (L, b, X); w9 ref (9, b, 1)
        acc = None
        for o in range(nb):
            c = t[:, o : o + b, :] * w9[o]
            acc = c if acc is None else acc + c
        return acc

    def band_z(t, w9):  # (L, b, X) -> (b, b, X); w9 ref (9, b, 1, 1)
        acc = None
        for o in range(nb):
            c = t[o : o + b] * w9[o]
            acc = c if acc is None else acc + c
        return acc

    # one-hot boundary-row corrections (center-tap deficit of rows 0 and
    # npts-1), branchless via where(iz/iy == boundary tile)
    (dm0, dk0, dm1, dk1, t_last, i_last) = corr
    ii = jax.lax.broadcasted_iota(jnp.int32, (b, 1), 0)
    oh0 = (ii == 0).astype(u.dtype)          # (b, 1)
    oh1 = (ii == i_last).astype(u.dtype)

    def corr_y(t_in, acc, d0, d1):
        c0 = jnp.where(iy == 0, d0, 0.0).astype(u.dtype)
        c1 = jnp.where(iy == t_last, d1, 0.0).astype(u.dtype)
        return (acc
                + (c0 * oh0) * t_in[:, p : p + 1, :]
                + (c1 * oh1) * t_in[:, p + i_last : p + i_last + 1, :])

    def corr_z(t_in, acc, d0, d1):
        c0 = jnp.where(iz == 0, d0, 0.0).astype(u.dtype)
        c1 = jnp.where(iz == t_last, d1, 0.0).astype(u.dtype)
        return (acc
                + (c0 * oh0).reshape(b, 1, 1) * t_in[p : p + 1]
                + (c1 * oh1).reshape(b, 1, 1)
                * t_in[p + i_last : p + i_last + 1])

    by_ = corr_y(ax, band_y(ax, wm_y), dm0[1], dm1[1])
    cy = corr_y(ax, band_y(ax, wk_y), dk0[1], dk1[1])
    dy = corr_y(gx, band_y(gx, wm_y), dm0[1], dm1[1])
    t1 = by_
    t2 = cy + dy
    y = corr_z(t1, band_z(t1, wk_z), dk0[2], dk1[2]) + corr_z(
        t2, band_z(t2, wm_z), dm0[2], dm1[2])
    out[:] = y



# V13: banded z/y FIRST (on the halo'd tile), x-matmul LAST on the b x b
# output tile — x-stage FLOPs drop by (L/b)^2 vs v12.
#   s = Bz(u, Mz); t = Bz(u, Kz)
#   q1 = By(s, My); q2 = By(s, Ky); q3 = By(t, My)
#   y  = q1 @ Kx^T + (q2 + q3) @ Mx^T
def _kernel_v13(u_hbm, mx, kx, wm_y, wk_y, wm_z, wk_z, out, scratch, sem,
                *, b, L, X, p, npts, corr, prec):
    iz, iy = pl.program_id(0), pl.program_id(1)
    dma = pltpu.make_async_copy(
        u_hbm.at[pl.ds(iz * b, L), pl.ds(iy * b, L), :], scratch, sem)
    dma.start()
    dma.wait()
    u = scratch[:]
    nb = 2 * p + 1

    def band_z(t, w9):  # (L, Y, X) -> (b, Y, X); w9 (9, b, 1, 1)
        acc = None
        for o in range(nb):
            c = t[o : o + b] * w9[o]
            acc = c if acc is None else acc + c
        return acc

    def band_y(t, w9):  # (Z, L, X) -> (Z, b, X); w9 (9, b, 1)
        acc = None
        for o in range(nb):
            c = t[:, o : o + b, :] * w9[o]
            acc = c if acc is None else acc + c
        return acc

    (dm0, dk0, dm1, dk1, t_last, i_last) = corr
    ii = jax.lax.broadcasted_iota(jnp.int32, (b, 1), 0)
    oh0 = (ii == 0).astype(u.dtype)
    oh1 = (ii == i_last).astype(u.dtype)

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

    s = corr_z(u, band_z(u, wm_z), dm0[2], dm1[2])   # (b, L, X)
    t = corr_z(u, band_z(u, wk_z), dk0[2], dk1[2])
    q1 = corr_y(s, band_y(s, wm_y), dm0[1], dm1[1])  # (b, b, X)
    q2 = corr_y(s, band_y(s, wk_y), dk0[1], dk1[1])
    q3 = corr_y(t, band_y(t, wm_y), dm0[1], dm1[1])
    q23 = q2 + q3
    y = hp("zyx,ox->zyo", q1, kx[:], prec) + hp(
        "zyx,ox->zyo", q23, mx[:], prec)
    out[:] = y


# V14: v13 + double-buffered input DMA over a 1D grid — prefetch tile t+1
# while computing tile t (the guide's double-buffering pattern).
def _kernel_v14(u_hbm, mx, kx, wm_y, wk_y, wm_z, wk_z, out, scratch, sem,
                *, b, L, X, p, npts, corr, prec, nt):
    t = pl.program_id(0)
    slot = jax.lax.rem(t, 2)
    nxt = jax.lax.rem(t + 1, 2)

    def dma(sl, tt):
        return pltpu.make_async_copy(
            u_hbm.at[pl.ds((tt // nt) * b, L), pl.ds(jax.lax.rem(tt, nt) * b,
                                                     L), :],
            scratch.at[sl], sem.at[sl])

    @pl.when(t == 0)
    def _():
        dma(slot, t).start()

    @pl.when(t + 1 < nt * nt)
    def _():
        dma(nxt, t + 1).start()

    dma(slot, t).wait()
    u = scratch[slot]
    iz, iy = t // nt, jax.lax.rem(t, nt)
    nb = 2 * p + 1

    def band_z(tt_, w9):
        acc = None
        for o in range(nb):
            c = tt_[o : o + b] * w9[o]
            acc = c if acc is None else acc + c
        return acc

    def band_y(tt_, w9):
        acc = None
        for o in range(nb):
            c = tt_[:, o : o + b, :] * w9[o]
            acc = c if acc is None else acc + c
        return acc

    (dm0, dk0, dm1, dk1, t_last, i_last) = corr
    ii = jax.lax.broadcasted_iota(jnp.int32, (b, 1), 0)
    oh0 = (ii == 0).astype(u.dtype)
    oh1 = (ii == i_last).astype(u.dtype)

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
    tq = corr_z(u, band_z(u, wk_z), dk0[2], dk1[2])
    q1 = corr_y(s, band_y(s, wm_y), dm0[1], dm1[1])
    q2 = corr_y(s, band_y(s, wk_y), dk0[1], dk1[1])
    q3 = corr_y(tq, band_y(tq, wm_y), dm0[1], dm1[1])
    q23 = q2 + q3
    y = hp("zyx,ox->zyo", q1, kx[:], prec) + hp(
        "zyx,ox->zyo", q23, mx[:], prec)
    out[:] = y


# V15: v14 with the two x-matmuls K-stacked into ONE matmul:
#   y = [q1 | q23] @ [Kx^T ; Mx^T]   (contraction over 2X sums both terms)
def _kernel_v15(u_hbm, xkm, wm_y, wk_y, wm_z, wk_z, out, scratch, sem,
                *, b, L, X, p, npts, corr, prec, nt):
    t = pl.program_id(0)
    slot = jax.lax.rem(t, 2)
    nxt = jax.lax.rem(t + 1, 2)

    def dma(sl, tt):
        return pltpu.make_async_copy(
            u_hbm.at[pl.ds((tt // nt) * b, L),
                     pl.ds(jax.lax.rem(tt, nt) * b, L), :],
            scratch.at[sl], sem.at[sl])

    @pl.when(t == 0)
    def _():
        dma(slot, t).start()

    @pl.when(t + 1 < nt * nt)
    def _():
        dma(nxt, t + 1).start()

    dma(slot, t).wait()
    u = scratch[slot]
    iz, iy = t // nt, jax.lax.rem(t, nt)
    nb = 2 * p + 1

    def band_z(tt_, w9):
        acc = None
        for o in range(nb):
            c = tt_[o : o + b] * w9[o]
            acc = c if acc is None else acc + c
        return acc

    def band_y(tt_, w9):
        acc = None
        for o in range(nb):
            c = tt_[:, o : o + b, :] * w9[o]
            acc = c if acc is None else acc + c
        return acc

    (dm0, dk0, dm1, dk1, t_last, i_last) = corr
    ii = jax.lax.broadcasted_iota(jnp.int32, (b, 1), 0)
    oh0 = (ii == 0).astype(u.dtype)
    oh1 = (ii == i_last).astype(u.dtype)

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
    out[:] = hp("zyk,ko->zyo", qq, xkm[:], prec)


# VCOPY: DMA + copy only — the per-tile overhead floor.
def _kernel_vcopy(u_hbm, xkm, wm_y, wk_y, wm_z, wk_z, out, scratch, sem,
                  *, b, L, X, p, npts, corr, prec, nt):
    t = pl.program_id(0)
    slot = jax.lax.rem(t, 2)
    nxt = jax.lax.rem(t + 1, 2)

    def dma(sl, tt):
        return pltpu.make_async_copy(
            u_hbm.at[pl.ds((tt // nt) * b, L),
                     pl.ds(jax.lax.rem(tt, nt) * b, L), :],
            scratch.at[sl], sem.at[sl])

    @pl.when(t == 0)
    def _():
        dma(slot, t).start()

    @pl.when(t + 1 < nt * nt)
    def _():
        dma(nxt, t + 1).start()

    dma(slot, t).wait()
    out[:] = scratch[slot][p : p + b, p : p + b, :]


# VBAND: DMA + banded z/y only (no x matmul).
def _kernel_vband(u_hbm, xkm, wm_y, wk_y, wm_z, wk_z, out, scratch, sem,
                  *, b, L, X, p, npts, corr, prec, nt):
    t = pl.program_id(0)
    slot = jax.lax.rem(t, 2)
    nxt = jax.lax.rem(t + 1, 2)

    def dma(sl, tt):
        return pltpu.make_async_copy(
            u_hbm.at[pl.ds((tt // nt) * b, L),
                     pl.ds(jax.lax.rem(tt, nt) * b, L), :],
            scratch.at[sl], sem.at[sl])

    @pl.when(t == 0)
    def _():
        dma(slot, t).start()

    @pl.when(t + 1 < nt * nt)
    def _():
        dma(nxt, t + 1).start()

    dma(slot, t).wait()
    u = scratch[slot]
    nb = 2 * p + 1

    def band_z(tt_, w9):
        acc = None
        for o in range(nb):
            c = tt_[o : o + b] * w9[o]
            acc = c if acc is None else acc + c
        return acc

    def band_y(tt_, w9):
        acc = None
        for o in range(nb):
            c = tt_[:, o : o + b, :] * w9[o]
            acc = c if acc is None else acc + c
        return acc

    s = band_z(u, wm_z)
    q1 = band_y(s, wm_y)
    q2 = band_y(s, wk_y)
    tq = band_z(u, wk_z)
    q3 = band_y(tq, wm_y)
    out[:] = q1 + q2 + q3


# V17: solver-resident halo'd layout.  Input AND output live in the same
# (size, size, X) layout with an H-row zero halo (H = 8 for DMA sublane
# alignment, H >= p), so a solver can chain applies with ZERO pad/unpad
# passes.  The kernel writes its output back into that layout with explicit
# offset DMAs: boundary tiles extend their write to cover the halo strips
# (sourced from the zeroed borders of the out scratch), and the last tile
# row/column masks the tiling overhang (rows beyond npts-1) to zero, so the
# output's halo/overhang invariant (all zeros) is maintained kernel-side.
# "bf16" mode computes the K-stacked x matmul as bf16x3 (hi/lo split, three
# DEFAULT-precision passes instead of f32-HIGHEST's six).
def _kernel_v17(u_hbm, xkm, wm_y, wk_y, wm_z, wk_z, out, scratch, sem,
                osc, osem, *, b, L, LY, X, p, H, npts, corr, prec, nt, mode):
    t = pl.program_id(0)
    n_grid = nt * nt
    slot = jax.lax.rem(t, 2)
    nxt = jax.lax.rem(t + 1, 2)
    i_last = (npts - 1) % b

    # Alignment rules (Mosaic DMA on (A, B, X) f32 arrays): dim-1 offsets
    # and extents must be multiples of 8 (sublane tiling), dim-2 is always
    # full here (lane tiling), dim-0 is unconstrained.  Hence: tight p-row
    # halo in z (dim 0), 8-aligned H-row halo in y (dim 1) with an aligned
    # LY = b + 2H read window (data used starts at H - p inside it).
    def dma_in(sl, tt):
        return pltpu.make_async_copy(
            u_hbm.at[pl.ds((tt // nt) * b, L),
                     pl.ds(jax.lax.rem(tt, nt) * b, LY), :],
            scratch.at[sl], sem.at[sl])

    @pl.when(t == 0)
    def _():
        dma_in(slot, t).start()

    @pl.when(t + 1 < n_grid)
    def _():
        dma_in(nxt, t + 1).start()

    # zero the out-scratch borders once; data writes only ever touch the
    # center [p:p+b, H:H+b], so the borders stay zero and the
    # boundary-extended copies below source genuine zeros from them.
    @pl.when(t == 0)
    def _():
        osc[0] = jnp.zeros_like(osc[0])

    def out_dma(tt, action):
        """Start/wait the out copy for tile tt.  9 static geometry
        classes: {lo, mid, hi} per axis (boundary tiles extend their write
        over the halo strips, sourcing zeros from the osc borders)."""
        izz, iyy = tt // nt, jax.lax.rem(tt, nt)
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
    iz, iy = t // nt, jax.lax.rem(t, nt)
    nb = 2 * p + 1
    dy = H - p  # y-axis data offset inside the aligned read window

    if mode == "copy":  # DMA-geometry ablation: no compute at all
        @pl.when(t >= 1)
        def _():
            out_dma(t - 1, "wait")

        osc[0, p : p + b, H : H + b, :] = u[p : p + b, H : H + b, :]
        out_dma(t, "start")

        @pl.when(t == n_grid - 1)
        def _():
            out_dma(t, "wait")
        return

    def band_z(tt_, w9):
        acc = None
        for o in range(nb):
            c = tt_[o : o + b] * w9[o]
            acc = c if acc is None else acc + c
        return acc

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

    def corr_z(t_in, acc, d0, d1):
        c0 = jnp.where(iz == 0, d0, 0.0).astype(u.dtype)
        c1 = jnp.where(iz == t_last, d1, 0.0).astype(u.dtype)
        return (acc
                + (c0 * oh0).reshape(b, 1, 1) * t_in[p : p + 1]
                + (c1 * oh1).reshape(b, 1, 1)
                * t_in[p + i_last_c : p + i_last_c + 1])

    def corr_y(t_in, acc, d0, d1):
        c0 = jnp.where(iy == 0, d0, 0.0).astype(u.dtype)
        c1 = jnp.where(iy == t_last, d1, 0.0).astype(u.dtype)
        return (acc
                + (c0 * oh0) * t_in[:, H : H + 1, :]
                + (c1 * oh1) * t_in[:, H + i_last_c : H + i_last_c + 1, :])

    if mode == "mm":  # ablation: x matmul only, bands skipped
        uc = u[p : p + b, H : H + b, :]
        qq = jnp.concatenate([uc, uc], axis=2)
    else:
        s = corr_z(u, band_z(u, wm_z), dm0[2], dm1[2])
        q1 = corr_y(s, band_y(s, wm_y), dm0[1], dm1[1])
        q2 = corr_y(s, band_y(s, wk_y), dk0[1], dk1[1])
        tq = corr_z(u, band_z(u, wk_z), dk0[2], dk1[2])
        q3 = corr_y(tq, band_y(tq, wm_y), dm0[1], dm1[1])
        qq = jnp.concatenate([q1, q2 + q3], axis=2)  # (b, b, 2X)

    if mode == "bands":  # ablation: bands only, matmul skipped
        res = q1 + q2 + q3
    elif mode == "bf16":
        # bf16x3: a ~= hi + lo exactly in bf16 pairs; drop the lo*lo term
        qh = qq.astype(jnp.bfloat16)
        ql = (qq - qh.astype(qq.dtype)).astype(jnp.bfloat16)
        xh = xkm[:].astype(jnp.bfloat16)
        xl = (xkm[:] - xh.astype(qq.dtype)).astype(jnp.bfloat16)

        def mm(a, bb):
            return jax.lax.dot_general(
                a, bb, dimension_numbers=(((2,), (0,)), ((), ())),
                preferred_element_type=qq.dtype,
                precision=jax.lax.Precision.DEFAULT)

        res = mm(qh, xh) + (mm(qh, xl) + mm(ql, xh))
    else:
        res = hp("zyk,ko->zyo", qq, xkm[:], prec)

    # mask the tiling overhang (out rows beyond npts-1) on the last tiles
    mz = jnp.where(iz == nt - 1,
                   (ii <= i_last).astype(u.dtype), 1.0).reshape(b, 1, 1)
    my = jnp.where(iy == nt - 1,
                   (ii <= i_last).astype(u.dtype), 1.0).reshape(1, b, 1)
    res = res * mz * my

    # single-buffered out scratch: the previous tile's out copy had this
    # tile's whole compute time to drain; wait just before overwriting.
    @pl.when(t >= 1)
    def _():
        out_dma(t - 1, "wait")

    osc[0, p : p + b, H : H + b, :] = res
    out_dma(t, "start")

    @pl.when(t == n_grid - 1)
    def _():
        out_dma(t, "wait")


def _kernel_v20(u_hbm, xd, xsl, wm_y, wk_y, wm_z, wk_z, out, scratch, sem,
                osc, osem, *, b, L, LY, X, p, H, npts, corr, prec, nt,
                mode):
    """v17 with a BLOCK-BANDED x matmul: the 1D x operators have bandwidth
    2p+1 << 128, so in 128-lane blocks they are block-tridiagonal with the
    off-diagonal blocks only p rows thick.  The dense (2X x X) K-stacked
    matmul becomes 2*(X/128) diagonal (128,128) matmuls plus p-thin sliver
    matmuls at the block seams — ~2.8x fewer MXU FLOPs at p=4, X=384.

    xd:  (2, nblk, 128, 128) diagonal blocks of [KxT; MxT]
    xsl: (2, 2*(nblk-1), p, 128) seam slivers (K then M; per seam:
         left-neighbor then right-neighbor contribution)
    """
    t = pl.program_id(0)
    n_grid = nt * nt
    slot = jax.lax.rem(t, 2)
    nxt = jax.lax.rem(t + 1, 2)
    i_last = (npts - 1) % b
    nblk = X // 128

    def dma_in(sl, tt):
        return pltpu.make_async_copy(
            u_hbm.at[pl.ds((tt // nt) * b, L),
                     pl.ds(jax.lax.rem(tt, nt) * b, LY), :],
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
        izz, iyy = tt // nt, jax.lax.rem(tt, nt)
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
    iz, iy = t // nt, jax.lax.rem(t, nt)
    nb = 2 * p + 1
    dy = H - p

    def band_z(tt_, w9):
        acc = None
        for o in range(nb):
            c = tt_[o : o + b] * w9[o]
            acc = c if acc is None else acc + c
        return acc

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

    def corr_z(t_in, acc, d0, d1):
        c0 = jnp.where(iz == 0, d0, 0.0).astype(u.dtype)
        c1 = jnp.where(iz == t_last, d1, 0.0).astype(u.dtype)
        return (acc
                + (c0 * oh0).reshape(b, 1, 1) * t_in[p : p + 1]
                + (c1 * oh1).reshape(b, 1, 1)
                * t_in[p + i_last_c : p + i_last_c + 1])

    def corr_y(t_in, acc, d0, d1):
        c0 = jnp.where(iy == 0, d0, 0.0).astype(u.dtype)
        c1 = jnp.where(iy == t_last, d1, 0.0).astype(u.dtype)
        return (acc
                + (c0 * oh0) * t_in[:, H : H + 1, :]
                + (c1 * oh1) * t_in[:, H + i_last_c : H + i_last_c + 1, :])

    s = corr_z(u, band_z(u, wm_z), dm0[2], dm1[2])
    q1 = corr_y(s, band_y(s, wm_y), dm0[1], dm1[1])
    q2 = corr_y(s, band_y(s, wk_y), dk0[1], dk1[1])
    tq = corr_z(u, band_z(u, wk_z), dk0[2], dk1[2])
    q3 = corr_y(tq, band_y(tq, wm_y), dm0[1], dm1[1])
    q23 = q2 + q3

    def mmx(a, bb, pr):
        return jax.lax.dot_general(
            a, bb, dimension_numbers=(((2,), (0,)), ((), ())),
            preferred_element_type=u.dtype, precision=pr)

    if mode == "bf16":
        q1h = q1.astype(jnp.bfloat16)
        q1l = (q1 - q1h.astype(u.dtype)).astype(jnp.bfloat16)
        q23h = q23.astype(jnp.bfloat16)
        q23l = (q23 - q23h.astype(u.dtype)).astype(jnp.bfloat16)

        def blockmm(q, qh, ql, wmat):
            wh = wmat.astype(jnp.bfloat16)
            wl = (wmat - wh.astype(u.dtype)).astype(jnp.bfloat16)
            d = jax.lax.Precision.DEFAULT
            return (mmx(qh, wh, d) + (mmx(qh, wl, d) + mmx(ql, wh, d)))
    else:
        def blockmm(q, qh, ql, wmat):
            return mmx(q, wmat, prec)

    res_blocks = []
    for j in range(nblk):
        lo = j * 128
        acc = blockmm(q1[:, :, lo : lo + 128],
                      None if mode != "bf16" else q1h[:, :, lo : lo + 128],
                      None if mode != "bf16" else q1l[:, :, lo : lo + 128],
                      xd[0, j])
        acc = acc + blockmm(
            q23[:, :, lo : lo + 128],
            None if mode != "bf16" else q23h[:, :, lo : lo + 128],
            None if mode != "bf16" else q23l[:, :, lo : lo + 128],
            xd[1, j])
        # seam slivers (always f32 HIGHEST: K=p matmuls are ~free)
        if j > 0:  # contribution from the last p lanes of block j-1
            acc = acc + mmx(q1[:, :, lo - p : lo], xsl[0, 2 * (j - 1), :p],
                            jax.lax.Precision.HIGHEST)
            acc = acc + mmx(q23[:, :, lo - p : lo], xsl[1, 2 * (j - 1), :p],
                            jax.lax.Precision.HIGHEST)
        if j < nblk - 1:  # contribution from the first p lanes of block j+1
            hi = lo + 128
            acc = acc + mmx(q1[:, :, hi : hi + p], xsl[0, 2 * j + 1, :p],
                            jax.lax.Precision.HIGHEST)
            acc = acc + mmx(q23[:, :, hi : hi + p], xsl[1, 2 * j + 1, :p],
                            jax.lax.Precision.HIGHEST)
        res_blocks.append(acc)
    res = jnp.concatenate(res_blocks, axis=2)

    mz = jnp.where(iz == nt - 1,
                   (ii <= i_last).astype(u.dtype), 1.0).reshape(b, 1, 1)
    my = jnp.where(iy == nt - 1,
                   (ii <= i_last).astype(u.dtype), 1.0).reshape(1, b, 1)
    res = res * mz * my

    @pl.when(t >= 1)
    def _():
        out_dma(t - 1, "wait")

    osc[0, p : p + b, H : H + b, :] = res
    out_dma(t, "start")

    @pl.when(t == n_grid - 1)
    def _():
        out_dma(t, "wait")


def _kernel_v19(u_hbm, xkm, wm_y, wk_y, wm_z, wk_z, out, scratch, sem,
                osc, osem, qsc, *, b, L, LY, X, p, H, npts, corr, prec, nt,
                mode):
    """v17 software-pipelined across grid steps: the VPU band stages of
    tile t run concurrently with the MXU x-matmul of tile t-1 (qq double-
    buffered in VMEM), so the two units overlap instead of serializing.
    The out DMA trails by one tile."""
    t = pl.program_id(0)
    n_grid = nt * nt
    slot = jax.lax.rem(t, 2)
    nxt = jax.lax.rem(t + 1, 2)
    i_last = (npts - 1) % b

    def dma_in(sl, tt):
        return pltpu.make_async_copy(
            u_hbm.at[pl.ds((tt // nt) * b, L),
                     pl.ds(jax.lax.rem(tt, nt) * b, LY), :],
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
        izz, iyy = tt // nt, jax.lax.rem(tt, nt)
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

    nb = 2 * p + 1
    dy = H - p
    (dm0, dk0, dm1, dk1, t_last, i_last_c) = corr
    ii = jax.lax.broadcasted_iota(jnp.int32, (b, 1), 0)
    oh0 = (ii == 0).astype(xkm.dtype)
    oh1 = (ii == i_last_c).astype(xkm.dtype)

    def band_z(tt_, w9):
        acc = None
        for o in range(nb):
            c = tt_[o : o + b] * w9[o]
            acc = c if acc is None else acc + c
        return acc

    def band_y(tt_, w9):
        acc = None
        for o in range(nb):
            c = tt_[:, dy + o : dy + o + b, :] * w9[o]
            acc = c if acc is None else acc + c
        return acc

    def corr_z(tile, t_in, acc, d0, d1):
        izz = tile // nt
        c0 = jnp.where(izz == 0, d0, 0.0).astype(t_in.dtype)
        c1 = jnp.where(izz == t_last, d1, 0.0).astype(t_in.dtype)
        return (acc
                + (c0 * oh0).reshape(b, 1, 1) * t_in[p : p + 1]
                + (c1 * oh1).reshape(b, 1, 1)
                * t_in[p + i_last_c : p + i_last_c + 1])

    def corr_y(tile, t_in, acc, d0, d1):
        iyy = jax.lax.rem(tile, nt)
        c0 = jnp.where(iyy == 0, d0, 0.0).astype(t_in.dtype)
        c1 = jnp.where(iyy == t_last, d1, 0.0).astype(t_in.dtype)
        return (acc
                + (c0 * oh0) * t_in[:, H : H + 1, :]
                + (c1 * oh1) * t_in[:, H + i_last_c : H + i_last_c + 1, :])

    def bands(tile, u):
        s = corr_z(tile, u, band_z(u, wm_z), dm0[2], dm1[2])
        q1 = corr_y(tile, s, band_y(s, wm_y), dm0[1], dm1[1])
        q2 = corr_y(tile, s, band_y(s, wk_y), dk0[1], dk1[1])
        tq = corr_z(tile, u, band_z(u, wk_z), dk0[2], dk1[2])
        q3 = corr_y(tile, tq, band_y(tq, wm_y), dm0[1], dm1[1])
        return jnp.concatenate([q1, q2 + q3], axis=2)  # (b, b, 2X)

    def mm_store(tile, qq):
        """x-matmul of the qq buffered for `tile`, write to osc, ship."""
        if mode == "bf16":
            qh = qq.astype(jnp.bfloat16)
            ql = (qq - qh.astype(qq.dtype)).astype(jnp.bfloat16)
            xh = xkm[:].astype(jnp.bfloat16)
            xl = (xkm[:] - xh.astype(qq.dtype)).astype(jnp.bfloat16)

            def mmx(a, bb):
                return jax.lax.dot_general(
                    a, bb, dimension_numbers=(((2,), (0,)), ((), ())),
                    preferred_element_type=qq.dtype,
                    precision=jax.lax.Precision.DEFAULT)

            res = mmx(qh, xh) + (mmx(qh, xl) + mmx(ql, xh))
        else:
            res = hp("zyk,ko->zyo", qq, xkm[:], prec)
        izz = tile // nt
        iyy = jax.lax.rem(tile, nt)
        mz = jnp.where(izz == nt - 1,
                       (ii <= i_last).astype(res.dtype), 1.0).reshape(b, 1, 1)
        my = jnp.where(iyy == nt - 1,
                       (ii <= i_last).astype(res.dtype), 1.0).reshape(1, b, 1)
        res = res * mz * my
        # single out scratch: the copy for tile-2 had a full pipeline
        # stage to drain; wait before overwriting.
        @pl.when(tile >= 1)
        def _():
            out_dma(tile - 1, "wait")

        osc[0, p : p + b, H : H + b, :] = res
        out_dma(tile, "start")

    # ---- pipeline body: issue MXU work for t-1 first (it has no
    # dependence on this tile's DMA), then the VPU bands for t.
    # Scratch slot indices are static per branch (dynamic VMEM scratch
    # indexing crashes this toolchain's Mosaic helper).
    @pl.when(jnp.logical_and(t >= 1, nxt == 0))
    def _():
        mm_store(t - 1, qsc[0])

    @pl.when(jnp.logical_and(t >= 1, nxt == 1))
    def _():
        mm_store(t - 1, qsc[1])

    dma_in(slot, t).wait()

    @pl.when(slot == 0)
    def _():
        qsc[0] = bands(t, scratch[0])

    @pl.when(slot == 1)
    def _():
        qsc[1] = bands(t, scratch[1])

    @pl.when(jnp.logical_and(t == n_grid - 1, slot == 0))
    def _():
        mm_store(t, qsc[0])
        out_dma(t, "wait")

    @pl.when(jnp.logical_and(t == n_grid - 1, slot == 1))
    def _():
        mm_store(t, qsc[1])
        out_dma(t, "wait")


def _kernel_v18(u_hbm, xkm, wm_y, wk_y, wm_z, wk_z, out, scratch, sem,
                osc, osem, *, b, L, LY, X, p, H, npts, corr, prec, nt, mode):
    """v17 with fused band stages: each z-slice read feeds BOTH the M and
    K accumulators (halves VPU slice traffic), and the z stage is trimmed
    to the L y-columns the y stage actually consumes."""
    t = pl.program_id(0)
    n_grid = nt * nt
    slot = jax.lax.rem(t, 2)
    nxt = jax.lax.rem(t + 1, 2)
    i_last = (npts - 1) % b

    def dma_in(sl, tt):
        return pltpu.make_async_copy(
            u_hbm.at[pl.ds((tt // nt) * b, L),
                     pl.ds(jax.lax.rem(tt, nt) * b, LY), :],
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
        izz, iyy = tt // nt, jax.lax.rem(tt, nt)
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
    iz, iy = t // nt, jax.lax.rem(t, nt)
    nb = 2 * p + 1
    dy = H - p

    def band_z2(tt_, wa, wb):
        """One pass over z taps feeding two accumulators; y trimmed to the
        L columns consumed by the y stage."""
        acca = accb = None
        for o in range(nb):
            sl = tt_[o : o + b, dy : dy + L, :]
            ca, cb = sl * wa[o], sl * wb[o]
            acca = ca if acca is None else acca + ca
            accb = cb if accb is None else accb + cb
        return acca, accb

    def band_y2(tt_, wa, wb):
        acca = accb = None
        for o in range(nb):
            sl = tt_[:, o : o + b, :]
            ca = sl * wa[o]
            acca = ca if acca is None else acca + ca
            if wb is not None:
                cb = sl * wb[o]
                accb = cb if accb is None else accb + cb
        return acca, accb

    (dm0, dk0, dm1, dk1, t_last, i_last_c) = corr
    ii = jax.lax.broadcasted_iota(jnp.int32, (b, 1), 0)
    oh0 = (ii == 0).astype(u.dtype)
    oh1 = (ii == i_last_c).astype(u.dtype)

    def corr_z(t_in, acc, d0, d1):
        c0 = jnp.where(iz == 0, d0, 0.0).astype(u.dtype)
        c1 = jnp.where(iz == t_last, d1, 0.0).astype(u.dtype)
        return (acc
                + (c0 * oh0).reshape(b, 1, 1)
                * t_in[p : p + 1, dy : dy + L]
                + (c1 * oh1).reshape(b, 1, 1)
                * t_in[p + i_last_c : p + i_last_c + 1, dy : dy + L])

    def corr_y(t_in, acc, d0, d1):
        c0 = jnp.where(iy == 0, d0, 0.0).astype(u.dtype)
        c1 = jnp.where(iy == t_last, d1, 0.0).astype(u.dtype)
        return (acc
                + (c0 * oh0) * t_in[:, p : p + 1, :]
                + (c1 * oh1) * t_in[:, p + i_last_c : p + i_last_c + 1, :])

    s0, t0_ = band_z2(u, wm_z, wk_z)      # (b, L, X) each, one slice pass
    s = corr_z(u, s0, dm0[2], dm1[2])
    tq = corr_z(u, t0_, dk0[2], dk1[2])
    q1r, q2r = band_y2(s, wm_y, wk_y)     # shared slice reads of s
    q3r, _ = band_y2(tq, wm_y, None)
    q1 = corr_y(s, q1r, dm0[1], dm1[1])
    q2 = corr_y(s, q2r, dk0[1], dk1[1])
    q3 = corr_y(tq, q3r, dm0[1], dm1[1])
    qq = jnp.concatenate([q1, q2 + q3], axis=2)  # (b, b, 2X)

    if mode == "bf16":
        qh = qq.astype(jnp.bfloat16)
        ql = (qq - qh.astype(qq.dtype)).astype(jnp.bfloat16)
        xh = xkm[:].astype(jnp.bfloat16)
        xl = (xkm[:] - xh.astype(qq.dtype)).astype(jnp.bfloat16)

        def mm(a, bb):
            return jax.lax.dot_general(
                a, bb, dimension_numbers=(((2,), (0,)), ((), ())),
                preferred_element_type=qq.dtype,
                precision=jax.lax.Precision.DEFAULT)

        res = mm(qh, xh) + (mm(qh, xl) + mm(ql, xh))
    else:
        res = hp("zyk,ko->zyo", qq, xkm[:], prec)

    mz = jnp.where(iz == nt - 1,
                   (ii <= i_last).astype(u.dtype), 1.0).reshape(b, 1, 1)
    my = jnp.where(iy == nt - 1,
                   (ii <= i_last).astype(u.dtype), 1.0).reshape(1, b, 1)
    res = res * mz * my

    @pl.when(t >= 1)
    def _():
        out_dma(t - 1, "wait")

    osc[0, p : p + b, H : H + b, :] = res
    out_dma(t, "start")

    @pl.when(t == n_grid - 1)
    def _():
        out_dma(t, "wait")


class V17Kernel:
    """Solver-resident halo'd-layout kernel (see _kernel_v17).

    Layout: (nt*b + 2p, nt*b + 2H, X) with data at [p:p+npts, H:H+npts,
    :npts] and zeros elsewhere.  __call__ takes/returns flat vectors
    (pads/unpads, for parity + the legacy protocol); .raw takes/returns
    the halo'd layout directly — the solver-resident rate.
    """

    def __init__(self, npts, p, K1, M1, h, b=24, prec="highest",
                 dtype=jnp.float32, mode="f32", fused=False, kern_name=None):
        prec = dict(highest=jax.lax.Precision.HIGHEST,
                    high=jax.lax.Precision.HIGH,
                    default=jax.lax.Precision.DEFAULT)[prec]
        H = 8 * max(1, -(-p // 8))
        lcm = 8 * p // int(np.gcd(8, p))
        b -= b % lcm
        b = max(b, lcm)
        nt = -(-npts // b)
        if nt < 2:
            raise ValueError("v17 needs nt >= 2")
        L = b + 2 * p
        LY = b + 2 * H
        X = 128 * (-(-npts // 128))
        sz = nt * b + 2 * p   # z extent (tight halo; dim-0 unconstrained)
        sy = nt * b + 2 * H   # y extent (8-aligned halo)
        self.npts, self.p, self.b, self.nt = npts, p, b, nt
        self.H, self.L, self.LY, self.X = H, L, LY, X
        self.sz, self.sy = sz, sy
        dt = dtype
        Ks = [np.asarray(K1 / h[a]) for a in range(3)]
        Ms = [np.asarray(M1 * h[a]) for a in range(3)]
        i_last = (npts - 1) % b
        t_last = (npts - 1) // b
        wm = {a: _periodic_band(Ms[a], p, b) for a in (1, 2)}
        wk = {a: _periodic_band(Ks[a], p, b) for a in (1, 2)}

        def deficits(M1_):
            per = _periodic_band(M1_, p, 1)[p, 0]
            return (M1_[0, 0] - per, M1_[npts - 1, npts - 1] - per)

        corr = ({a: deficits(Ms[a])[0] for a in (1, 2)},
                {a: deficits(Ks[a])[0] for a in (1, 2)},
                {a: deficits(Ms[a])[1] for a in (1, 2)},
                {a: deficits(Ks[a])[1] for a in (1, 2)},
                t_last, i_last)
        kfn = {"v17": _kernel_v17, "v18": _kernel_v18, "v19": _kernel_v19,
               "v20": _kernel_v20}[kern_name or ("v18" if fused else "v17")]
        band_mats = [jnp.asarray(wm[1][:, :, None], dt),
                     jnp.asarray(wk[1][:, :, None], dt),
                     jnp.asarray(wm[2][:, :, None, None], dt),
                     jnp.asarray(wk[2][:, :, None, None], dt)]
        if kfn is _kernel_v20:
            # block-banded x operators: diagonal (128,128) blocks + p-thin
            # seam slivers of [KxT; MxT]
            nblk = X // 128
            KxT = np.zeros((X, X))
            MxT = np.zeros((X, X))
            KxT[:npts, :npts] = Ks[0].T
            MxT[:npts, :npts] = Ms[0].T
            xd = np.zeros((2, nblk, 128, 128))
            xsl = np.zeros((2, max(2 * (nblk - 1), 1), p, 128))
            for oi, W in enumerate((KxT, MxT)):
                for j in range(nblk):
                    lo = j * 128
                    xd[oi, j] = W[lo : lo + 128, lo : lo + 128]
                for j in range(1, nblk):  # seam j-1|j
                    lo = j * 128
                    xsl[oi, 2 * (j - 1)] = W[lo - p : lo, lo : lo + 128]
                for j in range(nblk - 1):  # seam j|j+1
                    hi = (j + 1) * 128
                    xsl[oi, 2 * j + 1] = W[hi : hi + p,
                                           j * 128 : j * 128 + 128]
            mats = [jnp.asarray(xd, dt), jnp.asarray(xsl, dt)] + band_mats
        else:
            xkm = np.zeros((2 * X, X))
            xkm[:npts, :npts] = Ks[0].T
            xkm[X : X + npts, :npts] = Ms[0].T
            mats = [jnp.asarray(xkm, dt)] + band_mats
        kern = functools.partial(
            kfn, b=b, L=L, LY=LY, X=X, p=p, H=H, npts=npts,
            corr=corr, prec=prec, nt=nt, mode=mode)
        full = pl.BlockSpec(memory_space=pltpu.VMEM)
        scratches = [pltpu.VMEM((2, L, LY, X), dt),
                     pltpu.SemaphoreType.DMA((2,)),
                     pltpu.VMEM((1, L, LY, X), dt),
                     pltpu.SemaphoreType.DMA(())]
        if kfn is _kernel_v19:
            scratches.append(pltpu.VMEM((2, b, b, 2 * X), dt))
        pc = pl.pallas_call(
            kern, grid=(nt * nt,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)] + [full] * len(mats),
            out_specs=pl.BlockSpec(memory_space=pl.ANY),
            out_shape=jax.ShapeDtypeStruct((sz, sy, X), dt),
            scratch_shapes=scratches)
        self.raw = jax.jit(lambda gp: pc(gp, *mats))
        self.pad = jax.jit(lambda u: jnp.pad(
            u.reshape((npts,) * 3),
            [(p, sz - npts - p), (H, sy - npts - H), (0, X - npts)]))
        self.unpad = jax.jit(
            lambda gp: gp[p : p + npts, H : H + npts, :npts].reshape(-1))
        self._call = jax.jit(lambda u: self.unpad(self.raw(self.pad(u))))

    def __call__(self, u):
        return self._call(u)


# V16: ALL axes banded — x via lane rolls with full-length position tables
# (exact at boundaries, wraparound killed by the tables' zeros).  No MXU
# work at all; the whole apply is VPU FMAs + DMA.
def _kernel_v16(u_hbm, wx_m, wx_k, wm_y, wk_y, wm_z, wk_z, out, scratch,
                sem, *, b, L, X, p, npts, corr, prec, nt):
    t = pl.program_id(0)
    slot = jax.lax.rem(t, 2)
    nxt = jax.lax.rem(t + 1, 2)

    def dma(sl, tt):
        return pltpu.make_async_copy(
            u_hbm.at[pl.ds((tt // nt) * b, L),
                     pl.ds(jax.lax.rem(tt, nt) * b, L), :],
            scratch.at[sl], sem.at[sl])

    @pl.when(t == 0)
    def _():
        dma(slot, t).start()

    @pl.when(t + 1 < nt * nt)
    def _():
        dma(nxt, t + 1).start()

    dma(slot, t).wait()
    u = scratch[slot]
    iz, iy = t // nt, jax.lax.rem(t, nt)
    nb = 2 * p + 1

    def band_z(tt_, w9):
        acc = None
        for o in range(nb):
            c = tt_[o : o + b] * w9[o]
            acc = c if acc is None else acc + c
        return acc

    def band_y(tt_, w9):
        acc = None
        for o in range(nb):
            c = tt_[:, o : o + b, :] * w9[o]
            acc = c if acc is None else acc + c
        return acc

    def band_x(tt_, w9):  # w9 ref (9, 8, X); lane shift via concat
        acc = None
        for o in range(nb):
            s_ = (p - o) % X
            t2 = jnp.concatenate([tt_[:, :, X - s_:], tt_[:, :, : X - s_]],
                                 axis=2) if s_ else tt_
            c = t2 * w9[o, 0:1]
            acc = c if acc is None else acc + c
        return acc

    (dm0, dk0, dm1, dk1, t_last, i_last) = corr
    ii = jax.lax.broadcasted_iota(jnp.int32, (b, 1), 0)
    oh0 = (ii == 0).astype(u.dtype)
    oh1 = (ii == i_last).astype(u.dtype)

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
    out[:] = band_x(q1, wx_k) + band_x(q2 + q3, wx_m)

def _periodic_band(M1, p, b):
    """(2p+1, b) periodic tap weights: W[o, i] = M1[g, g+o-p] for any
    interior row g with g % p == i % p (rows are periodic on a uniform
    assembled grid)."""
    npts = M1.shape[0]
    W = np.zeros((2 * p + 1, b))
    g0 = p * ((p + npts // 2) // p)  # a deep-interior row, class 0
    for i in range(b):
        g = g0 + (i % p)
        for o in range(2 * p + 1):
            j = g + o - p
            W[o, i] = M1[g, j]
    return W

def _tile_slices(M1, b, n_tiles, p):
    npts = M1.shape[0]
    size = n_tiles * b + 2 * p
    Mp = np.zeros((size, size))
    Mp[p : p + npts, p : p + npts] = M1
    out = np.empty((n_tiles * b, b + 2 * p))
    for t in range(n_tiles):
        out[t * b : (t + 1) * b] = Mp[
            t * b + p : (t + 1) * b + p, t * b : (t + 1) * b + 2 * p]
    return out


def _band_tables(M1, X, p):
    """(2p+1, X) band tables: W[o, i] = M1[i, i + o - p] (0 outside)."""
    npts = M1.shape[0]
    W = np.zeros((2 * p + 1, X))
    for o in range(2 * p + 1):
        for i in range(npts):
            j = i + o - p
            if 0 <= j < npts:
                W[o, i] = M1[i, j]
    return W


class LabKernel:
    def __init__(self, variant, npts, p, K1, M1, h, b=24, prec="highest",
                 dtype=jnp.float32):
        self.variant, self.b, self.p, self.npts = variant, b, p, npts
        prec = dict(highest=jax.lax.Precision.HIGHEST,
                    high=jax.lax.Precision.HIGH,
                    default=jax.lax.Precision.DEFAULT)[prec]
        n_tiles = -(-npts // b)
        self.n_tiles = n_tiles
        size = n_tiles * b + 2 * p
        L = b + 2 * p
        X = 128 * (-(-npts // 128))
        self.size, self.L, self.X = size, L, X
        dt = dtype
        Ks = [np.asarray(K1 / h[a]) for a in range(3)]
        Ms = [np.asarray(M1 * h[a]) for a in range(3)]
        tiled = {a: (jnp.asarray(_tile_slices(Ms[a], b, n_tiles, p), dt),
                     jnp.asarray(_tile_slices(Ks[a], b, n_tiles, p), dt))
                 for a in (1, 2)}

        def xpad(M):
            o = np.zeros((X, X))
            o[:npts, :npts] = M
            return jnp.asarray(o, dt)

        def tiled_spec(g):
            return pl.BlockSpec((b, L), lambda iz, iy, g=g: ((iz, iy)[g], 0),
                                memory_space=pltpu.VMEM)

        full = pl.BlockSpec(memory_space=pltpu.VMEM)
        out_spec = pl.BlockSpec((b, b, X), lambda iz, iy: (iz, iy, 0),
                                memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct((n_tiles * b, n_tiles * b, X), dt)

        if variant in ("v0", "v2", "v6", "v8", "vx", "vxy", "v9"):
            kfn = {"v0": _kernel_v2, "v2": _kernel_v2, "v6": _kernel_v6,
                   "v8": _kernel_v8, "vx": _kernel_vx, "vxy": _kernel_vxy,
                   "v9": _kernel_v9}[variant]
            kern = functools.partial(
                kfn, b=b, L=L, X=X, prec=prec)
            mats = [tiled[2][0], tiled[2][1], tiled[1][0], tiled[1][1],
                    xpad(Ms[0]), xpad(Ks[0])]
            specs = [tiled_spec(0), tiled_spec(0), tiled_spec(1),
                     tiled_spec(1), full, full]
            scratch = [pltpu.VMEM((L, L, X), dt), pltpu.SemaphoreType.DMA(())]
            self.x_lanes = X
            self.x_off = 0
        elif variant == "v3":
            # lane halo: data at offset p inside X + 128 lanes
            XH = X + 128
            kern = functools.partial(
                _kernel_v3, b=b, L=L, X=X, p=p, prec=prec)
            mb = _band_tables(Ms[0], X, p)
            kb = _band_tables(Ks[0], X, p)
            mats = [tiled[2][0], tiled[2][1], tiled[1][0], tiled[1][1],
                    jnp.asarray(mb[:, None, :], dt),
                    jnp.asarray(kb[:, None, :], dt)]
            specs = [tiled_spec(0), tiled_spec(0), tiled_spec(1),
                     tiled_spec(1), full, full]
            scratch = [pltpu.VMEM((L, L, XH), dt),
                       pltpu.SemaphoreType.DMA(())]
            self.x_lanes = XH
            self.x_off = p
        elif variant in ("v12", "v13", "v14", "v15", "v16", "vcopy",
                         "vband"):
            if b % p:
                raise ValueError("v12 needs b % p == 0")
            i_last = (npts - 1) % b
            t_last = (npts - 1) // b
            wm = {a: _periodic_band(Ms[a], p, b) for a in (1, 2)}
            wk = {a: _periodic_band(Ks[a], p, b) for a in (1, 2)}
            # center-tap deficits of the aperiodic rows 0 and npts-1
            def deficits(M1):
                per = _periodic_band(M1, p, 1)[p, 0]  # class-0 center
                return (M1[0, 0] - per, M1[npts - 1, npts - 1] - per)
            corr = (
                {a: deficits(Ms[a])[0] for a in (1, 2)},
                {a: deficits(Ks[a])[0] for a in (1, 2)},
                {a: deficits(Ms[a])[1] for a in (1, 2)},
                {a: deficits(Ks[a])[1] for a in (1, 2)},
                t_last, i_last,
            )
            kfn = {"v12": _kernel_v12, "v13": _kernel_v13,
                   "v14": _kernel_v14, "v15": _kernel_v15,
                   "vcopy": _kernel_vcopy, "vband": _kernel_vband,
                   "v16": _kernel_v16}[variant]
            kw = dict(b=b, L=L, X=X, p=p, npts=npts, corr=corr, prec=prec)
            if variant in ("v14", "v15", "v16", "vcopy", "vband"):
                kw["nt"] = n_tiles
            kern = functools.partial(kfn, **kw)
            wmats = [jnp.asarray(wm[1][:, :, None], dt),
                     jnp.asarray(wk[1][:, :, None], dt),
                     jnp.asarray(wm[2][:, :, None, None], dt),
                     jnp.asarray(wk[2][:, :, None, None], dt)]
            if variant == "v16":
                wxm = _band_table_full(Ms[0], p)
                wxk = _band_table_full(Ks[0], p)
                def xfull(W):
                    o = np.zeros((2 * p + 1, 8, X))
                    o[:, :, :W.shape[1]] = W[:, None, :]
                    return jnp.asarray(o, dt)
                mats = [xfull(wxm), xfull(wxk)] + wmats
                specs = [full] * 6
            elif variant in ("v15", "vcopy", "vband"):
                # stacked [Kx^T ; Mx^T]: (2X, X)
                xkm = np.zeros((2 * X, X))
                xkm[:npts, :npts] = Ks[0].T
                xkm[X : X + npts, :npts] = Ms[0].T
                mats = [jnp.asarray(xkm, dt)] + wmats
                specs = [full] * 5
            else:
                mats = [xpad(Ms[0]), xpad(Ks[0])] + wmats
                specs = [full] * 6
            if variant in ("v14", "v15", "v16", "vcopy", "vband"):
                scratch = [pltpu.VMEM((2, L, L, X), dt),
                           pltpu.SemaphoreType.DMA((2,))]
            else:
                scratch = [pltpu.VMEM((L, L, X), dt),
                           pltpu.SemaphoreType.DMA(())]
            self.x_lanes = X
            self.x_off = 0
        else:
            raise ValueError(variant)

        if variant in ("v14", "v15", "v16", "vcopy", "vband"):
            grid = (n_tiles * n_tiles,)
            out_spec = pl.BlockSpec(
                (b, b, X), lambda t, n=n_tiles: (t // n, t % n, 0),
                memory_space=pltpu.VMEM)
        else:
            grid = (n_tiles, n_tiles)
        pc = pl.pallas_call(
            kern, grid=grid,
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)] + specs,
            out_specs=out_spec, out_shape=out_shape,
            scratch_shapes=scratch,
        )
        npts_ = npts
        size_ = size
        xl, xo = self.x_lanes, self.x_off

        def apply(u):
            g = u.reshape((npts_,) * 3)
            gp = jnp.pad(g, [(p, size_ - npts_ - p)] * 2
                         + [(xo, xl - npts_ - xo)])
            y = pc(gp, *mats)
            return y[:npts_, :npts_, :npts_].reshape(-1)

        self._call = jax.jit(apply)

    def __call__(self, u):
        return self._call(u)



# ----------------------------------------------------------------------
# V4: pure-XLA banded apply.  Every 1D operator is banded (2p+1); apply
# along each axis as shifted elementwise FMAs: out = sum_o W[o] * roll(u,
# p-o, axis).  The band table's zeros at the boundaries exactly cancel the
# cyclic wraparound, so roll-based shifts are exact.  No Pallas, no MXU:
# XLA fuses the taps into HBM-bound loop fusions with exact f32 FMAs.
def _band_table_full(M1, p):
    npts = M1.shape[0]
    W = np.zeros((2 * p + 1, npts))
    for o in range(2 * p + 1):
        for i in range(npts):
            j = i + o - p
            if 0 <= j < npts:
                W[o, i] = M1[i, j]
    return W


def banded_apply_axis(t, W, axis, p, dim):
    """t: grid array; W: (2p+1, npts) jnp band table; spatial axis a
    (0 = x = last grid dim)."""
    pos = dim - 1 - axis
    npts = t.shape[pos]
    sh = [1] * dim
    sh[pos] = npts
    out = None
    for o in range(2 * p + 1):
        w = W[o].reshape(sh)
        tap = w * jnp.roll(t, p - o, axis=pos)
        out = tap if out is None else out + tap
    return out


def make_banded_apply(npts, p, K1, M1, h, dtype=jnp.float32):
    Wm = [jnp.asarray(_band_table_full(M1 * h[a], p), dtype) for a in range(3)]
    Wk = [jnp.asarray(_band_table_full(K1 / h[a], p), dtype) for a in range(3)]

    def apply(u):
        t = u.reshape((npts,) * 3)
        ax = banded_apply_axis(t, Wm[0], 0, p, 3)
        gx = banded_apply_axis(t, Wk[0], 0, p, 3)
        by = banded_apply_axis(ax, Wm[1], 1, p, 3)
        cy = banded_apply_axis(ax, Wk[1], 1, p, 3)
        dy = banded_apply_axis(gx, Wm[1], 1, p, 3)
        y = (banded_apply_axis(by, Wk[2], 2, p, 3)
             + banded_apply_axis(cy + dy, Wm[2], 2, p, 3))
        return y.reshape(-1)

    return jax.jit(apply)

def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--refine", type=int, default=6)
    ap.add_argument("--p", type=int, default=4)
    ap.add_argument("--reps", type=int, default=50)
    ap.add_argument("--variants", nargs="+",
                    default=["v0", "v2-highest", "v2-high", "v3-highest",
                             "v3-high"])
    ap.add_argument("--tiles", type=int, nargs="+", default=[24])
    args = ap.parse_args()

    p = args.p
    n = 1 << args.refine
    npts = n * p + 1
    ndofs = npts**3
    K1, M1 = global_1d_matrices(p, n, p + 1)
    h = np.array([1.0 / n] * 3)

    # reference on device (XLA separable, f64-accurate enough for rel err)
    Ks = [jnp.asarray(K1 / h[a], jnp.float32) for a in range(3)]
    Ms = [jnp.asarray(M1 * h[a], jnp.float32) for a in range(3)]
    rng = np.random.default_rng(3)
    x_np = rng.standard_normal(ndofs).astype(np.float32)
    x = jnp.asarray(x_np)
    ref = jax.jit(lambda u: laplace_apply_separable(u, 3, npts, Ks, Ms))
    y_ref = np.asarray(ref(x))
    nrm = np.linalg.norm(y_ref)

    # baseline V0 = the shipped kernel
    from tpufem.ops.pallas_separable import PallasSeparable

    results = {}
    for b in args.tiles:
        for v in args.variants:
            name = f"{v}-b{b}"
            try:
                if v == "v0":
                    k = PallasSeparable(3, npts, p, [K1 / h[a] for a in
                                                     range(3)],
                                        [M1 * h[a] for a in range(3)],
                                        "float32", tile=b)
                elif v == "v4":
                    k = make_banded_apply(npts, p, K1, M1, h)
                elif v == "v5":
                    # v0 kernel without the per-apply pad/unpad: times the
                    # raw pallas_call on an already-padded vector
                    ps = PallasSeparable(3, npts, p,
                                         [K1 / h[a] for a in range(3)],
                                         [M1 * h[a] for a in range(3)],
                                         "float32", tile=b)
                    import jax as _jax
                    pad_once = _jax.jit(lambda u: jnp.pad(
                        u.reshape((npts,) * 3),
                        [(p, ps.size - npts - p)] * 2 + [(0, ps.X - npts)]))
                    class _Padded:
                        def __call__(self, up):
                            return ps._raw_call(up)
                    k = _Padded()
                    x_pad = pad_once(x)
                elif v[:3] in ("v17", "v18", "v19", "v20"):
                    md = ("bf16" if v.endswith("bf")
                          else "copy" if "copy" in v
                          else "bands" if "bands" in v
                          else "mm" if "mm" in v else "f32")
                    pr = "high" if v.endswith("h") and md == "f32" \
                        else "highest"
                    k = V17Kernel(npts, p, K1, M1, h, b=b, mode=md, prec=pr,
                                  kern_name=v[:3])
                else:
                    var, prec = (v.split("-") + ["highest"])[:2]
                    k = LabKernel(var, npts, p, K1, M1, h, b=b, prec=prec)
                xin = x_pad if v == "v5" else x
                y = k(xin)
                y.block_until_ready()
                if (v == "v5" or v.startswith("vx") or v.startswith("vcopy")
                        or v.startswith("vband") or "copy" in v
                        or "bands" in v or "mm" in v):
                    err = float("nan")  # timing-only variant
                else:
                    err = np.linalg.norm(np.asarray(y) - y_ref) / nrm
                t0 = time.perf_counter()
                for _ in range(args.reps):
                    y = k(xin)
                y.block_until_ready()
                dt = (time.perf_counter() - t0) / args.reps
                gd = ndofs / dt / 1e9
                results[name] = (dt, gd, err)
                print(f"{name:18s}  {dt*1e3:8.3f} ms  {gd:7.2f} GDoF/s  "
                      f"rel_err {err:.2e}", flush=True)
                if hasattr(k, "raw") and "copy" not in v:
                    # solver-resident rate: halo'd layout in -> halo'd out
                    gp = k.pad(x)
                    yr = k.raw(gp)
                    yr.block_until_ready()
                    # chainability check: output layout must be directly
                    # consumable as input (halo/overhang zeros intact)
                    if "bands" in v or "mm" in v:
                        cerr = float("nan")  # timing-only ablation
                    else:
                        y2 = np.asarray(k.unpad(k.raw(k.raw(gp) * 1e-9)))
                        y2_ref = np.asarray(ref((ref(x) * 1e-9).astype(
                            jnp.float32)))
                        cerr = (np.linalg.norm(y2 - y2_ref)
                                / max(np.linalg.norm(y2_ref), 1e-30))
                    t0 = time.perf_counter()
                    for _ in range(args.reps):
                        yr = k.raw(gp)
                    yr.block_until_ready()
                    dtr = (time.perf_counter() - t0) / args.reps
                    print(f"{name:18s}  {dtr*1e3:8.3f} ms  "
                          f"{ndofs/dtr/1e9:7.2f} GDoF/s  [raw resident; "
                          f"chain rel_err {cerr:.2e}]", flush=True)
                    results[name + "-raw"] = (dtr, ndofs / dtr / 1e9, err)
            except Exception as e:
                print(f"{name:18s}  FAILED: {type(e).__name__}: {e}"[:200],
                      flush=True)
    best = max(results, key=lambda k_: results[k_][1])
    print(f"\nbest: {best} @ {results[best][1]:.2f} GDoF/s")


if __name__ == "__main__":
    main()
