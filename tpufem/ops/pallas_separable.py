"""Fused Pallas kernel for the separable uniform-grid Laplace apply.

This is the Pallas realization of the reference's single fused cell-loop
kernel (SURVEY.md §3.4 "This whole box becomes ONE fused Pallas kernel"):
where the XLA separable tier (tpufem.ops.separable) runs 8 contraction
passes over HBM, this kernel makes ONE pass — each output tile loads its
halo'd input slab into VMEM via async DMA and performs all contractions
in VMEM with MXU matmuls.

Mosaic-compatibility constraints (found empirically on this toolchain —
violating either crashes the remote compile helper, not just errors):
- the minor (lane) dim of every DMA'd/blocked array must be a multiple of
  128 → the x axis is zero-padded to X_pad = 128*ceil(npts/128) and the x
  operator matrices are zero-padded to (X_pad, X_pad);
- no leading-1 3D blocks with ``.at[0]`` views → the per-tile z/y operator
  row-slices are passed as 2D stacks (n_tiles*b, b+2p) with (b, b+2p)
  blocks.

The assembled 1D operators K1/M1 are banded (bandwidth 2p+1), so an output
tile of planes [z0:z1) depends only on input [z0-p:z1+p): per-tile row
slices of the zero-padded operators make boundary tiles exact, no masking.

Per-tile schedule (3D, 7 matmuls, shared partials):
    ax  = Mx u        gx  = Kx u
    y   = Kz (My ax) + Mz (Ky ax + My gx)
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _tile_slices(M1: np.ndarray, b: int, n_tiles: int, p: int) -> np.ndarray:
    """(n_tiles*b, b+2p) stacked row-slices of the zero-padded operator.

    Padded coordinate system: index i_pad = i + p; tile t covers padded
    rows [t*b + p, (t+1)*b + p) and needs padded cols [t*b, (t+1)*b + 2p).
    """
    npts = M1.shape[0]
    size = n_tiles * b + 2 * p
    Mp = np.zeros((size, size))
    Mp[p : p + npts, p : p + npts] = M1
    out = np.empty((n_tiles * b, b + 2 * p))
    for t in range(n_tiles):
        out[t * b : (t + 1) * b] = Mp[
            t * b + p : (t + 1) * b + p, t * b : (t + 1) * b + 2 * p
        ]
    return out


def _hp_einsum(expr, a, m):
    return jnp.einsum(expr, a, m, preferred_element_type=a.dtype,
                      precision=jax.lax.Precision.HIGHEST)


def _kernel_3d(u_hbm, mz, kz, my, ky, mx, kx, out, scratch, sem, *, b, L):
    iz = pl.program_id(0)
    iy = pl.program_id(1)
    dma = pltpu.make_async_copy(
        u_hbm.at[pl.ds(iz * b, L), pl.ds(iy * b, L), :], scratch, sem
    )
    dma.start()
    dma.wait()
    u = scratch[:]  # (L, L, X_pad)
    ax = _hp_einsum("zyx,ox->zyo", u, mx[:])
    gx = _hp_einsum("zyx,ox->zyo", u, kx[:])
    m_ax = _hp_einsum("zyx,by->zbx", ax, my[:])
    k_ax = _hp_einsum("zyx,by->zbx", ax, ky[:])
    m_gx = _hp_einsum("zyx,by->zbx", gx, my[:])
    y = _hp_einsum("zyx,bz->byx", m_ax, kz[:]) + _hp_einsum(
        "zyx,bz->byx", k_ax + m_gx, mz[:]
    )
    out[:] = y


def _kernel_2d(u_hbm, my, ky, mx, kx, out, scratch, sem, *, b, L):
    iy = pl.program_id(0)
    dma = pltpu.make_async_copy(u_hbm.at[pl.ds(iy * b, L), :], scratch, sem)
    dma.start()
    dma.wait()
    u = scratch[:]  # (L, X_pad)
    ax = _hp_einsum("yx,ox->yo", u, mx[:])
    gx = _hp_einsum("yx,ox->yo", u, kx[:])
    out[:] = _hp_einsum("yx,by->bx", ax, ky[:]) + _hp_einsum(
        "yx,by->bx", gx, my[:]
    )


class PallasSeparable:
    """Compiled fused apply for one (dim, npts, p, dtype, tile) shape."""

    def __init__(self, dim, npts, p, Ks_np, Ms_np, dtype, tile=None,
                 interpret=False):
        self.dim, self.npts, self.p = dim, npts, p
        if tile is None:
            tile = 24 if dim == 3 else 256
        while tile > npts:
            tile //= 2
        tile = max(tile, 8)
        self.b = tile
        self.n_tiles = -(-npts // tile)
        self.size = self.n_tiles * tile + 2 * p  # padded z/y extent
        self.L = tile + 2 * p
        # lane (x) padding: Mosaic needs 128-multiples on compiled TPU
        self.X = npts if interpret else 128 * (-(-npts // 128))
        dt = jnp.dtype(dtype)
        self.dt = dt
        # stacked 2D tiled slices for the z/y axes
        self.tiled = {}
        for a in range(1, dim):
            self.tiled[a] = (
                jnp.asarray(_tile_slices(Ms_np[a], tile, self.n_tiles, p), dt),
                jnp.asarray(_tile_slices(Ks_np[a], tile, self.n_tiles, p), dt),
            )
        # x matrices zero-padded to (X, X)
        def xpad(M):
            out = np.zeros((self.X, self.X))
            out[:npts, :npts] = M
            return jnp.asarray(out, dt)

        self.x_full = (xpad(Ms_np[0]), xpad(Ks_np[0]))
        self.interpret = interpret
        self._call = jax.jit(self._build())

    def _build(self):
        dim, b, L, p = self.dim, self.b, self.L, self.p
        nt, npts, size, X = self.n_tiles, self.npts, self.size, self.X

        def tiled_spec(grid_pos):
            def imap(*ids):
                return (ids[grid_pos], 0)

            return pl.BlockSpec((b, L), imap, memory_space=pltpu.VMEM)

        full_spec = pl.BlockSpec(memory_space=pltpu.VMEM)

        if dim == 3:
            kern = functools.partial(_kernel_3d, b=b, L=L)
            grid = (nt, nt)
            mat_specs = [tiled_spec(0), tiled_spec(0),
                         tiled_spec(1), tiled_spec(1),
                         full_spec, full_spec]
            mats_in = [self.tiled[2][0], self.tiled[2][1],
                       self.tiled[1][0], self.tiled[1][1],
                       self.x_full[0], self.x_full[1]]
            out_spec = pl.BlockSpec(
                (b, b, X), lambda iz, iy: (iz, iy, 0),
                memory_space=pltpu.VMEM,
            )
            out_shape = jax.ShapeDtypeStruct((nt * b, nt * b, X), self.dt)
            scratch = [pltpu.VMEM((L, L, X), self.dt),
                       pltpu.SemaphoreType.DMA(())]
        else:
            kern = functools.partial(_kernel_2d, b=b, L=L)
            grid = (nt,)
            mat_specs = [tiled_spec(0), tiled_spec(0), full_spec, full_spec]
            mats_in = [self.tiled[1][0], self.tiled[1][1],
                       self.x_full[0], self.x_full[1]]
            out_spec = pl.BlockSpec(
                (b, X), lambda iy: (iy, 0), memory_space=pltpu.VMEM
            )
            out_shape = jax.ShapeDtypeStruct((nt * b, X), self.dt)
            scratch = [pltpu.VMEM((L, X), self.dt),
                       pltpu.SemaphoreType.DMA(())]

        pc = pl.pallas_call(
            kern,
            grid=grid,
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)] + mat_specs,
            out_specs=out_spec,
            out_shape=out_shape,
            scratch_shapes=scratch,
            interpret=self.interpret,
        )

        def apply(u):
            g = u.reshape((npts,) * dim)
            pad = [(p, size - npts - p)] * (dim - 1) + [(0, X - npts)]
            gp = jnp.pad(g, pad)
            y = pc(gp, *mats_in)
            sl = tuple(slice(0, npts) for _ in range(dim))
            return y[sl].reshape(-1)

        return apply

    def __call__(self, u):
        return self._call(u)
