"""On-chip attribution for the adaptive whole-solve BENCH section.

The round-4 rehearsal spent 255 s of a 720 s budget on the two adaptive
GMG lines (f32: 133 s, bf16 cycle: 122 s), budget-skipping the flat
resident-solve lines that BENCH_r03 carried.  This lab splits each line
into its real costs so the attack lands on the dominant one:

  build        build_adaptive_op host setup (mesh/dofs/constraints/op)
  mg-f32       BoxMultigrid(f32) construction (level ops + cheb power
               iterations + coarse dense inverse + transfer rules)
  jacobi       op.cg_solve compile+warm, then timed
  gmg          mg.cg_solve compile+warm, then timed
  mg-bf16      bf16 hierarchy derivation (measured: a fresh
               BoxMultigrid(bfloat16) build costs 383 s at refine 4 —
               per-level bf16 power-iteration compiles + full host
               rebuild; mg.recast shares all of it)
  gmg16        mixed cycle compile+warm, then timed

Usage:  timeout 900 python scripts/adaptive_solve_lab.py [refine] [steps]
        (bench uses refine=4 steps=2 on chip)
"""
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from tpufem.utils.cache import enable_persistent_cache

enable_persistent_cache()

from tpufem.apps import bmop
from tpufem.solvers.box_multigrid import BoxMultigrid

refine = int(sys.argv[1]) if len(sys.argv) > 1 else 4
steps = int(sys.argv[2]) if len(sys.argv) > 2 else 2
rtol = 1e-5
print(f"device={jax.devices()[0]} refine={refine} steps={steps}",
      flush=True)

# pay the platform's first-D2H penalty (25-376 s drawn) up front so it
# doesn't land inside whichever stage fetches first
_t = time.perf_counter()
np.asarray(jnp.zeros(8))
print(f"  d2h_warmup                   {time.perf_counter() - _t:8.1f} s",
      flush=True)

T = {}


def tic(name):
    T[name] = time.perf_counter()


def toc(name):
    dt = time.perf_counter() - T[name]
    print(f"  {name:<28s} {dt:8.1f} s", flush=True)
    return dt


tic("build_adaptive_op")
mesh, dofs, ac, op = bmop.build_adaptive_op(3, 4, refine, steps,
                                            "float32")
toc("build_adaptive_op")

tic("diagonal")
diag = op.diagonal()
jax.block_until_ready(diag)
toc("diagonal")

tic("mg_f32_build")
mg = BoxMultigrid(mesh, dofs, constraints=ac, dtype="float32",
                  fine_op=op, fine_diag=diag)
toc("mg_f32_build")

rng = np.random.default_rng(7)
mask = np.asarray(op.interior_mask, np.float64) * mg.fine.nh_mask
b = jnp.asarray(mask * np.asarray(op.to_patch(
    rng.standard_normal(dofs.n_dofs))), op.dt)

tic("jacobi_compile_warm")
it = int(op.cg_solve(b, diag, rtol=rtol).iterations)
toc("jacobi_compile_warm")
tic("jacobi_timed")
res = op.cg_solve(b, diag, rtol=rtol)
int(res.iterations)
toc("jacobi_timed")
print(f"    jacobi iters={it}", flush=True)

tic("gmg_compile_warm")
it = int(mg.cg_solve(b, rtol=rtol).iterations)
toc("gmg_compile_warm")
tic("gmg_timed")
res = mg.cg_solve(b, rtol=rtol)
int(res.iterations)
toc("gmg_timed")
print(f"    gmg iters={it}", flush=True)

tic("mg_bf16_recast")
mg16 = mg.recast("bfloat16", solve_op=op)
toc("mg_bf16_recast")

tic("gmg16_compile_warm")
it = int(mg16.cg_solve(b, rtol=rtol).iterations)
toc("gmg16_compile_warm")
tic("gmg16_timed")
res = mg16.cg_solve(b, rtol=rtol)
int(res.iterations)
toc("gmg16_timed")
print(f"    gmg16 iters={it}", flush=True)
