import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)
import jax

jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
from functools import partial

import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

mesh = Mesh(np.array(jax.devices()[:4]), ("s",))
x = jnp.arange(4.0).reshape(4, 1)


@jax.jit
@partial(jax.shard_map, mesh=mesh, in_specs=P("s"), out_specs=P("s"))
def f(blk):
    i = jax.lax.axis_index("s")
    v = jnp.sum(blk)
    ps = jax.lax.psum(v, "s")
    return jnp.stack([i.astype(jnp.float64), v, ps])[None]


print("i, v, psum rows:")
print(np.asarray(f(x)), flush=True)


@jax.jit
@partial(jax.shard_map, mesh=mesh, in_specs=P("s"), out_specs=P("s"))
def g(blk):
    i = jax.lax.axis_index("s")
    w = jnp.where(i == 3, 0.0, jnp.sum(blk))
    return jnp.stack([w, jax.lax.psum(w, "s")])[None]


print("where-masked psum:")
print(np.asarray(g(x)), flush=True)

ag = jax.jit(
    partial(jax.shard_map, mesh=mesh, in_specs=P("s"), out_specs=P("s"))(
        lambda blk: jax.lax.all_gather(blk[0], "s")[
            jnp.clip(jax.lax.axis_index("s") + 1, 0, 3)
        ][None]
    )
)
print("all_gather neighbor:")
print(np.asarray(ag(x)), flush=True)
