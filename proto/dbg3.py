import numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_platforms", "cpu")
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

def rk(s_ref, x_ref, o_ref):
    o_ref[:] = pltpu.roll(x_ref[:], s_ref[0], axis=1)

xs = jnp.arange(2 * 128, dtype=jnp.int32).reshape(2, 128)
fr = pl.pallas_call(rk,
    out_shape=jax.ShapeDtypeStruct((2, 128), jnp.int32),
    in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM), pl.BlockSpec(memory_space=pltpu.VMEM)],
    out_specs=pl.BlockSpec(memory_space=pltpu.VMEM), interpret=True)
r = jax.jit(fr)(jnp.array([5], jnp.int32), xs)
print("interp roll == np.roll(+5):", np.array_equal(np.asarray(r), np.roll(np.asarray(xs), 5, axis=1)))
print("interp roll == np.roll(-5):", np.array_equal(np.asarray(r), np.roll(np.asarray(xs), -5, axis=1)))
print(np.asarray(r)[0, :8], np.asarray(xs)[0, :8])
