import numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_platforms", "cpu")
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from inplacemsdradixsort_tpu.ops.pallas_kernels import _chunk_from

CHR = 8
def k(s_ref, x_ref, o_ref):
    s = s_ref[0]
    base = jax.lax.shift_right_logical(s, 7)
    phase = s & 127
    o_ref[:] = _chunk_from(x_ref, base, phase, CHR)

buf = jnp.arange(24 * 128, dtype=jnp.int32).reshape(24, 128)
for s in (0, 123, 500, 1000):
    f = pl.pallas_call(k,
        out_shape=jax.ShapeDtypeStruct((CHR, 128), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM), pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM), interpret=True)
    r = np.asarray(jax.jit(f)(jnp.array([s], jnp.int32), buf)).ravel()
    exp = np.arange(s, s + CHR * 128)
    print(f"s={s}: ok={np.array_equal(r, exp)} got[:4]={r[:4]} exp[:4]={exp[:4]}")
