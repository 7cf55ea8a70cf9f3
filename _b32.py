import jax, jax.numpy as jnp
from blur_algorithms_tpu.ops.plan import make_plan
from blur_algorithms_tpu.pallas_kernels.fused_dma import _blur_fused_dma_impl
from blur_algorithms_tpu.utils.timing import time_fn_chained
h, w = 2160, 3840
x = jax.jit(lambda k: jax.random.randint(k, (32*3, h, w), 0, 256, dtype=jnp.int32).astype(jnp.uint8))(jax.random.PRNGKey(0))
for sigma in (10.0, 120.0):
    plan = make_plan((h, w), sigma)
    r = time_fn_chained(lambda: (lambda v: _blur_fused_dma_impl(v, plan, 'int8', True)), x, iters=8, reps=3, name=f's{sigma}')
    mp = 32 * h * w / 1e6
    print(f"batch-32 sigma {sigma} (r={plan.col.support_radius}): min {r.min_ms:.1f} ms = {mp/r.min_ms*1e3/1e3:.1f} GP/s")
