import time
import jax, jax.numpy as jnp, numpy as np
from dino_pose_tpu.ops.attention import flash_attention, xla_attention

def chain_time(fn, q, n=20):
    def once(q):
        out = fn(q, q, q, 0.125)
        return q + (jnp.sum(out.astype(jnp.float32)) * jnp.float32(1e-30)).astype(q.dtype)
    once_j = jax.jit(once)
    q = once_j(q); q = once_j(q); jax.block_until_ready(q)
    t0 = time.perf_counter()
    for _ in range(n): q = once_j(q)
    jax.block_until_ready(q)
    return (time.perf_counter() - t0) / n * 1e3

rng = np.random.default_rng(0)
q = jnp.asarray(rng.standard_normal((128,6,257,64)), jnp.bfloat16)
print("xla   attention 1x:", chain_time(xla_attention, q), "ms", flush=True)
print("flash attention 1x:", chain_time(flash_attention, q), "ms", flush=True)

# correctness on real TPU too
out_f = flash_attention(q, q, q, 0.125)
out_x = xla_attention(q, q, q, 0.125)
d = jnp.max(jnp.abs(out_f.astype(jnp.float32) - out_x.astype(jnp.float32)))
print("max diff:", float(d), flush=True)
