import os, sys, time, functools
import jax, jax.numpy as jnp, numpy as np

def chain_time(apply_fn, v, x, n=10):
    def once(x):
        out = apply_fn(v, x)
        s = jnp.sum(jax.tree.leaves(out)[0].astype(jnp.float32)) * jnp.float32(1e-30)
        return x + s.astype(x.dtype)
    once_j = jax.jit(once)
    x = once_j(x); x = once_j(x); jax.block_until_ready(x)
    t0 = time.perf_counter()
    for _ in range(n):
        x = once_j(x)
    jax.block_until_ready(x)
    return (time.perf_counter() - t0) / n * 1e3

B = 128
rng = np.random.default_rng(0)

# 1. raw MLP matmul ceiling (12 layers' worth of fc1+fc2)
w1 = jnp.asarray(rng.standard_normal((384,1536)), jnp.bfloat16)
w2 = jnp.asarray(rng.standard_normal((1536,384)), jnp.bfloat16)
xm = jnp.asarray(rng.standard_normal((B*257,384)), jnp.bfloat16)
def mlp12(_, x):
    for _ in range(12):
        x = jnp.dot(jnp.dot(x, w1, preferred_element_type=jnp.float32).astype(jnp.bfloat16), w2,
                    preferred_element_type=jnp.float32).astype(jnp.bfloat16)
    return x
print("raw 12x (fc1+fc2):", chain_time(mlp12, None, xm), "ms", flush=True)

# 2. xla attention op alone (12 layers' worth)
from dino_pose_tpu.ops.attention import xla_attention
q = jnp.asarray(rng.standard_normal((B,6,257,64)), jnp.bfloat16)
def attn12(_, q):
    for _ in range(12):
        q = xla_attention(q, q, q, 0.125)
    return q
print("xla attention x12:", chain_time(attn12, None, q), "ms", flush=True)

# 3. one full Block x12 (attention + mlp + norms + layerscale)
from dino_pose_tpu.models.vit import Block, VIT_PRESETS
blk = Block(VIT_PRESETS["facebook/dinov2-small"])
xt = jnp.asarray(rng.standard_normal((B,257,384)), jnp.bfloat16)
bv = jax.jit(functools.partial(blk.init, deterministic=True))(jax.random.key(0), xt)
def block12(v, x):
    for _ in range(12):
        x = blk.apply(v, x, deterministic=True)
    return x
print("Block x12:", chain_time(block12, bv, xt), "ms", flush=True)

# 4. layernorm x24
ln_scale = jnp.ones((384,), jnp.float32); ln_bias = jnp.zeros((384,), jnp.float32)
def ln24(_, x):
    for _ in range(24):
        xf = x.astype(jnp.float32)
        mu = xf.mean(-1, keepdims=True)
        var = ((xf-mu)**2).mean(-1, keepdims=True)
        x = ((xf-mu)*jax.lax.rsqrt(var+1e-6)*ln_scale+ln_bias).astype(jnp.bfloat16)
    return x
print("layernorm x24:", chain_time(ln24, None, xt), "ms", flush=True)

# 5. patch embed conv
from dino_pose_tpu.nn import layers as L
pe = L.Conv(384, (14,14), strides=(14,14))
xi = jnp.asarray(rng.standard_normal((B,224,224,3)), jnp.bfloat16)
pv = pe.init(jax.random.key(0), xi)
print("patch embed:", chain_time(lambda v,x: pe.apply(v,x), pv, xi), "ms", flush=True)
