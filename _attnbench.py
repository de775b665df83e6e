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
mode = sys.argv[1]
os.environ["DINO_POSE_TPU_ATTENTION"] = mode

from dino_pose_tpu.models.vit import Dinov2Backbone, VIT_PRESETS
bb = Dinov2Backbone(VIT_PRESETS["facebook/dinov2-small"])
xn = jnp.asarray(rng.standard_normal((B,224,224,3)), jnp.bfloat16)
bvars = jax.jit(bb.init)(jax.random.key(0), xn[:1])
print(f"backbone fwd [{mode}]:", chain_time(lambda v,x: bb.apply(v,x)[0], bvars, xn), "ms", flush=True)

# bare attention op
from dino_pose_tpu.ops import attention as A
q = jnp.asarray(rng.standard_normal((B,6,257,64)), jnp.bfloat16)
fn = (A.flash_attention if mode=="pallas" else A.xla_attention)
print(f"attention op [{mode}]:", chain_time(lambda _,x: fn(x,x,x,0.125), None, q), "ms", flush=True)

# raw matmul ceiling: equivalent of one ViT-S layer's dense FLOPs x12
w1 = jnp.asarray(rng.standard_normal((384,1536)), jnp.bfloat16)
w2 = jnp.asarray(rng.standard_normal((1536,384)), jnp.bfloat16)
xm = jnp.asarray(rng.standard_normal((B*257,384)), jnp.bfloat16)
def mlp12(_, x):
    for _ in range(12):
        x = jnp.dot(jnp.dot(x, w1, preferred_element_type=jnp.float32).astype(jnp.bfloat16), w2,
                    preferred_element_type=jnp.float32).astype(jnp.bfloat16)
    return x
print("raw 12x MLP matmuls:", chain_time(mlp12, None, xm), "ms", flush=True)
