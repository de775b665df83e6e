import time, jax, jax.numpy as jnp, numpy as np
from dino_pose_tpu.models import registry
from dino_pose_tpu.train.state import create_train_state
from dino_pose_tpu.train.step import jit_train_step

config = {"model_name": "facebook/dinov2-small", "num_keypoints": 24,
          "output_heatmap_size": 48, "use_lora": True, "lora_rank": 8,
          "lora_alpha": 16, "lora_dropout": 0.1}
model = registry.create_model_from_config(config, pretrained=False)

def timeit(fn, *args, n=20):
    for _ in range(3): out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n): out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n * 1e3

B = 128
rng = np.random.default_rng(0)
x = jnp.asarray(rng.standard_normal((B,3,224,224)), jnp.bfloat16)

# forward only
fwd = jax.jit(lambda v, x: model.module.apply(v, x, train=False))
print("fwd full:", timeit(fwd, model.variables, x), "ms")

# backbone only
from dino_pose_tpu.models.vit import Dinov2Backbone
bb = Dinov2Backbone(model.module.vit)
bvars = {"params": model.variables["params"]["backbone"]}
xn = jnp.transpose(x, (0,2,3,1))
fbb = jax.jit(lambda v, x: bb.apply(v, x)[0])
print("fwd backbone:", timeit(fbb, bvars, xn), "ms")

# heads only
from dino_pose_tpu.models.heads import SpatialAwarePoseHeads
heads = SpatialAwarePoseHeads(spatial_input_size=16)
fm = jnp.asarray(rng.standard_normal((B,16,16,384)), jnp.bfloat16)
hv = heads.init(jax.random.key(0), fm, train=False)
fh = jax.jit(lambda v, f: heads.apply(v, f, train=False))
print("fwd heads:", timeit(fh, hv, fm), "ms")

# full train step
state, tx, part = create_train_state(model.variables, config, model.family)
step = jit_train_step(model.module, tx, part)
batch = {"image": x,
         "2d_heatmaps": jnp.asarray(rng.random((B,24,48,48)), jnp.float32),
         "2d_keypoints": jnp.asarray(rng.uniform(20,200,(B,24,3)), jnp.float32),
         "z_coords": jnp.asarray(rng.standard_normal((B,24)), jnp.float32)}
lr = jnp.float32(3e-5); key = jax.random.key(0)
def run(state):
    s, _ = step(state, batch, lr, key)
    return s
for _ in range(3): state = run(state)
jax.block_until_ready(state)
t0 = time.perf_counter()
for _ in range(10): state = run(state)
jax.block_until_ready(state)
print("train step:", (time.perf_counter()-t0)/10*1e3, "ms")
