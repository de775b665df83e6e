import jax, jax.numpy as jnp, numpy as np, glob, os
from dino_pose_tpu.models import registry
from dino_pose_tpu.train.state import create_train_state
from dino_pose_tpu.train.step import jit_train_step
from bench import synthetic_batch

config = {"model_name": "facebook/dinov2-small", "num_keypoints": 24,
          "output_heatmap_size": 48, "use_lora": True, "lora_rank": 8,
          "lora_alpha": 16, "lora_dropout": 0.1}
model = registry.create_model_from_config(config, pretrained=False)
state, tx, part = create_train_state(model.variables, config, model.family)
step = jit_train_step(model.module, tx, part)
batch = jax.device_put(synthetic_batch(128, jnp.bfloat16))
lr = jnp.float32(3e-5); key = jax.random.key(0)
for _ in range(3):
    state, _ = step(state, batch, lr, key)
jax.block_until_ready(state)
jax.profiler.start_trace("/tmp/jaxprof")
for _ in range(5):
    state, _ = step(state, batch, lr, key)
jax.block_until_ready(state)
jax.profiler.stop_trace()
files = glob.glob("/tmp/jaxprof/**/*", recursive=True)
print("trace files:", len(files))
for f in files[:10]: print(" ", f, os.path.getsize(f) if os.path.isfile(f) else "dir")
