import sys; sys.path.insert(0, __import__("os").path.dirname(__import__("os").path.dirname(__import__("os").path.abspath(__file__))))
import os
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.cache/jax_tpu")
if "axon" in os.environ.get("JAX_PLATFORMS", ""):
    os.environ["JAX_PLATFORMS"] = "axon,cpu"
import numpy as np, jax, jax.numpy as jnp, optax
from vilco_tpu.models.clip_matcher import ClipMatcher
from vilco_tpu.train.vq_engine import VQTrainState, make_vq_train_step

B, T, S, P = 4, 30, 448, 14
model = ClipMatcher(dim=256, clip_size=S, patch_size=P, vit_dim=768,
                    vit_depth=12, vit_heads=12, resolution_transformer=8,
                    resolution_anchor_feat=16, num_transformer=3,
                    window_transformer=5, num_frames=T, use_fused=True)
cpu = jax.devices("cpu")[0]; accel = jax.devices()[0]
rng = np.random.default_rng(0)
def fresh():
    return {"clip": jnp.asarray(rng.random((B,T,S,S,3), np.float32)),
            "query": jnp.asarray(rng.random((B,S,S,3), np.float32)),
            "clip_bbox": jnp.asarray(np.tile([0.3,0.3,0.6,0.6],(B,T,1)).astype(np.float32)),
            "clip_with_bbox": jnp.ones((B,T), jnp.float32),
            "before_query": jnp.ones((B,T), jnp.float32)}
b0 = jax.tree.map(lambda x: jax.device_put(x, cpu), fresh())
with jax.default_device(cpu):
    # unfused twin init on CPU — the Pallas kernels hold no params
    params = model.clone(use_fused=False).init(jax.random.PRNGKey(0), jnp.zeros((1,1,S,S,3), jnp.float32), jnp.zeros((1,S,S,3), jnp.float32), deterministic=True)["params"]
params = jax.device_put(params, accel)
from vilco_tpu.train.vq_engine import make_vq_optimizer
tx = make_vq_optimizer(1e-4, 1e-4, freeze_backbone=True)
with jax.default_device(cpu):
    opt_state = tx.init(jax.device_put(params, cpu))
state = VQTrainState(step=jnp.zeros((), jnp.int32), params=params,
                     opt_state=jax.device_put(opt_state, accel),
                     rng=jax.random.PRNGKey(1))
step = make_vq_train_step(model, tx)
batches = [jax.device_put(fresh(), accel) for _ in range(2)]
for i in range(3):
    state, m = step(state, batches[i % 2])
float(m["final_loss"])
with jax.profiler.trace("/tmp/jax_trace_vq4"):
    for i in range(3):
        state, m = step(state, batches[i % 2])
    float(m["final_loss"])
print("trace done")
