"""Profile the VQ sliding-window INFERENCE step (VERDICT r4 #8).

Traces make_vq_eval_step (batched windows -> frozen ViT -> tracker ->
per-frame top-anchor decode) at the leaderboard geometry (batch 4 windows
x 30 frames x 448^2). Writes /tmp/jax_trace_vq_eval for parse_trace.py.
"""

import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.cache/jax_tpu")
if "axon" in os.environ.get("JAX_PLATFORMS", ""):
    os.environ["JAX_PLATFORMS"] = "axon,cpu"

import numpy as np
import jax
import jax.numpy as jnp

from vilco_tpu.models.clip_matcher import ClipMatcher
from vilco_tpu.train.vq_engine import make_vq_eval_step

B, T, S, P = 4, 30, 448, 14
mk = lambda fused: ClipMatcher(
    dim=256, clip_size=S, patch_size=P, resolution_transformer=8,
    resolution_anchor_feat=16, num_transformer=3, window_transformer=5,
    num_frames=T, use_fused=fused, vit_attn_impl="pallas",
    vit_dim=768, vit_depth=12, vit_heads=12)
model = mk(True)
init_twin = mk(False)
cpu = jax.devices("cpu")[0]
accel = jax.devices()[0]
with jax.default_device(cpu):
    params = init_twin.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 1, S, S, 3), jnp.float32),
        jnp.zeros((1, S, S, 3), jnp.float32), deterministic=True)["params"]
params = jax.device_put(params, accel)
rng = np.random.default_rng(0)
clip = jax.device_put(
    jnp.asarray(rng.random((B, T, S, S, 3), np.float32)), accel)
query = jax.device_put(
    jnp.asarray(rng.random((B, S, S, 3), np.float32)), accel)
estep = make_vq_eval_step(model)
bbox, prob = estep(params, clip, query)
print("warm", float(prob[0, 0]))
with jax.profiler.trace("/tmp/jax_trace_vq_eval"):
    for _ in range(3):
        bbox, prob = estep(params, clip, query)
    print("traced", float(prob[0, 0]))
print("trace done")
