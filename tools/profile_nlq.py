import sys; sys.path.insert(0, __import__("os").path.dirname(__import__("os").path.dirname(__import__("os").path.abspath(__file__))))
import os
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.cache/jax_tpu")
if "axon" in os.environ.get("JAX_PLATFORMS", ""):
    os.environ["JAX_PLATFORMS"] = "axon,cpu"
import numpy as np, jax, jax.numpy as jnp
from __graft_entry__ import _nlq_flagship_cfg
from vilco_tpu.data.synthetic import make_batch
from vilco_tpu.models.point_transformer import PointTransformer, level_lengths
from vilco_tpu.ops.assign import generate_points
from vilco_tpu.train.engine import CLBatchExtras, TrainState, make_multi_train_step, cast_input_features
from vilco_tpu.train.optim import make_optimizer

cfg = _nlq_flagship_cfg()
B = int(sys.argv[1]) if len(sys.argv) > 1 else 4
cfg = cfg.updated(loader=cfg.loader.updated(batch_size=B))
K = 4
model = PointTransformer(cfg.model, cfg.cl_cfg)
rng = np.random.default_rng(0)
b = make_batch(rng, B, cfg)
cpu = jax.devices("cpu")[0]
init_model = PointTransformer(cfg.model.updated(fused_attention=False, fused_conv=False, attention_impl="xla"), cfg.cl_cfg)
with jax.default_device(cpu):
    params = init_model.init(jax.random.PRNGKey(0), jnp.asarray(b["feats"]), jnp.asarray(b["mask"]), text=jnp.asarray(b["text"]), text_mask=jnp.asarray(b["text_mask"]), deterministic=True)["params"]
tx, _ = make_optimizer(cfg.opt, params, steps_per_epoch=100)
points = jnp.asarray(generate_points(level_lengths(cfg.model), cfg.model.fpn_strides, cfg.model.regression_range))
step = make_multi_train_step(model, tx, points, cfg, K)
with jax.default_device(cpu):
    opt_state = tx.init(params)
state = TrainState(step=jnp.zeros((), jnp.int32), params=params, opt_state=opt_state,
                   loss_normalizer=jnp.asarray(100.0, jnp.float32), rng=jax.random.PRNGKey(1))
cl = CLBatchExtras(class_mask=jnp.ones((cfg.model.num_classes,), bool))
kb = jax.tree.map(lambda *xs: jnp.stack(xs), *[{k: jnp.asarray(v) for k, v in cast_input_features(make_batch(rng, B, cfg), cfg.model.compute_dtype).items()} for _ in range(K)])
accel = jax.devices()[0]
state = jax.device_put(state, accel); kb = jax.device_put(kb, accel)
cl = jax.device_put(cl, accel)
jstep = jax.jit(step, donate_argnums=0)
state, m, _ = jstep(state, kb, cl); _ = float(m["final_loss"])
with jax.profiler.trace("/tmp/jax_trace_nlq"):
    for _ in range(3):
        state, m, _ = jstep(state, kb, cl)
    _ = float(m["final_loss"])
print("trace done")
