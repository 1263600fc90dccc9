import os
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.cache/jax_tpu")
if "axon" in os.environ.get("JAX_PLATFORMS", ""):
    os.environ["JAX_PLATFORMS"] = "axon,cpu"
import numpy as np, jax, jax.numpy as jnp
from __graft_entry__ import _flagship_cfg
from vilco_tpu.data.synthetic import make_batch
from vilco_tpu.models.point_transformer import PointTransformer, level_lengths
from vilco_tpu.ops.assign import generate_points
from vilco_tpu.train.engine import CLBatchExtras, TrainState, make_multi_train_step
from vilco_tpu.train.optim import make_optimizer

cfg = _flagship_cfg()
cfg = cfg.updated(loader=cfg.loader.updated(batch_size=8))
B = 8; K = 4
model = PointTransformer(cfg.model, cfg.cl_cfg)
rng = np.random.default_rng(0)
b = make_batch(rng, B, cfg)
cpu = jax.devices("cpu")[0]
init_model = PointTransformer(cfg.model.updated(fused_attention=False, fused_conv=False, attention_impl="xla", fused_xl=False), cfg.cl_cfg)
with jax.default_device(cpu):
    params = init_model.init(jax.random.PRNGKey(0), jnp.asarray(b["feats"]), jnp.asarray(b["mask"]), deterministic=True)["params"]
tx, _ = make_optimizer(cfg.opt, params, steps_per_epoch=100)
points = jnp.asarray(generate_points(level_lengths(cfg.model), cfg.model.fpn_strides, cfg.model.regression_range))
step = make_multi_train_step(model, tx, points, cfg, K)
with jax.default_device(cpu):
    opt_state = tx.init(params)
state = TrainState(step=jnp.zeros((), jnp.int32), params=params, opt_state=opt_state,
                   loss_normalizer=jnp.asarray(100.0, jnp.float32), rng=jax.random.PRNGKey(1))
cl = CLBatchExtras(class_mask=jnp.ones((cfg.model.num_classes,), bool))
kb = jax.tree.map(lambda *xs: jnp.stack(xs), *[{k: jnp.asarray(v) for k, v in make_batch(rng, B, cfg).items()} for _ in range(K)])
accel = jax.devices()[0]
state = jax.device_put(state, accel)
kb = jax.device_put(kb, accel)
cl = jax.device_put(cl, accel)
points = jax.device_put(points, accel)
lowered = jax.jit(step).lower(state, kb, cl)
comp = lowered.compile()
ca = comp.cost_analysis()
ca = ca[0] if isinstance(ca, list) else ca
fl = ca.get("flops", float("nan"))
print("flops per dispatch (K=%d, B=%d): %.3f TF" % (K, B, fl/1e12))
print("flops per step: %.3f TF" % (fl/K/1e12))
print("bytes accessed: %.2f GB" % (ca.get("bytes accessed", float("nan"))/1e9))
step_ms = 74.7
print("MFU at %.0f ms/step vs 197 TFLOP/s bf16 peak: %.1f%%" % (step_ms, (fl/K)/ (step_ms/1e3) / 197e12 * 100))
