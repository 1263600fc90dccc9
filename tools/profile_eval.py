"""Profile the MQ batched inference step (forward + decode + NMS).

The eval bench measured 165 clips/s at batch 16 before the bucketed-NMS fix — barely above the train
step's 137.8 despite being forward-only (~1/3 the FLOPs), so the decode/
NMS chain is suspect. Traces the same jitted eval_fn bench.py uses.
Writes /tmp/jax_trace_eval for parse_trace.py.
"""

import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.cache/jax_tpu")
if "axon" in os.environ.get("JAX_PLATFORMS", ""):
    os.environ["JAX_PLATFORMS"] = "axon,cpu"

import numpy as np
import jax
import jax.numpy as jnp

from __graft_entry__ import _flagship_cfg
from vilco_tpu.data.synthetic import make_batch
from vilco_tpu.models.point_transformer import PointTransformer, level_lengths
from vilco_tpu.ops.assign import generate_points
from vilco_tpu.ops.decode import decode_and_nms_batch

cfg = _flagship_cfg()
cfg = cfg.updated(loader=cfg.loader.updated(batch_size=16))
B = 16
model = PointTransformer(cfg.model, cfg.cl_cfg)
init_model = PointTransformer(
    cfg.model.updated(fused_attention=False, fused_conv=False,
                      attention_impl="xla", fused_xl=False), cfg.cl_cfg)
rng = np.random.default_rng(0)
b = make_batch(rng, B, cfg)
cpu = jax.devices("cpu")[0]
accel = jax.devices()[0]
with jax.default_device(cpu):
    params = init_model.init(
        jax.random.PRNGKey(0), jnp.asarray(b["feats"]),
        jnp.asarray(b["mask"]), deterministic=True)["params"]
params = jax.device_put(params, accel)
points = jax.device_put(jnp.asarray(generate_points(
    level_lengths(cfg.model), cfg.model.fpn_strides,
    cfg.model.regression_range)), accel)
t = cfg.test_cfg


@jax.jit
def eval_fn(params, feats, mask, class_mask):
    out = model.apply({"params": params}, feats, mask, deterministic=True)
    return decode_and_nms_batch(
        points, out["cls_logits"], out["offsets"], out["fpn_mask"],
        class_mask, num_classes=cfg.model.num_classes,
        pre_nms_topk=t.pre_nms_topk, pre_nms_thresh=t.pre_nms_thresh,
        duration_thresh=t.duration_thresh, max_seg_num=t.max_seg_num,
        iou_threshold=t.iou_threshold, min_score=t.min_score,
        nms_sigma=t.nms_sigma, voting_thresh=t.voting_thresh,
        use_soft_nms=t.nms_method == "soft",
        multiclass=t.multiclass_nms)


feats = jax.device_put(jnp.asarray(b["feats"], jnp.bfloat16), accel)
mask = jax.device_put(jnp.asarray(b["mask"]), accel)
cm = jax.device_put(jnp.ones((cfg.model.num_classes,), bool), accel)
det = eval_fn(params, feats, mask, cm)
print("warm", float(det.scores[0, 0]))
with jax.profiler.trace("/tmp/jax_trace_eval"):
    for _ in range(3):
        det = eval_fn(params, feats, mask, cm)
    print("traced", float(det.scores[0, 0]))
print("trace done")
