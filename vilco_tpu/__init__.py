"""vilco_tpu: a TPU-native video-language continual-learning framework.

Re-implements the capabilities of ViLCo-Bench (cruiseresearchgroup/ViLCo) as a
single unified JAX/Flax/Pallas runtime with three Ego4D episodic-memory task
plugins (MQ / NLQ / VQ), rather than three copy-pasted PyTorch stacks.

Layout (see SURVEY.md section 7 for the blueprint):
  core/      typed config, registries, rng, checkpointing
  parallel/  device mesh + sharding rules (DP/TP over `jax.sharding.Mesh`)
  ops/       pure-function compute ops: masked conv, attention, label
             assignment, losses, on-device (soft-)NMS, decode
  kernels/   Pallas TPU kernels (banded sliding-window attention, ...)
  models/    Flax modules: point-transformer trunk (MQ/NLQ), clip-matcher (VQ)
  train/     jitted train/eval engine, optimizer/schedule factories
  cl/        continual-learning engine: task streams, rehearsal memory,
             EWC/MAS, iCaRL, BiC, L2P prompt pool, narration-SSL, adapters
  data/      feature stores + padded static-shape pipelines
  evals/     metric engines (ANET mAP, retrieval R@k, ReferringRecall, VQ AP)
  tasks/     task plugins wiring datasets/models/metrics together
  bin/       CLI entry points
"""

__version__ = "0.1.0"
