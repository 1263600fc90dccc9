"""Device mesh + sharding rules (DP / TP over `jax.sharding.Mesh`).

TPU-native replacement for the reference's torch.distributed substrate
(SURVEY.md section 2.3): instead of NCCL process groups + DistributedSampler
(+ the MQ/NLQ DDP wrapper that is actually commented out, so reference
multi-GPU never syncs gradients — MQ/libs/utils/train_utils.py:298), the
train step is jitted over a named mesh:

  axes: ("data", "model")
  - batch dims are sharded over "data" (pure DP; gradient psum over ICI is
    inserted by XLA)
  - attention / MLP kernels are sharded over "model" (tensor parallel):
    qkv/fc1 kernels column-wise (out dim), proj/fc2 row-wise (in dim), so
    each block needs a single all-reduce at its output

Models here are <=~200M params, so TP is about HBM headroom and batch-1
latency, not necessity — mesh shape (N, 1) gives pure DP.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_devices: Optional[int] = None,
    model_parallel: int = 1,
    devices: Optional[Sequence] = None,
) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    if n_devices is not None:
        if len(devices) < n_devices:
            raise ValueError(
                f"make_mesh: requested {n_devices} devices but only "
                f"{len(devices)} are available "
                f"(platform={devices[0].platform if devices else '?'}). "
                "For a virtual mesh set JAX_PLATFORMS=cpu and "
                f"XLA_FLAGS=--xla_force_host_platform_device_count="
                f"{n_devices} before jax initializes.")
        devices = devices[:n_devices]
    n = len(devices)
    if n % model_parallel:
        raise ValueError(
            f"make_mesh: {n} devices not divisible by "
            f"model_parallel={model_parallel}")
    arr = np.asarray(devices).reshape(n // model_parallel, model_parallel)
    return Mesh(arr, axis_names=("data", "model"))


def _param_spec(path, leaf) -> P:
    names = [str(getattr(p, "key", "")) for p in path]
    leafname = names[-1] if names else ""
    parent = names[-2] if len(names) >= 2 else ""
    if leafname == "kernel" and leaf.ndim == 2:
        # column-parallel: qkv projections + first MLP layer
        if parent in ("query", "key", "value", "qkv", "mlp_fc1", "ff1"):
            return P(None, "model")
        # row-parallel: output projections + second MLP layer
        if parent in ("proj", "mlp_fc2", "ff2"):
            return P("model", None)
    if leafname == "kernel" and leaf.ndim == 3 and leaf.shape[1] > 1:
        # non-depthwise conv (K, Cin/g, Cout): shard output channels
        return P(None, None, "model")
    return P()


def param_shardings(params, mesh: Mesh):
    """NamedSharding pytree for the parameter tree. Specs whose sharded
    dimension does not divide by the mesh axis fall back to replication
    (e.g. a class-agnostic head with a single output channel under TP)."""

    def spec_for(path, leaf):
        spec = _param_spec(path, leaf)
        for dim, name in enumerate(spec):
            if name is not None and leaf.shape[dim] % mesh.shape[name]:
                return P()
        return spec

    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: NamedSharding(mesh, spec_for(path, leaf)),
        params,
    )


def batch_shardings(batch, mesh: Mesh):
    """Shard every array's leading (batch) axis over 'data'."""
    return jax.tree.map(
        lambda x: NamedSharding(mesh, P("data", *([None] * (x.ndim - 1)))),
        batch,
    )


def replicated(tree, mesh: Mesh):
    return jax.tree.map(lambda _: NamedSharding(mesh, P()), tree)


def shard_params(params, mesh: Mesh):
    return jax.device_put(params, param_shardings(params, mesh))


def shard_batch(batch, mesh: Mesh):
    return jax.device_put(batch, batch_shardings(batch, mesh))


def init_distributed() -> tuple:
    """Multi-host bring-up: the TPU-native replacement for the reference's
    `init_process_group("nccl")` + torchrun rendezvous (MQ/train_cl.py:52,
    VQ/utils/dist_utils.py:31-43).

    MUST run before anything initializes the XLA backend (jax.devices(),
    model init, even jax.process_count()) — train_cl calls it first thing.
    Calls `jax.distributed.initialize()` when a coordinator is configured
    (JAX_COORDINATOR_ADDRESS env or TPU-pod metadata via megascale env
    vars); otherwise a single-process no-op. On generic (non-SLURM,
    non-TPU-pod) launches jax's cluster auto-detection cannot infer the
    process layout, so `JAX_NUM_PROCESSES` and `JAX_PROCESS_ID` are read
    here and passed explicitly — the torchrun env-var launch shape:

      JAX_COORDINATOR_ADDRESS=host:port JAX_NUM_PROCESSES=N \\
      JAX_PROCESS_ID=i python -m vilco_tpu.bin.train_cl --distributed ...

    Returns (process_index, process_count) — feed these to BatchIterator's
    (shard_id, num_shards) for the deterministic per-host data shard that
    replaces DistributedSampler.
    """
    import os

    if os.environ.get("JAX_COORDINATOR_ADDRESS") or os.environ.get(
            "MEGASCALE_COORDINATOR_ADDRESS"):
        n = os.environ.get("JAX_NUM_PROCESSES")
        i = os.environ.get("JAX_PROCESS_ID")
        kwargs = {}
        if (n is None) != (i is None):
            raise RuntimeError(
                "JAX_NUM_PROCESSES and JAX_PROCESS_ID must be set as a "
                f"pair (got JAX_NUM_PROCESSES={n!r}, JAX_PROCESS_ID={i!r})"
            )
        if n is not None and i is not None:
            kwargs = dict(num_processes=int(n), process_id=int(i))
        try:
            jax.distributed.initialize(**kwargs)
        except RuntimeError as e:
            if "already" not in str(e).lower():
                raise
    return jax.process_index(), jax.process_count()
