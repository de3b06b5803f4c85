"""Tensor-parallel parameter sharding (GSPMD) — beyond the reference.

The reference's only parallelism is 2-way data parallel (SURVEY.md §2.6);
ViT-B fits one chip, so DP is all parity needs.  For scaling the framework
past parity (ViT-L/H, long targets, big batches), this module provides a
2-D (data, model) mesh with Megatron-style column/row sharding of the
transformer weights; XLA GSPMD propagates the shardings and inserts the
psum after the row-parallel matmuls automatically:

  qkv kernel  (D, 3C)  -> P(None, 'model')   (column parallel)
  proj kernel (C, D)   -> P('model', None)   (row parallel, psum after)
  mlp fc1     (D, 4D)  -> P(None, 'model')
  mlp fc2     (4D, D)  -> P('model', None)
  embeddings, norms, head -> replicated

Note: the packed-qkv Pallas kernel is single-device; under model
parallelism use ``attention_impl='xla'`` (einsum attention partitions
cleanly when num_heads % model_axis == 0).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh_2d(
    dp: int, tp: int, devices: Optional[Sequence] = None
) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    if dp * tp > len(devices):
        raise ValueError(f"mesh {dp}x{tp} needs {dp * tp} devices")
    grid = np.array(devices[: dp * tp]).reshape(dp, tp)
    return Mesh(grid, (DATA_AXIS, MODEL_AXIS))


def _param_pspec(path: Tuple[str, ...], leaf) -> P:
    names = [getattr(p, "key", getattr(p, "name", str(p))) for p in path]
    joined = "/".join(str(n) for n in names)
    if "attn/qkv/kernel" in joined or "mlp/fc1/kernel" in joined:
        return P(None, MODEL_AXIS)
    if "attn/qkv/bias" in joined or "mlp/fc1/bias" in joined:
        return P(MODEL_AXIS)
    if "attn/proj/kernel" in joined or "mlp/fc2/kernel" in joined:
        return P(MODEL_AXIS, None)
    return P()  # replicated: embeddings, norms, biases of row-parallel, head


def param_shardings(params, mesh: Mesh):
    """Pytree of NamedShardings implementing the table above."""
    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: NamedSharding(mesh, _param_pspec(path, leaf)),
        params,
    )


def shard_params(params, mesh: Mesh):
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, s), params, param_shardings(params, mesh)
    )


def batch_sharding_2d(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P(DATA_AXIS))
