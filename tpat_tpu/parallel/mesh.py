"""Device mesh + sharding layout.

The reference's complete parallelism story is 2-process NCCL DDP
(``/root/reference/audiomae/util/misc.py:218-250``) plus
``nn.DataParallel`` for AST.  The TPU-native replacement is SPMD over a
1-D data mesh: parameters replicated, batch sharded on the ``data`` axis,
gradient/metric reductions become XLA ``psum`` collectives over ICI that
jit inserts automatically from the sharding annotations — no explicit
all_reduce calls, no process groups, no barriers (SPMD is bulk-
synchronous by construction).

ViT-B at <=513 tokens fits one chip with huge headroom, so data-parallel
is the whole strategy for parity (SURVEY.md §2.6); the mesh helpers are
still written n-dimensional-ready (axis names) so a model-parallel axis
can be added without touching call sites.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_mesh(devices: Optional[Sequence] = None, n_devices: Optional[int] = None) -> Mesh:
    """1-D data mesh over all (or the first n) local devices."""
    devices = list(devices if devices is not None else jax.devices())
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.array(devices), (DATA_AXIS,))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading axis sharded over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """Place a host pytree of arrays with leading batch axis onto the mesh,
    sharded over data.  Batch size must divide the mesh size (training uses
    drop_last like the reference's DataLoader, main_finetune.py:332).

    Multi-host (``jax.process_count() > 1``): each process passes its OWN
    shard of the global batch (the rows its ``EpochShardSampler(world,
    rank)`` loaded — the torch DistributedSampler contract,
    main_finetune.py:292-294) and the global array is assembled across
    processes; the global batch is ``world * local_batch`` rows."""
    sh = batch_sharding(mesh)
    if jax.process_count() > 1:
        return jax.tree_util.tree_map(
            lambda x: jax.make_array_from_process_local_data(
                sh, np.asarray(x)
            ),
            batch,
        )
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), batch)


def pad_for_eval(n: int, world: int) -> int:
    """Rows of padding needed so an eval shard divides the mesh; callers
    mask the padded rows out of metrics — the unpadded-exact-eval semantics
    of DistributedEvalSampler (``util/sampler.py:73-99``)."""
    return (-n) % world
