"""GSPMD partitioning for the Pallas kernels: batch-sharded SPMD.

Mosaic kernels cannot be automatically partitioned by XLA — under a
multi-device mesh a plain ``jit`` raises ``NotImplementedError: Mosaic
kernels cannot be automatically partitioned. Please wrap the call in a
shard_map`` at lowering (``jax/_src/tpu_custom_call.py``), which would
make every fused kernel a multi-chip blocker for data-parallel training
(reproduced via AOT lowering against a ``v5e:2x4`` topology).

Every kernel in this package is batch-parallel: the leading dimension of
its main operands is the batch and all cross-example interaction is
either absent (attention outputs) or a plain sum (the window kernels'
d(scale)/d(template)).  ``batch_partitioned`` therefore wraps a kernel
impl in ``jax.experimental.custom_partitioning``:

- batched operands/results keep whatever sharding GSPMD chose for their
  leading axis; everything else is replicated;
- the per-shard lowering just calls the kernel on local shapes (Mosaic
  sees a single-device program, which is the supported case);
- results marked ``reduced`` are ``lax.psum``'d over the batch axes so
  cross-shard sums (template/scale gradients) stay exact.

This keeps the engine on plain ``jit`` + GSPMD — no shard_map plumbing,
no RNG-stream changes — while the kernels ride the mesh.
"""

from __future__ import annotations

import functools
from typing import Callable, Sequence, Tuple

import jax
from jax.experimental.custom_partitioning import custom_partitioning
from jax.sharding import NamedSharding, PartitionSpec as P


def batch_partitioned(
    fun: Callable,
    batched_args: Sequence[bool],
    n_outs: int,
    reduced_outs: Tuple[int, ...] = (),
    sharding_rule: str = "",
):
    """Wrap a batch-parallel kernel impl for GSPMD meshes.

    fun: positional-only impl; every array argument's position must have
         an entry in ``batched_args`` (True = leading dim is batch).
    n_outs: number of results (1 = single array, else tuple).
    reduced_outs: result indices that are SUMS over the batch — psum'd
         across the batch shards in the per-shard lowering.  All other
         results are batched.
    sharding_rule: Shardy einsum-like rule (required: Shardy is the
         default partitioner; factor letters only propagate the batch).
    """
    batched_args = tuple(batched_args)
    cp = custom_partitioning(fun)

    def _batch_spec(arg_infos):
        for info, is_b in zip(arg_infos, batched_args):
            if is_b:
                spec = info.sharding.spec
                return spec[0] if len(spec) else None
        return None

    def _out_shardings(mesh, b):
        return tuple(
            NamedSharding(mesh, P() if i in reduced_outs else P(b))
            for i in range(n_outs)
        )

    def infer(mesh, arg_infos, result_infos):
        outs = _out_shardings(mesh, _batch_spec(arg_infos))
        return outs if n_outs > 1 else outs[0]

    def partition(mesh, arg_infos, result_infos):
        b = _batch_spec(arg_infos)
        arg_sh = tuple(
            NamedSharding(mesh, P(b) if is_b else P())
            for is_b in batched_args
        )
        res_sh = _out_shardings(mesh, b)
        if b is None:
            axes: Tuple[str, ...] = ()
        elif isinstance(b, str):
            axes = (b,)
        else:
            axes = tuple(b)

        def lower_fn(*args):
            out = fun(*args)
            if axes and reduced_outs:
                outs = list(out) if n_outs > 1 else [out]
                for i in reduced_outs:
                    outs[i] = jax.lax.psum(outs[i], axes)
                out = tuple(outs) if n_outs > 1 else outs[0]
            return out

        return mesh, lower_fn, (res_sh if n_outs > 1 else res_sh[0]), arg_sh

    cp.def_partition(
        partition=partition,
        infer_sharding_from_operands=infer,
        sharding_rule=sharding_rule,
    )
    return cp


def cached_factory(make: Callable) -> Callable:
    """lru_cache for per-static-config wrappers (custom_partitioning
    objects must be built once per static configuration, not per call)."""
    return functools.lru_cache(maxsize=None)(make)
