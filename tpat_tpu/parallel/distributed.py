"""Multi-host initialization — the ``init_distributed_mode`` equivalent
(``/root/reference/audiomae/util/misc.py:218-250``).

The reference discovers rank/world from RANK/WORLD_SIZE, OMPI_COMM_WORLD_*
or SLURM env vars and opens an NCCL process group.  The JAX equivalent is
``jax.distributed.initialize``: each host joins a coordinator, after which
``jax.devices()`` spans all hosts and the same jit'd SPMD program runs
everywhere (collectives ride ICI within a slice and DCN across slices).

Single-host runs need none of this — ``make_mesh`` over local devices is
the whole story — so initialization is a no-op unless multi-host env vars
are present.
"""

from __future__ import annotations

import os
from typing import Optional, Tuple


def init_distributed_mode(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> Tuple[int, int]:
    """Initialize multi-host JAX if configured; returns (rank, world).

    Env discovery order mirrors the reference: explicit args, then
    COORDINATOR_ADDRESS/NUM_PROCESSES/PROCESS_ID, then SLURM (handled by
    jax.distributed automatically when no args are given).
    """
    import jax

    coordinator_address = coordinator_address or os.environ.get(
        "COORDINATOR_ADDRESS"
    )
    if num_processes is None and "NUM_PROCESSES" in os.environ:
        num_processes = int(os.environ["NUM_PROCESSES"])
    if process_id is None and "PROCESS_ID" in os.environ:
        process_id = int(os.environ["PROCESS_ID"])

    if coordinator_address or "SLURM_JOB_ID" in os.environ:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    return jax.process_index(), jax.process_count()


def is_main_process() -> bool:
    """Rank-0 predicate (misc.py:202-215)."""
    import jax

    return jax.process_index() == 0


def print_rank0(*args, **kwargs):
    """Rank-0-only printing (misc.py setup_for_distributed:172-186)."""
    if is_main_process():
        print(*args, **kwargs)
