"""Training schedules: keep-rate cosine anneal, warmup+cosine LR, and
BEiT layer-wise LR decay scales.

Golden semantics from:
- keep-rate: ``/root/reference/audiomae/engine_finetune.py:29-53`` (and its
  duplicate ``ast/src/traintest.py:25-49``)
- LR: ``/root/reference/audiomae/util/lr_sched.py:9-21`` (per-iteration
  fractional epoch)
- layer decay: ``/root/reference/audiomae/util/lr_decay.py:15-75``
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import jax.numpy as jnp


def scheduled_keep_rates(
    iters: int,
    epoch: int,
    *,
    shrink_start_epoch: int,
    total_epochs: int,
    iters_per_epoch: int,
    base_keep_rate: float,
    max_keep_rate: float = 1.0,
    num_blocks: int = 12,
    drop_loc: Tuple[int, ...] = (3, 6, 9),
) -> Optional[Tuple[float, ...]]:
    """Per-iteration keep-rate tuple (engine_finetune.py:29-53).

    - epoch < shrink_start_epoch: all 1.0 (no pruning yet)
    - shrink phase: cosine from max_keep_rate -> base_keep_rate at the
      drop_loc blocks; note ``total_epochs`` here means
      shrink_start_epoch + shrink_epochs, as called at
      engine_finetune.py:96-99.
    - epoch >= total_epochs: None (model falls back to its baked per-block
      default keep rates).
    """
    if epoch < shrink_start_epoch:
        return (1.0,) * num_blocks
    if epoch >= total_epochs:
        return None
    total_iters = iters_per_epoch * (total_epochs - shrink_start_epoch)
    it = iters - iters_per_epoch * shrink_start_epoch
    target = base_keep_rate + (max_keep_rate - base_keep_rate) * (
        math.cos(it / total_iters * math.pi) + 1.0
    ) * 0.5
    rates = [1.0] * num_blocks
    for i in drop_loc:
        rates[i] = target
    return tuple(rates)


def bucket_keep_rates(
    rates: Tuple[float, ...],
    *,
    base_keep_rate: float,
    max_keep_rate: float = 1.0,
    n_buckets: int = 4,
) -> Tuple[float, ...]:
    """Snap each scheduled keep rate UP to one of ``n_buckets`` discrete
    levels in [base_keep_rate, max_keep_rate] (TrainConfig.anneal_mode
    'bucketed').  Rounding up guarantees the effective keep rate is never
    below the reference's scheduled value, so bucketing only ever prunes
    LESS aggressively mid-anneal."""
    if n_buckets < 2:
        raise ValueError("anneal_buckets must be >= 2")
    levels = [
        base_keep_rate + (max_keep_rate - base_keep_rate) * i / (n_buckets - 1)
        for i in range(n_buckets)
    ]
    out = []
    for r in rates:
        if r >= max_keep_rate:
            out.append(max_keep_rate)
            continue
        # Strict snap-up (1e-9 float-fuzz only, for exact-level hits):
        # kept tokens are ceil(keep_rate * P), so any real snap-down
        # tolerance could keep one token fewer than the schedule at a
        # bucket boundary.  The cosine tail (e.g. 0.7005) therefore rides
        # one level above base until the static phase takes over — that
        # costs a little speedup at the tail, never correctness.
        # No rounding: the level values are used verbatim so the base
        # bucket compares equal (==) to cfg.base_keep_rate and shares the
        # post-shrink static step's compile-cache key (train.py); rounding
        # to 6 decimals broke that for rates like 1/3 and could nudge a
        # level below its true snap-up value.
        snapped = next((lv for lv in levels if lv >= r - 1e-9), max_keep_rate)
        out.append(snapped)
    return tuple(out)


def masked_kept_counts(
    rates: Tuple[float, ...],
    drop_loc: Tuple[int, ...],
    num_patches: int,
) -> Tuple[int, ...]:
    """Per-block kept-token counts for the masked (traced-rate) path,
    composed on the host in Python double — EXACTLY the arithmetic of the
    static path (``math.ceil(keep * kept)``, models_vit.py:104).

    The in-graph float32 ``ceil(keep * kept)`` can disagree with double
    math.ceil when the product sits on an integer boundary (e.g. keep 0.07,
    kept 100: double gives 7.000000000000001 -> 8, f32 rounds to 7.0 -> 7),
    so the engine precomputes the counts here and feeds them to
    ``forward_masked(num_left_array=...)`` as traced ints — same single
    compilation, bit-identical pruning widths to the reference.

    Delegates to ``config.compose_kept_counts`` (the same arithmetic the
    static path's ``tokens_per_block`` uses) after neutralizing rates at
    non-``drop_loc`` blocks, so the static and masked paths share one
    source of truth for widths."""
    from tpat_tpu.config import compose_kept_counts

    effective = tuple(
        r if i in drop_loc else 1.0 for i, r in enumerate(rates)
    )
    return compose_kept_counts(effective, num_patches)


def kept_count_tables(
    rates: Tuple[float, ...],
    drop_loc: Tuple[int, ...],
    num_patches: int,
):
    """(depth, num_patches+1) int32 lookup: ``table[i][n] = ceil(rates[i]
    * n)`` composed in host double — the reference's ``math.ceil``
    arithmetic (models_vit.py:104) for a RUNTIME kept count ``n``.

    Used by the intensity-band eval, where the band intersects the token
    mask mid-network and makes downstream kept counts per-sample
    data-dependent: ``masked_kept_counts`` cannot precompose them, and
    the in-graph f32 ceil can disagree with double at integer boundaries.
    Non-``drop_loc`` rows are the identity (never indexed)."""
    import math

    import numpy as np

    depth = len(rates)
    tbl = np.zeros((depth, num_patches + 1), np.int32)
    for i, r in enumerate(rates):
        if i in drop_loc:
            tbl[i] = [math.ceil(float(r) * n) for n in range(num_patches + 1)]
        else:
            tbl[i] = np.arange(num_patches + 1)
    return tbl


def schedule_phase(
    epoch: int, *, shrink_start_epoch: int, shrink_epochs: int,
    base_keep_rate: float,
) -> str:
    """Which compiled train-step variant an epoch uses.

    'dense'  — pre-shrink (all keep rates exactly 1.0): static dense graph.
    'anneal' — shrink phase: keep rates change per iteration -> masked path.
    'static' — post-shrink: baked default keep rates -> static pruned graph.
    """
    if base_keep_rate >= 1.0:
        return "dense"
    if epoch < shrink_start_epoch:
        return "dense"
    if epoch < shrink_start_epoch + shrink_epochs:
        return "anneal"
    return "static"


def warmup_cosine_lr(
    fractional_epoch: float,
    *,
    lr: float,
    min_lr: float,
    warmup_epochs: float,
    total_epochs: int,
):
    """Per-iteration warmup + half-cosine decay (util/lr_sched.py:9-21).

    Accepts a Python float or a traced jnp scalar.
    """
    e = fractional_epoch
    warm = lr * e / max(warmup_epochs, 1e-8)
    denom = max(total_epochs - warmup_epochs, 1e-8)
    cos = min_lr + (lr - min_lr) * 0.5 * (
        1.0 + jnp.cos(math.pi * (e - warmup_epochs) / denom)
    )
    return jnp.where(e < warmup_epochs, warm, cos)


def layer_id_for_vit(path: Tuple[str, ...], num_layers: int) -> int:
    """BEiT layer id from a flax param path (util/lr_decay.py:64-75).

    cls/dist/pos/patch-embed -> 0; blocks_i -> i+1; head etc -> num_layers.
    """
    top = path[0]
    if top in ("cls_token", "dist_token", "pos_embed", "patch_embed"):
        return 0
    if top.startswith("blocks_"):
        return int(top.split("_")[1]) + 1
    return num_layers


def layer_decay_scale(path: Tuple[str, ...], depth: int, layer_decay: float) -> float:
    """lr scale = layer_decay ** (num_layers - layer_id), with num_layers =
    depth + 1 (util/lr_decay.py:23-25)."""
    num_layers = depth + 1
    lid = layer_id_for_vit(path, num_layers)
    return layer_decay ** (num_layers - lid)


def weight_decay_mask(path: Tuple[str, ...], leaf) -> bool:
    """True where weight decay applies: excludes all 1-D params (norms,
    biases) and the model-specific no-decay list {pos_embed, cls_token}
    (util/lr_decay.py:31-37, models_vit.py:330-332)."""
    if path[0] in ("pos_embed", "cls_token", "dist_token"):
        return False
    return getattr(leaf, "ndim", 0) > 1
