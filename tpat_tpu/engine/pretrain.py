"""The MAE pretrain optimizer + train step, shared by the driver and
the benchmarks.

One construction serves ``cli/pretrain.py`` (the real driver),
``bench.py::measure_pretrain_step`` (the driver-visible benchmark) and
``scripts/bench_mae_step.py`` (the profiling harness) so the benchmark
can never silently drift from the step it claims to measure.

Reference semantics: the AudioMAE pretrain recipe the (missing upstream)
``main_pretrain.py`` would run — AdamW(b1=0.9, b2=0.95) with
``add_weight_decay`` param grouping (decay only ndim > 1), frozen
sin-cos pos embeds excluded from decay because their gradient is stopped
in the forward (``models_mae.py:55,69``: ``requires_grad=False`` params
never join the torch param groups), warmup-cosine LR, masked-MSE loss.
"""

from __future__ import annotations

import functools
from typing import Callable

import jax
import optax


def mae_decay_mask(params, pos_trainable: bool):
    """add_weight_decay semantics: decay ndim > 1, minus frozen pos
    embeds (decaying a gradient-stopped param would silently drift the
    fixed sin-cos tables)."""

    def decay_mask_fn(path, p):
        name = path[-1].key if hasattr(path[-1], "key") else str(path[-1])
        frozen = (not pos_trainable) and name in (
            "pos_embed", "decoder_pos_embed"
        )
        return p.ndim > 1 and not frozen

    return jax.tree_util.tree_map_with_path(decay_mask_fn, params)


def make_mae_optimizer(
    params,
    *,
    lr_fn: Callable,
    weight_decay: float,
    pos_trainable: bool,
    b1: float = 0.9,
    b2: float = 0.95,
):
    """AdamW with MAE param grouping; ``lr_fn(step) -> lr``."""
    return optax.chain(
        optax.scale_by_adam(b1=b1, b2=b2),
        optax.add_decayed_weights(
            weight_decay, mask=mae_decay_mask(params, pos_trainable)
        ),
        optax.scale_by_schedule(lambda s: -lr_fn(s)),
    )


def make_mae_train_step(model, tx, mask_ratio: float):
    """Donated jitted step with device-side loss accumulation (the host
    fetches loss_sum once per epoch instead of blocking every step)."""

    @functools.partial(jax.jit, donate_argnums=(0, 1, 2))
    def train_step(params, opt_state, loss_sum, rng, step, x):
        def loss_fn(p):
            r = jax.random.fold_in(rng, step)
            r_mask, r_drop = jax.random.split(r)
            loss, _, _ = model.apply(
                {"params": p}, x, mask_ratio,
                deterministic=False,  # swin decoder meta-MLP dropout 0.125
                rngs={"masking": r_mask, "dropout": r_drop},
            )
            return loss

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state2 = tx.update(grads, opt_state, params)
        return (
            optax.apply_updates(params, updates),
            opt_state2,
            loss_sum + loss,
        )

    return train_step
