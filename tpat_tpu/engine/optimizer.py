"""AdamW with BEiT layer-wise LR decay, matching the reference optimizer.

Reference recipe (``/root/reference/audiomae/main_finetune.py:463-468``):
AdamW(betas=(0.9, 0.95)) over param groups built by
``util/lr_decay.py:param_groups_lrd`` — per-layer lr scale
``layer_decay ** (num_layers - layer_id)``, weight decay only on >=2-D
params outside {pos_embed, cls_token}; lr follows the per-iteration
warmup+cosine schedule (``util/lr_sched.py``) times the group scale.

torch.AdamW step (decoupled weight decay):
    p <- p - lr_group * (m_hat / (sqrt(v_hat) + eps) + wd * p)

Implemented as one optax chain with a per-leaf static scale tree; the
frozen pos-embed (``main_finetune.py:382`` sets requires_grad=False) gets
scale 0 so it never moves.
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from tpat_tpu.config import TrainConfig, ViTConfig
from tpat_tpu.engine import schedules


def _path_names(path) -> Tuple[str, ...]:
    out = []
    for p in path:
        if hasattr(p, "key"):
            out.append(str(p.key))
        elif hasattr(p, "name"):
            out.append(str(p.name))
        else:
            out.append(str(p))
    return tuple(out)


def lr_scale_tree(params, depth: int, layer_decay: float, frozen_pos_embed: bool):
    def scale(path, leaf):
        names = _path_names(path)
        if frozen_pos_embed and names[0] == "pos_embed":
            return 0.0
        return schedules.layer_decay_scale(names, depth, layer_decay)

    return jax.tree_util.tree_map_with_path(scale, params)


def wd_mask_tree(params):
    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: schedules.weight_decay_mask(_path_names(path), leaf),
        params,
    )


def make_optimizer(
    params,
    model_cfg: ViTConfig,
    train_cfg: TrainConfig,
    lr_fn: Callable[[jnp.ndarray], jnp.ndarray],
) -> optax.GradientTransformation:
    """lr_fn: step -> lr (the warmup+cosine schedule, per optimizer step)."""
    scales = lr_scale_tree(
        params, model_cfg.depth, train_cfg.layer_decay, model_cfg.frozen_pos_embed
    )
    wd_mask = wd_mask_tree(params)

    def scale_by_leaf() -> optax.GradientTransformation:
        def init(params):
            return optax.EmptyState()

        def update(updates, state, params=None):
            updates = jax.tree_util.tree_map(
                lambda u, s: u * s, updates, scales
            )
            return updates, state

        return optax.GradientTransformation(init, update)

    chain = [
        optax.scale_by_adam(b1=0.9, b2=0.95, eps=1e-8),
        optax.add_decayed_weights(train_cfg.weight_decay, mask=wd_mask),
        scale_by_leaf(),
        optax.scale_by_schedule(lambda step: -lr_fn(step)),
    ]
    if train_cfg.clip_grad is not None:
        chain.insert(0, optax.clip_by_global_norm(train_cfg.clip_grad))
    return optax.chain(*chain)


def make_lr_fn(
    train_cfg: TrainConfig, iters_per_epoch: int, eff_batch_size: int
) -> Callable:
    """Per-iteration LR from the optimizer step count: fractional epoch =
    step / iters_per_epoch (engine_finetune.py:91 passes
    data_iter_step/len(loader) + epoch)."""
    lr = train_cfg.resolved_lr(eff_batch_size)

    def lr_fn(step):
        frac_epoch = step / iters_per_epoch
        return schedules.warmup_cosine_lr(
            frac_epoch,
            lr=lr,
            min_lr=train_cfg.min_lr,
            warmup_epochs=train_cfg.warmup_epochs,
            total_epochs=train_cfg.epochs,
        )

    return lr_fn


def make_ast_optimizer(
    train_cfg: TrainConfig, lr_fn: Callable
) -> optax.GradientTransformation:
    """AST recipe (traintest.py:86): torch.optim.Adam(lr, weight_decay=5e-7,
    betas=(0.95, 0.999)) — coupled L2 (decay added to the gradient BEFORE
    the Adam moments, unlike AdamW)."""
    return optax.chain(
        optax.add_decayed_weights(train_cfg.ast_weight_decay),
        optax.scale_by_adam(b1=0.95, b2=0.999, eps=1e-8),
        optax.scale_by_schedule(lambda step: -lr_fn(step)),
    )


def make_ast_lr_fn(
    train_cfg: TrainConfig, iters_per_epoch: int, accum: int = 1
) -> Callable:
    """Exact step-by-step replica of the reference AST LR machinery
    (traintest.py:95, 160-164, 249): MultiStepLR over milestones
    range(start, 1000, step) multiplies the CURRENT param-group lr by
    gamma at each milestone epoch's end, while the manual warmup
    OVERWRITES the group lr with (global_step/1000)*base at every 50th
    step up to 1000.  These interact — a milestone decay that fires while
    warmup is still writing is wiped out by the next 50-step write, and
    milestones stop at epoch 999 — so a closed form over milestone counts
    is wrong whenever warmup spans milestone epochs (it does in the small
    recipes).  The torch loop is simulated once on the host into a
    per-step table; lr_fn(step) indexes it with the traced step.

    ``accum``: with optax.MultiSteps, the schedule counter counts
    OPTIMIZER UPDATES (one per ``accum`` micro-batches) while the table
    (and the reference's global_step / warmup_steps) is in micro-batch
    units — so update u reads the lr in effect at its LAST micro-batch
    (where torch's opt.step() would fire), not table[u]."""
    base = train_cfg.lr if train_cfg.lr is not None else train_cfg.blr
    start = train_cfg.lrscheduler_start
    step_sz = max(train_cfg.lrscheduler_step, 1)
    gamma = train_cfg.lrscheduler_decay
    milestones = set(range(start, 1000, step_sz))
    iters = max(iters_per_epoch, 1)
    n_epochs = max(train_cfg.epochs, 1)

    lr = base
    table = []
    gstep = 0  # torch global_step: 0 before the first batch
    for e in range(train_cfg.epoch_base, train_cfg.epoch_base + n_epochs):
        for _ in range(iters):
            if (
                train_cfg.warmup
                and gstep <= train_cfg.warmup_steps
                and gstep % 50 == 0
            ):
                lr = gstep / train_cfg.warmup_steps * base
            table.append(lr)
            gstep += 1
        if e in milestones:  # scheduler.step() at epoch end
            lr *= gamma
    tbl = jnp.asarray(table, jnp.float32)

    def lr_fn(step):
        micro = step * accum + (accum - 1)
        return tbl[jnp.clip(micro, 0, len(table) - 1)]

    return lr_fn


def global_grad_norm(grads) -> jnp.ndarray:
    """L2 norm over all leaves (util/misc.py:282-294 get_grad_norm_)."""
    leaves = jax.tree_util.tree_leaves(grads)
    return jnp.sqrt(sum(jnp.sum(jnp.square(g.astype(jnp.float32))) for g in leaves))
