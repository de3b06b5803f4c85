"""AST training-recipe tests: Adam+L2 optimizer parity with torch, the
MultiStepLR+warmup schedule, hard-CE loss, and the per-epoch keep-rate
iteration mode."""

import numpy as np
import torch
import jax
import jax.numpy as jnp
import optax

from tpat_tpu.config import TrainConfig
from tpat_tpu.engine import optimizer as opt_lib
from tpat_tpu.engine.train import hard_cross_entropy


def test_ast_adam_matches_torch():
    """Three steps of our ast_adam chain vs torch.optim.Adam(weight_decay)."""
    w0 = np.random.default_rng(0).normal(size=(4, 3)).astype(np.float32)
    grads = [
        np.random.default_rng(i + 1).normal(size=(4, 3)).astype(np.float32)
        for i in range(3)
    ]
    lr, wd = 1e-3, 5e-7

    # torch
    p = torch.nn.Parameter(torch.from_numpy(w0.copy()))
    opt = torch.optim.Adam([p], lr=lr, weight_decay=wd, betas=(0.95, 0.999))
    for g in grads:
        opt.zero_grad()
        p.grad = torch.from_numpy(g.copy())
        opt.step()
    want = p.detach().numpy()

    # ours
    # lrscheduler_start far out -> constant lr; iters_per_epoch must stay
    # SMALL (make_ast_lr_fn materializes an epochs*iters host table —
    # 10**6 here once made this single test 447 s of the smoke tier)
    tc = TrainConfig(optimizer="ast_adam", lr=lr, ast_weight_decay=wd,
                     warmup=False, lrscheduler_start=10**6)
    lr_fn = opt_lib.make_ast_lr_fn(tc, iters_per_epoch=10)
    tx = opt_lib.make_ast_optimizer(tc, lr_fn)
    params = {"w": jnp.asarray(w0)}
    state = tx.init(params)
    for g in grads:
        updates, state = tx.update({"w": jnp.asarray(g)}, state, params)
        params = optax.apply_updates(params, updates)
    got = np.asarray(params["w"])
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-7)


def test_ast_lr_schedule():
    tc = TrainConfig(
        optimizer="ast_adam", lr=1e-3, warmup=True,
        lrscheduler_start=3, lrscheduler_step=1, lrscheduler_decay=0.5,
        epoch_base=1,
    )
    lr_fn = opt_lib.make_ast_lr_fn(tc, iters_per_epoch=500)
    # warmup staircase: updated every 50 steps
    assert float(lr_fn(jnp.asarray(0))) == 0.0
    assert abs(float(lr_fn(jnp.asarray(100))) - 0.1e-3) < 1e-9
    assert abs(float(lr_fn(jnp.asarray(149))) - 0.1e-3) < 1e-9  # held
    assert abs(float(lr_fn(jnp.asarray(1000))) - 1e-3) < 1e-9
    # after warmup: epoch = step//500 + 1; decay applies after completing
    # epoch >= lrscheduler_start
    assert abs(float(lr_fn(jnp.asarray(1100))) - 1e-3) < 1e-9  # epoch 3
    assert abs(float(lr_fn(jnp.asarray(1600))) - 0.5e-3) < 1e-9  # epoch 4
    assert abs(float(lr_fn(jnp.asarray(2100))) - 0.25e-3) < 1e-9  # epoch 5


def test_hard_ce_matches_torch():
    rng = np.random.default_rng(0)
    logits = rng.normal(size=(6, 9)).astype(np.float32)
    onehot = np.eye(9, dtype=np.float32)[rng.integers(0, 9, size=6)]
    got = float(hard_cross_entropy(jnp.asarray(logits), jnp.asarray(onehot)))
    want = float(
        torch.nn.CrossEntropyLoss()(
            torch.from_numpy(logits),
            torch.argmax(torch.from_numpy(onehot), axis=1),
        )
    )
    assert abs(got - want) < 1e-6


def test_ast_lr_warmup_milestone_overlap_torch_oracle():
    """When the 1000-step warmup spans milestone epochs (the small-recipe
    regime: esc50 has ~33 iters/epoch), torch's MultiStepLR decays are
    OVERWRITTEN by the next 50-step warmup write — the effective
    post-warmup lr is ~base, not base*gamma^k.  Replicate torch exactly."""
    import torch

    base, gamma = 1e-3, 0.85
    iters, n_epochs = 33, 40
    start, step_sz = 5, 1

    p = torch.nn.Parameter(torch.zeros(1))
    opt = torch.optim.Adam([p], lr=base)
    sched = torch.optim.lr_scheduler.MultiStepLR(
        opt, list(range(start, 1000, step_sz)), gamma=gamma
    )
    want = []
    gstep = 0
    for _e in range(1, n_epochs + 1):
        for _i in range(iters):
            if gstep <= 1000 and gstep % 50 == 0:
                for g in opt.param_groups:
                    g["lr"] = gstep / 1000 * base
            want.append(opt.param_groups[0]["lr"])
            gstep += 1
        sched.step()

    tc = TrainConfig(
        optimizer="ast_adam", lr=base, warmup=True,
        lrscheduler_start=start, lrscheduler_step=step_sz,
        lrscheduler_decay=gamma, epochs=n_epochs, epoch_base=1,
        batch_size=8,
    )
    lr_fn = opt_lib.make_ast_lr_fn(tc, iters_per_epoch=iters)
    got = [float(lr_fn(jnp.asarray(s))) for s in range(iters * n_epochs)]
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_ast_lr_accum_counts_micro_batches():
    """With optax.MultiSteps the schedule counter counts UPDATES (one per
    accum window) while the reference's global_step/warmup_steps are
    micro-batch units — update u must read the lr in effect at its last
    micro-batch, not stretch the whole schedule by accum_iter."""
    tc = TrainConfig(
        optimizer="ast_adam", lr=1e-3, warmup=True,
        lrscheduler_start=3, lrscheduler_step=1, lrscheduler_decay=0.5,
        epoch_base=1,
    )
    micro = opt_lib.make_ast_lr_fn(tc, iters_per_epoch=500)
    upd = opt_lib.make_ast_lr_fn(tc, iters_per_epoch=500, accum=4)
    for u in [0, 10, 100, 300, 499]:
        assert float(upd(jnp.asarray(u))) == float(
            micro(jnp.asarray(4 * u + 3))
        ), u
