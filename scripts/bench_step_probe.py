"""Probe the gap between train_epoch (80 ms/step) and the recorded bare
train step (58.6 ms): per-dispatch overhead vs metric computation vs the
optimizer wrapper.  Runs three variants on the real TPU:

A) mod.compiled_step in a plain Python loop (what train_epoch does)
B) minimal jitted step: value_and_grad + tx.update only, no metrics
C) 20 steps fused into one dispatch via lax.scan (dispatch-overhead-free)
"""

import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import jax
import jax.numpy as jnp
import numpy as np
import optax

from tpat_tpu.config import TrainConfig, audiomae_vit_base
from tpat_tpu.engine.train import TrainModule, soft_cross_entropy
from tpat_tpu.models.vit import AudioViT

BATCH = 64
ITERS = 20


def force(x):
    return float(jnp.sum(jax.tree_util.tree_leaves(x)[0]))


def main():
    cfg = audiomae_vit_base(
        target_length=512, num_classes=50, base_keep_rate=0.7,
        drop_loc=(3, 6, 9), drop_path_rate=0.1, compute_dtype="bfloat16",
    )
    tc = TrainConfig(
        batch_size=BATCH, epochs=10, warmup_epochs=0,
        shrink_start_epoch=0, shrink_epochs=0,
        base_keep_rate=0.7, drop_loc=(3, 6, 9),
    )
    mod = TrainModule(
        model=AudioViT(cfg), model_cfg=cfg, train_cfg=tc,
        loss_type="ce", iters_per_epoch=ITERS,
    )
    gen = jax.jit(lambda k: jax.random.normal(k, (BATCH, 1, 512, 128), jnp.float32))
    x = gen(jax.random.PRNGKey(0))
    y = jnp.eye(50, dtype=jnp.float32)[
        jnp.asarray(np.random.default_rng(0).integers(0, 50, BATCH))
    ]
    float(jnp.sum(x))
    state = mod.init(x)
    step = mod.compiled_step("static")
    acc = mod._zero_acc()

    # A: plain loop over compiled_step
    state, acc = step(state, acc, x, y)  # warmup/compile
    force(acc["loss_sum"])
    t0 = time.time()
    for _ in range(ITERS):
        state, acc = step(state, acc, x, y)
    force(acc["loss_sum"])
    print(f"A compiled_step loop: {(time.time()-t0)/ITERS*1000:.1f} ms/step")

    # B: minimal step (no metrics, no acc)
    model = mod.model
    tx = mod._tx

    def minimal(state, x, y):
        rng, r0, r1 = jax.random.split(jax.random.fold_in(state.rng, state.step), 3)

        def loss_fn(p):
            logits = model.apply(
                {"params": p}, x, keep_rates=None, deterministic=False,
                rngs={"dropout": r0, "droppath": r1},
            )
            return soft_cross_entropy(logits, y)

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return state.replace(
            step=state.step + 1, params=params, opt_state=opt_state, rng=rng
        ), loss

    jmin = jax.jit(minimal, donate_argnums=(0,))
    state, loss = jmin(state, x, y)
    float(loss)
    t0 = time.time()
    for _ in range(ITERS):
        state, loss = jmin(state, x, y)
    float(loss)
    print(f"B minimal step loop:  {(time.time()-t0)/ITERS*1000:.1f} ms/step")

    # C: scan 20 minimal steps in one dispatch
    def scan_body(state, _):
        state, loss = minimal(state, x, y)
        return state, loss

    @jax.jit
    def scan20(state):
        return jax.lax.scan(scan_body, state, None, length=ITERS)

    state, losses = scan20(state)
    force(losses)
    t0 = time.time()
    state, losses = scan20(state)
    force(losses)
    print(f"C scanned 20 steps:   {(time.time()-t0)/ITERS*1000:.1f} ms/step")


if __name__ == "__main__":
    main()
