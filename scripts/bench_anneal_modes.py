"""Anneal-mode shootout on the real TPU: masked vs bucketed vs HYBRID step
time at the headline geometry (ViT-B, ESC-50 512x128, batch 64, bf16,
base keep 0.7, drop_loc (3,6,9)).

VERDICT r2 #2 done-criterion: hybrid (exact schedule, bucket-width shapes)
recovers most of the masked path's 2.2x overhead vs the static step.

Protocol per CLAUDE.md: inputs generated on-device; timing forced by the
epoch-end scalar fetch inside train_epoch itself.
"""

import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

from tpat_tpu.config import TrainConfig, audiomae_vit_base
from tpat_tpu.engine.train import TrainModule
from tpat_tpu.models.vit import AudioViT

BATCH = 64
ITERS = 20


def run_mode(mode, x, y):
    cfg = audiomae_vit_base(
        target_length=512,
        num_classes=50,
        base_keep_rate=0.7,
        drop_loc=(3, 6, 9),
        drop_path_rate=0.1,
        compute_dtype="bfloat16",
    )
    # a long shrink window so every measured epoch is mid-anneal; epoch 2
    # of 8 puts the scheduled rate ~0.85 (bucket level 0.9)
    tc = TrainConfig(
        batch_size=BATCH,
        epochs=10,
        warmup_epochs=0,
        shrink_start_epoch=0,
        shrink_epochs=8,
        base_keep_rate=0.7,
        drop_loc=(3, 6, 9),
        anneal_mode=mode,
        anneal_buckets=4,
    )
    mod = TrainModule(
        model=AudioViT(cfg), model_cfg=cfg, train_cfg=tc,
        loss_type="ce", iters_per_epoch=ITERS, mesh=None,
    )
    state = mod.init(x)
    batches = [(x, y)] * ITERS

    # warmup pass over every anneal epoch (compile all bucket variants)
    t0 = time.time()
    for epoch in range(8):
        state, stats = mod.train_epoch(state, batches, epoch)
    print(f"[{mode}] warmup anneal (incl compiles): {time.time()-t0:.1f}s "
          f"loss={stats['loss']:.4f}")
    # timed: the whole 8-epoch shrink phase (buckets 1.0 -> 0.7)
    times = []
    for rep in range(2):
        t0 = time.time()
        for epoch in range(8):
            state, stats = mod.train_epoch(state, batches, epoch)
        dt = (time.time() - t0) / (8 * ITERS) * 1000
        times.append(dt)
        print(f"[{mode}] rep{rep}: {dt:.1f} ms/step avg over the anneal "
              f"({BATCH / dt * 1000:.0f} clips/s) loss={stats['loss']:.4f}")
    return min(times)


def main():
    gen = jax.jit(
        lambda k: jax.random.normal(k, (BATCH, 1, 512, 128), jnp.float32)
    )
    x = gen(jax.random.PRNGKey(0))
    y = jnp.eye(50, dtype=jnp.float32)[
        jnp.asarray(np.random.default_rng(0).integers(0, 50, BATCH))
    ]
    float(jnp.sum(x))

    results = {}
    for mode in ("hybrid", "masked", "bucketed"):
        results[mode] = run_mode(mode, x, y)
    print("\nbest ms/step @ mid-anneal (epoch 2/8, scheduled ~0.85):")
    for mode, dt in results.items():
        print(f"  {mode:9s} {dt:7.1f} ms  ({BATCH/dt*1000:6.0f} clips/s)")


if __name__ == "__main__":
    main()
