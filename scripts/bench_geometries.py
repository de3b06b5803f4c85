"""Per-dataset-geometry refresh: inference + static train step on the
real TPU (the docs/BENCH_NOTES.md "Per-dataset geometry validation"
table).  Timing per CLAUDE.md: on-device inputs, >=20 queued dispatches,
one scalar fetch.

Usage: PYTHONPATH=.:$PYTHONPATH python scripts/bench_geometries.py
"""

import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

from tpat_tpu.config import TrainConfig, audiomae_vit_base, audiomae_vit_huge
from tpat_tpu.engine.train import TrainModule
from tpat_tpu.models.vit import AudioViT

# (name, factory, target_length, classes, infer_batch, train_batch, keep)
GEOS = [
    ("ESC-50 512x128 ViT-B", audiomae_vit_base, 512, 50, 128, 128, 0.7),
    ("AudioSet 1024x128 ViT-B", audiomae_vit_base, 1024, 527, 32, 32, 0.7),
    ("SPC-2 128x128 ViT-B", audiomae_vit_base, 128, 35, 256, 256, 0.7),
    ("ViT-H pruned 512x128", audiomae_vit_huge, 512, 50, 32, None, 0.7),
    ("ViT-H dense 512x128", audiomae_vit_huge, 512, 50, 32, None, 1.0),
]


def measure_infer(model, cfg, batch):
    gen = jax.jit(lambda k: jax.random.normal(
        k, (batch, 1, cfg.target_length, 128), jnp.float32))
    x = gen(jax.random.PRNGKey(1))
    params = model.init({"params": jax.random.PRNGKey(0)}, x[:1])["params"]
    fwd = jax.jit(lambda p, x: jnp.sum(
        model.apply({"params": p}, x).astype(jnp.float32)))
    float(fwd(params, x))
    for _ in range(3):
        v = fwd(params, x)
    float(v)
    n = 30
    t0 = time.perf_counter()
    for _ in range(n):
        v = fwd(params, x)
    float(v)
    return (time.perf_counter() - t0) / n * 1000


def measure_train(cfg, batch, nc, keep):
    tc = TrainConfig(
        batch_size=batch, epochs=10, warmup_epochs=0, shrink_start_epoch=0,
        shrink_epochs=0, base_keep_rate=keep, drop_loc=(3, 6, 9),
    )
    mod = TrainModule(
        model=AudioViT(cfg), model_cfg=cfg, train_cfg=tc,
        loss_type="bce" if nc == 527 else "ce", iters_per_epoch=20,
    )
    gen = jax.jit(lambda k: jax.random.normal(
        k, (batch, 1, cfg.target_length, 128), jnp.float32))
    x = gen(jax.random.PRNGKey(2))
    y = jnp.eye(nc, dtype=jnp.float32)[
        jnp.asarray(np.random.default_rng(0).integers(0, nc, batch))]
    float(jnp.sum(x))
    state = mod.init(x)
    batches = [(x, y)] * 20
    state, _ = mod.train_epoch(state, batches, epoch=0)
    best = float("inf")
    for rep in range(3):
        t0 = time.perf_counter()
        state, _ = mod.train_epoch(state, batches, epoch=1 + rep)
        best = min(best, (time.perf_counter() - t0) / 20 * 1000)
    return best


def main():
    for name, fac, tl, nc, bi, btr, keep in GEOS:
        cfg = fac(
            target_length=tl, num_classes=nc, base_keep_rate=keep,
            drop_loc=(3, 6, 9) if keep < 1.0 else (),
            drop_path_rate=0.0, compute_dtype="bfloat16",
        )
        model = AudioViT(cfg)
        ms = measure_infer(model, cfg, bi)
        line = f"{name:28s} infer {ms:7.1f} ms/b{bi} = {bi / ms * 1000:7.0f} clips/s"
        if btr:
            cfg_t = fac(
                target_length=tl, num_classes=nc, base_keep_rate=keep,
                drop_loc=(3, 6, 9), drop_path_rate=0.1,
                compute_dtype="bfloat16",
            )
            tms = measure_train(cfg_t, btr, nc, keep)
            line += f"   train {tms:6.1f} ms/b{btr}"
        print(line, flush=True)


if __name__ == "__main__":
    main()
