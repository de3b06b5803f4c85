"""Profile the training step per-op on the real TPU (jax.profiler trace),
then summarize op-category durations from the trace protobuf.

Usage: python scripts/profile_step.py [esc50|audioset] [train|infer]
"""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

from tpat_tpu.config import TrainConfig, audiomae_vit_base
from tpat_tpu.engine.train import TrainModule
from tpat_tpu.models.vit import AudioViT

GEOS = {"esc50": (512, 64, 50), "audioset": (1024, 32, 527)}


def main():
    geo = sys.argv[1] if len(sys.argv) > 1 else "esc50"
    mode = sys.argv[2] if len(sys.argv) > 2 else "train"
    tl, batch, nc = GEOS[geo]
    cfg = audiomae_vit_base(
        target_length=tl, num_classes=nc, base_keep_rate=0.7,
        drop_loc=(3, 6, 9), drop_path_rate=0.1, compute_dtype="bfloat16",
    )
    tc = TrainConfig(
        batch_size=batch, epochs=10, warmup_epochs=0, shrink_start_epoch=0,
        shrink_epochs=0, base_keep_rate=0.7, drop_loc=(3, 6, 9),
    )
    mod = TrainModule(
        model=AudioViT(cfg), model_cfg=cfg, train_cfg=tc,
        loss_type="bce" if geo == "audioset" else "ce",
        iters_per_epoch=10,
    )
    gen = jax.jit(lambda k: jax.random.normal(k, (batch, 1, tl, 128), jnp.float32))
    x = gen(jax.random.PRNGKey(0))
    y = jnp.eye(nc, dtype=jnp.float32)[
        jnp.asarray(np.random.default_rng(0).integers(0, nc, batch))
    ]
    float(jnp.sum(x))
    state = mod.init(x)

    if mode == "train":
        step = mod.compiled_step("static")
        acc = mod._zero_acc()
        state, acc = step(state, acc, x, y)
        float(acc["loss_sum"])  # compile+run

        t0 = time.time()
        for _ in range(20):
            state, acc = step(state, acc, x, y)
        float(acc["loss_sum"])
        print(f"{geo} train: {(time.time()-t0)/20*1000:.1f} ms/step")

        trace_dir = f"/tmp/trace_{geo}_{mode}"
        with jax.profiler.trace(trace_dir):
            for _ in range(5):
                state, acc = step(state, acc, x, y)
            float(acc["loss_sum"])
    else:
        model = mod.model
        fwd = jax.jit(
            lambda p, x: jnp.sum(model.apply({"params": p}, x).astype(jnp.float32))
        )
        float(fwd(state.params, x))
        t0 = time.time()
        for _ in range(20):
            v = fwd(state.params, x)
        float(v)
        print(f"{geo} infer: {(time.time()-t0)/20*1000:.1f} ms/batch")
        trace_dir = f"/tmp/trace_{geo}_{mode}"
        with jax.profiler.trace(trace_dir):
            for _ in range(5):
                v = fwd(state.params, x)
            float(v)

    summarize(trace_dir)


def summarize(trace_dir):
    from _bench import device_op_durations  # the one shared trace parser

    parsed = device_op_durations(trace_dir)
    if parsed is None:
        print("no trace files under", trace_dir)
        return
    by_name, total = parsed
    top = sorted(by_name.items(), key=lambda kv: -kv[1])[:30]
    print(f"device op groups (us, total {total:.0f}):")
    for name, dur in top:
        print(f"  {name:<40} {dur:12.0f}")


if __name__ == "__main__":
    main()
