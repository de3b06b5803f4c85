"""MAE pretrain-step bench on the real TPU: swin vs plain decoder, with
optional per-op-category profiler attribution.

Reproduces the cli/pretrain.py train step (donated AdamW step, bf16,
mask_ratio 0.8) at ESC-50 geometry (512x128 -> grid (32,8), 256 patches)
batch 32.

Usage: python scripts/bench_mae_step.py [swin|plain|both] [--profile]
           [--tl N] [--batch N]

--tl 1024 selects the AudioSet geometry (grid (64,8), 512 decoder
tokens); default 512 is ESC-50.
"""

import os
import sys
import time
from collections import defaultdict

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

from tpat_tpu.models.mae import MAEConfig, MaskedAutoencoderViT, mae_vit_base_dec512d8b

BATCH = 32
TL = 512
MASK_RATIO = 0.8
ITERS = 20

if "--tl" in sys.argv:
    TL = int(sys.argv[sys.argv.index("--tl") + 1])
if "--batch" in sys.argv:
    BATCH = int(sys.argv[sys.argv.index("--batch") + 1])


def build(decoder_mode: int, window_impl: str = "auto"):
    cfg = mae_vit_base_dec512d8b(
        target_length=TL, num_mel_bins=128, decoder_mode=decoder_mode,
        compute_dtype="bfloat16", window_attention_impl=window_impl,
    )
    model = MaskedAutoencoderViT(cfg)
    x0 = jnp.zeros((1, 1, TL, 128))
    params = model.init(
        {"params": jax.random.PRNGKey(0), "masking": jax.random.PRNGKey(1)},
        x0, MASK_RATIO,
    )["params"]

    # the exact optimizer + step construction cli/pretrain.py runs
    from tpat_tpu.engine import pretrain as pretrain_lib

    tx = pretrain_lib.make_mae_optimizer(
        params, lr_fn=lambda s: 1e-4, weight_decay=1e-4,
        pos_trainable=cfg.pos_trainable,
    )
    opt_state = tx.init(params)
    train_step = pretrain_lib.make_mae_train_step(model, tx, MASK_RATIO)
    return params, opt_state, train_step


def measure(
    decoder_mode: int, profile: bool = False, window_impl: str = "auto"
) -> float:
    params, opt_state, train_step = build(decoder_mode, window_impl)
    gen = jax.jit(
        lambda k: jax.random.normal(k, (BATCH, 1, TL, 128), jnp.float32)
    )
    x = gen(jax.random.PRNGKey(2))
    float(jnp.sum(x))
    rng = jax.random.PRNGKey(0)
    loss_sum = jnp.zeros(())
    params, opt_state, loss_sum = train_step(
        params, opt_state, loss_sum, rng, jnp.asarray(0), x
    )
    float(loss_sum)  # compile + execute
    best = float("inf")
    step = 1
    for rep in range(3):
        t0 = time.perf_counter()
        for _ in range(ITERS):
            params, opt_state, loss_sum = train_step(
                params, opt_state, loss_sum, rng, jnp.asarray(step), x
            )
            step += 1
        float(loss_sum)
        best = min(best, (time.perf_counter() - t0) / ITERS * 1000)
    if profile:
        trace_dir = f"/tmp/mae_trace_mode{decoder_mode}"
        os.system(f"rm -rf {trace_dir}")
        with jax.profiler.trace(trace_dir):
            for _ in range(5):
                params, opt_state, loss_sum = train_step(
                    params, opt_state, loss_sum, rng, jnp.asarray(step), x
                )
                step += 1
            float(loss_sum)
        summarize_trace(trace_dir)
    return best


def summarize_trace(trace_dir: str):
    from _bench import device_op_durations  # the one shared trace parser

    parsed = device_op_durations(trace_dir)
    if parsed is None:
        print("no trace found", file=sys.stderr)
        return
    by_name, _ = parsed
    cats = defaultdict(float)
    for name, dur_us in by_name.items():
        cats[name.split("(")[0][:50]] += dur_us / 1e3  # ms
    total = sum(cats.values())
    print(f"-- device op time over 5 steps ({total:.1f} ms total):")
    for k, v in sorted(cats.items(), key=lambda kv: -kv[1])[:25]:
        print(f"  {v / 5:7.2f} ms/step  {k}")


def main():
    # positional mode = first arg that is neither a flag nor a flag value
    flag_values = set()
    for f in ("--tl", "--batch"):
        if f in sys.argv:
            flag_values.add(sys.argv.index(f) + 1)
    positional = [
        a for i, a in enumerate(sys.argv[1:], start=1)
        if not a.startswith("--") and i not in flag_values
    ]
    which = positional[0] if positional else "both"
    profile = "--profile" in sys.argv
    variants = {
        "swin": [(1, "auto")],
        "swin_xla": [(1, "xla")],
        "swin_fused": [(1, "fused")],
        "swin_banded": [(1, "banded")],
        "plain": [(0, "auto")],
        "both": [(1, "auto"), (0, "auto")],
        "all": [(1, "auto"), (1, "xla"), (0, "auto")],
    }[which]
    for m, impl in variants:
        ms = measure(m, profile=profile and m == 1, window_impl=impl)
        name = (
            f"swin_v2_cr[{impl}]" if m == 1 else "plain"
        )
        print(
            f"MAE pretrain step b{BATCH} {TL}x128 bf16 decoder={name}: "
            f"{ms:.1f} ms/step ({BATCH / ms * 1000:.0f} clips/s)"
        )


if __name__ == "__main__":
    main()
