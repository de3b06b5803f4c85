"""Probe 9: CLS-split rank-1 correction vs the full-width kernel.

Round-3 rejected a CLS-LAST token layout for the w257 tile tax (0.23
ms/block x 4 blocks, BENCH_NOTES "+1 token tile tax") because offset
slicing isn't tileable and the layout breaks the reference's positional
contracts.  The round-4 CLS-split keeps the layout: the kernel computes
the first n-1 keys as a lane-aligned 128-multiple block and folds the
last key in as an exact rank-1 softmax correction (VERDICT r3 next #2).

RESULT (target chip, 2026-08-19): SLOWER — fwd+scores w257 ~1.79 ms vs
~1.38 full, w129 ~0.90 vs ~0.52 (stable across three runs).  The
overhead is width-independent (~+0.4 ms): every (n, 1) column
intermediate pads to a full 128-lane register, so the ~10 rank-1 ops
cost about the block's whole elementwise budget.  Shipped as opt-in
TPAT_CLS_SPLIT=1; see BENCH_NOTES "CLS-split rank-1 correction".  The
BACKWARD never splits (Mosaic "Invalid input layout" on the tail-row
stores; a full-width backward composes exactly with a split forward),
so the bwd rows of the two arms measure the same kernel.

Each arm runs in a FRESH subprocess (env TPAT_CLS_SPLIT) — flipping the
module flag in-process corrupts JAX's cached custom_partitioning
lowerings once a config has been traced under the other setting
(observed: KeyError in mlir lowering cache on the b64 backward arm).

Rows: forward (+scores) at the headline eval batch (b128) for w257 and
w129 (the keep-0.5 walk width), and the backward kernel at the train
batch (b64) for w257.
"""

import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

B, C, H = 128, 768, 12


def run_arm():
    import jax
    import jax.numpy as jnp

    from _bench import Bench
    from tpat_tpu.ops import pallas_attention as pa

    tag = "split" if pa._SPLIT_ENABLED else "full "
    bench = Bench(iters=200, name_width=36)
    key = jax.random.PRNGKey(0)
    for w in (257, 129):
        qkv = jax.jit(
            lambda k, w=w: jax.random.normal(k, (B, w, 3 * C), jnp.bfloat16)
        )(jax.random.fold_in(key, w))
        float(jnp.sum(qkv.astype(jnp.float32)))
        bench(f"[b128 w={w}] null", lambda q: q[:2, :2, 0], qkv,
              is_floor=True)
        bench(
            f"[b128 w={w}] fwd+scores {tag}",
            lambda q: pa.fused_qkv_attention(q, H, "patch_mean", 1),
            qkv,
        )

    b = 64
    for w in (257,):
        qkv = jax.jit(
            lambda k, w=w: jax.random.normal(k, (b, w, 3 * C), jnp.bfloat16)
        )(jax.random.fold_in(key, 1000 + w))
        float(jnp.sum(qkv.astype(jnp.float32)))
        bench(f"[b64 w={w}] null", lambda q: q[:2, :2, 0], qkv,
              is_floor=True)

        def fwd_bwd(q):
            def loss(q):
                out, _ = pa.fused_qkv_attention(q, H, "patch_mean", 1)
                return jnp.sum(out.astype(jnp.float32))

            return jax.grad(loss)(q)

        # NOTE: grad-of-sum DCEs the forward kernel — this row is the
        # backward kernel alone (see probe_attn_widths.py)
        bench(f"[b64 w={w}] bwd kernel {tag}", fwd_bwd, qkv)


def main():
    for split in ("0", "1"):
        env = dict(os.environ, TPAT_CLS_SPLIT=split)
        print(f"--- arm TPAT_CLS_SPLIT={split} ---", flush=True)
        subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--arm"],
            env=env, check=True,
        )


if __name__ == "__main__":
    if "--arm" in sys.argv:
        run_arm()
    else:
        main()
