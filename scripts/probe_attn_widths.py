"""Probe 8: fused attention kernel cost vs sequence width + backward cost.

(a) w-sweep at b128 quantifying the "+1 token" tile tax (w256 vs w257
    vs padded widths) — the payoff ceiling for any CLS-last layout
    scheme (measured ~0.9 ms over the whole model => rejected, see
    docs/BENCH_NOTES.md).
(b) backward-kernel cost at the train batch (b64) per headline width.
    NOTE: jax.grad of sum(out) dead-code-eliminates the forward
    pallas_call (its primal output is unused), so these rows time the
    BACKWARD KERNEL ALONE — exactly what the roofline wants.
"""

import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp

import probe_attn_softmax as P
from tpat_tpu.ops.pallas_attention import fused_qkv_attention


def main():
    key = jax.random.PRNGKey(0)
    for w in (256, 257, 264, 288, 384):
        qkv = jax.jit(
            lambda k, w=w: jax.random.normal(k, (P.B, w, 3 * P.C), jnp.bfloat16)
        )(jax.random.fold_in(key, w))
        float(jnp.sum(qkv))
        P.bench(f"[w={w}] null", lambda q: q[:2, :2, 0], qkv, is_floor=True)
        P.bench(
            f"[w={w}] shipped (+scores)",
            lambda q: fused_qkv_attention(q, P.H, "patch_mean", 1), qkv,
        )

    b = 64
    for w in (257, 181, 127, 90):
        qkv = jax.jit(
            lambda k, w=w: jax.random.normal(k, (b, w, 3 * P.C), jnp.bfloat16)
        )(jax.random.fold_in(key, 1000 + w))
        float(jnp.sum(qkv))
        P.bench(f"[b64 w={w}] null", lambda q: q[:2, :2, 0], qkv, is_floor=True)

        def fwd_bwd(q):
            def loss(q):
                out, _ = fused_qkv_attention(q, P.H, "patch_mean", 1)
                return jnp.sum(out.astype(jnp.float32))

            return jax.grad(loss)(q)

        P.bench(f"[b64 w={w}] attn bwd kernel", fwd_bwd, qkv)


if __name__ == "__main__":
    main()
