"""Probe 3: where do the 38.6 ms of the headline eval forward go?

Floor-calibrated, hoist-proof per-op costs (see probe_gather_variants.py
for the harness story) at the ViT-B keep-0.7 ESC-50 geometry, batch 128,
bf16.  Measures, per surviving width (257 x4 blocks, 181 x3, 127 x3,
90 x2): the fused attention kernel (scores on at pruning blocks), the
block's four matmuls, and the GELU epilogue; plus patch embed and the
one-hot gathers already measured elsewhere.  The sum is compared to the
measured full forward to validate the attribution.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from tpat_tpu.ops.pallas_attention import fused_qkv_attention
from _bench import Bench

B, C, H = 128, 768, 12
# (width, n_blocks, n_score_blocks) — blocks 3/6/9 need scores
WIDTHS = [(257, 4, 1), (181, 3, 1), (127, 3, 1), (90, 2, 0)]

bench = Bench(iters=100, name_width=36)


def main():
    key = jax.random.PRNGKey(0)
    total_attn = total_mm = total_gelu = 0.0
    for w, nblk, nscore in WIDTHS:
        gen = jax.jit(
            lambda k, w=w: (
                jax.random.normal(jax.random.fold_in(k, 0), (B, w, 3 * C), jnp.bfloat16),
                jax.random.normal(jax.random.fold_in(k, 1), (B * w, C), jnp.bfloat16),
                jax.random.normal(jax.random.fold_in(k, 2), (C, 4 * C), jnp.bfloat16) * 0.02,
                jax.random.normal(jax.random.fold_in(k, 3), (C, 3 * C), jnp.bfloat16) * 0.02,
                jax.random.normal(jax.random.fold_in(k, 4), (4 * C, C), jnp.bfloat16) * 0.02,
                jax.random.normal(jax.random.fold_in(k, 5), (C, C), jnp.bfloat16) * 0.02,
            )
        )
        qkv, x2, w4, w3, w4T, w1 = gen(jax.random.fold_in(key, w))
        float(jnp.sum(qkv))

        # floors are calibrated PER perturbed-input tensor: the carry
        # perturbation cost scales with the tensor that receives it, so
        # subtracting a (B, w, 3C) floor from a (B*w, C)-input row would
        # systematically skew the attribution
        bench(f"[w={w}] null qkv", lambda q: q[:2, :2, 0], qkv, is_floor=True)
        a_plain = bench(
            f"[w={w}] fused attn (no scores)",
            lambda q: fused_qkv_attention(q, H, None, 1), qkv,
        )
        a_scores = (
            bench(
                f"[w={w}] fused attn (+scores)",
                lambda q: fused_qkv_attention(q, H, "patch_mean", 1), qkv,
            )
            if nscore
            else 0.0
        )
        # the block's matmul chain: qkv (C->3C), proj (C->C), fc1 (C->4C),
        # fc2 (4C->C) — timed as the two big GEMM shapes it decomposes to
        bench(f"[w={w}] null x2", lambda a: a[:2, :2], x2, is_floor=True)
        mm3 = bench(f"[w={w}] x@W 768->2304", lambda a, b: jnp.dot(a, b), x2, w3)
        mm4 = bench(f"[w={w}] x@W 768->3072", lambda a, b: jnp.dot(a, b), x2, w4)
        mm1 = bench(f"[w={w}] x@W 768->768", lambda a, b: jnp.dot(a, b), x2, w1)
        gelu_mm = bench(
            f"[w={w}] gelu(x@W 768->3072)",
            lambda a, b: jax.nn.gelu(jnp.dot(a, b), approximate=False), x2, w4,
        )
        # fc2 input is (M, 4C): reuse mm4's transpose shape via x4
        x4 = jax.jit(
            lambda k, w=w: jax.random.normal(k, (B * w, 4 * C), jnp.bfloat16)
        )(jax.random.fold_in(key, 100 + w))
        float(jnp.sum(x4))
        bench(f"[w={w}] null x4", lambda a: a[:2, :2], x4, is_floor=True)
        mm2 = bench(f"[w={w}] x@W 3072->768", lambda a, b: jnp.dot(a, b), x4, w4T)

        blk_attn = a_plain * (nblk - nscore) + a_scores * nscore
        blk_mm = (mm3 + mm1 + mm4 + mm2) * nblk
        blk_gelu = (gelu_mm - mm4) * nblk
        total_attn += blk_attn
        total_mm += blk_mm
        total_gelu += blk_gelu
        print(f"  -> width {w}: attn {blk_attn:.3f}  matmuls {blk_mm:.3f}  "
              f"gelu-epilogue {blk_gelu:.3f}")

    print(f"\n{'attention kernels total':36s} {total_attn:7.3f} ms")
    print(f"{'matmuls total':36s} {total_mm:7.3f} ms")
    print(f"{'gelu epilogue total':36s} {total_gelu:7.3f} ms")
    print(f"{'sum (excl. LN/gathers/embed/head)':36s} "
          f"{total_attn + total_mm + total_gelu:7.3f} ms")


if __name__ == "__main__":
    main()
