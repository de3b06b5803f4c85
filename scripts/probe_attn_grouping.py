"""Probe 7: fused attention kernel grid geometry — batch-group cap and
lane-block width.

The shipped kernel groups g=min(8, fit) samples per program and slices
128-lane head-pair blocks (grid = (B/g, 6) at ViT-B).  VMEM budget says
g=16 also fits at the headline widths; fewer/larger programs may cut
pipeline overhead (probe 6 put the matmul+DMA floor at 0.994 ms of the
1.42 ms w257 kernel).  Also tries a 256-lane block (4 heads per program
column, grid j halved).
"""

import functools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpat_tpu.ops.pallas_attention import fused_qkv_attention
from _bench import Bench

B, C, H = 128, 768, 12
D = C // H

bench = Bench(iters=200, name_width=40)


def _kernel(q_ref, k_ref, v_ref, o_ref, *, scale, head_dim, group, lanes):
    hpb = lanes // head_dim
    for b in range(group):
        for hh in range(hpb):
            sl = slice(hh * head_dim, (hh + 1) * head_dim)
            q = q_ref[b, :, sl]
            k = k_ref[b, :, sl]
            v = v_ref[b, :, sl]
            logits = (
                jax.lax.dot_general(
                    q, k,
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                * scale
            )
            m = jnp.max(logits, axis=-1, keepdims=True)
            p = jnp.exp(logits - m)
            p = p * (1.0 / jnp.sum(p, axis=-1, keepdims=True))
            o_ref[b, :, sl] = jnp.dot(
                p.astype(v.dtype), v, preferred_element_type=jnp.float32
            ).astype(o_ref.dtype)


def grouped_attention(qkv, g, lanes):
    b, n, c3 = qkv.shape
    c = c3 // 3
    hb = c // lanes
    kernel = functools.partial(
        _kernel, scale=D ** -0.5, head_dim=D, group=g, lanes=lanes
    )

    def spec(section):
        return pl.BlockSpec(
            (g, n, lanes),
            lambda i, j, s=section: (i, 0, s * hb + j),
            memory_space=pltpu.VMEM,
        )

    return pl.pallas_call(
        kernel,
        grid=(b // g, hb),
        in_specs=[spec(0), spec(1), spec(2)],
        out_specs=pl.BlockSpec(
            (g, n, lanes), lambda i, j: (i, 0, j), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b, n, c), qkv.dtype),
    )(qkv, qkv, qkv)


def main():
    key = jax.random.PRNGKey(0)
    for w in (257, 181):
        qkv = jax.jit(
            lambda k, w=w: jax.random.normal(k, (B, w, 3 * C), jnp.bfloat16)
        )(jax.random.fold_in(key, w))
        float(jnp.sum(qkv))
        bench(f"[w={w}] null", lambda q: q[:2, :2, 0], qkv, is_floor=True)
        bench(
            f"[w={w}] shipped (+scores, g<=8, 128L)",
            lambda q: fused_qkv_attention(q, H, "patch_mean", 1), qkv,
        )
        for g in (4, 8, 16, 32):
            # VMEM: io 4 blocks double-buffered g*n*128*2*2 + 2*n*n*4 scratch
            io = 4 * g * w * 128 * 2 * 2
            if io > 12 * 1024 * 1024 - 2 * w * w * 4:
                print(f"[w={w}] g={g:2d} 128L: skipped (VMEM)")
                continue
            bench(
                f"[w={w}] noscore g={g:2d}, 128 lanes",
                functools.partial(grouped_attention, g=g, lanes=128), qkv,
            )
        for g in (2, 4, 8):
            io = 4 * g * w * 256 * 2 * 2
            if io > 12 * 1024 * 1024 - 2 * w * w * 4:
                print(f"[w={w}] g={g:2d} 256L: skipped (VMEM)")
                continue
            bench(
                f"[w={w}] noscore g={g:2d}, 256 lanes",
                functools.partial(grouped_attention, g=g, lanes=256), qkv,
            )


if __name__ == "__main__":
    main()
