"""Probe 6: where does the fused attention kernel's non-matmul time go?

Ablation variants of the forward kernel at the headline widths (ViT-B
b128 bf16), hoist-proof harness (see probe_gather_variants.py):

  full        — the shipped kernel math (exp softmax, scores on)
  noscore     — mode=None (skips the column-sum reduction)
  exp2        — fold log2(e) into the qk scale, use exp2 instead of exp
  noexp       — p = logits - m (no transcendental; WRONG math, cost bound)
  nomax       — skip the row-max pass (UNSAFE math, bounds the max cost)
  mmonly      — q@k^T and p0@v only, softmax entirely removed (matmul floor)

If `exp2` wins it ships (exact same softmax values modulo rounding); the
WRONG-math variants only bound how much there is to win.
"""

import functools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from _bench import Bench
from tpat_tpu.ops.pallas_attention import (
    LANES,
    _batch_group,
    fused_qkv_attention,
)

B, C, H = 128, 768, 12
D = C // H
LOG2E = 1.4426950408889634

bench = Bench(iters=200, name_width=36)


def _variant_kernel(
    q_ref, k_ref, v_ref, o_ref, colsum_ref,
    *, scale, head_dim, heads_per_block, group, variant,
):
    for b in range(group):
        for hh in range(heads_per_block):
            sl = slice(hh * head_dim, (hh + 1) * head_dim)
            q = q_ref[b, :, sl]
            k = k_ref[b, :, sl]
            v = v_ref[b, :, sl]
            eff_scale = scale * LOG2E if variant == "exp2" else scale
            logits = (
                jax.lax.dot_general(
                    q, k,
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                * eff_scale
            )
            if variant == "mmonly":
                p = logits
            elif variant == "nomax":
                p = jnp.exp(logits)
                p = p * (1.0 / jnp.sum(p, axis=-1, keepdims=True))
            else:
                m = jnp.max(logits, axis=-1, keepdims=True)
                if variant == "exp2":
                    p = jnp.exp2(logits - m)
                elif variant == "noexp":
                    p = logits - m
                else:
                    p = jnp.exp(logits - m)
                if variant != "noexp":
                    p = p * (1.0 / jnp.sum(p, axis=-1, keepdims=True))
            o_ref[b, :, sl] = jnp.dot(
                p.astype(v.dtype), v, preferred_element_type=jnp.float32
            ).astype(o_ref.dtype)
            if variant == "full":
                colsum_ref[b, hh] = jnp.sum(
                    p, axis=0, keepdims=True
                ) - jnp.sum(p[:1], axis=0, keepdims=True)
            else:
                colsum_ref[b, hh] = jnp.zeros((1, q_ref.shape[1]), jnp.float32)


def variant_attention(qkv, variant):
    b, n, c3 = qkv.shape
    c = c3 // 3
    hpb = LANES // D
    hb = c // LANES
    g = _batch_group(b, n, qkv.dtype.itemsize, n_io_blocks=4)
    kernel = functools.partial(
        _variant_kernel,
        scale=D ** -0.5,
        head_dim=D,
        heads_per_block=hpb,
        group=g,
        variant=variant,
    )

    def spec(section):
        return pl.BlockSpec(
            (g, n, LANES),
            lambda i, j, s=section: (i, 0, s * hb + j),
            memory_space=pltpu.VMEM,
        )

    out, colsum = pl.pallas_call(
        kernel,
        grid=(b // g, hb),
        in_specs=[spec(0), spec(1), spec(2)],
        out_specs=[
            pl.BlockSpec((g, n, LANES), lambda i, j: (i, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((g, hpb, 1, n), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, n, c), qkv.dtype),
            jax.ShapeDtypeStruct((b, H, 1, n), jnp.float32),
        ],
    )(qkv, qkv, qkv)
    return out, colsum


def main():
    key = jax.random.PRNGKey(0)
    for w in (257, 181):
        qkv = jax.jit(
            lambda k, w=w: jax.random.normal(k, (B, w, 3 * C), jnp.bfloat16)
        )(jax.random.fold_in(key, w))
        float(jnp.sum(qkv))
        bench(f"[w={w}] null", lambda q: q[:2, :2, 0], qkv, is_floor=True)
        bench(
            f"[w={w}] shipped kernel (+scores)",
            lambda q: fused_qkv_attention(q, H, "patch_mean", 1), qkv,
        )
        for variant in ("full", "noscore", "exp2", "noexp", "nomax", "mmonly"):
            bench(
                f"[w={w}] variant {variant}",
                functools.partial(variant_attention, variant=variant), qkv,
            )


if __name__ == "__main__":
    main()
