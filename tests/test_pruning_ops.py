"""Unit tests for the pruning primitives: torch.topk ordering contract,
gather semantics with extra-token offset, masked-path equivalence, index
composition, and the keep-rate/LR schedules."""

import math

import numpy as np
import torch
import jax.numpy as jnp

from tpat_tpu.ops import pruning
from tpat_tpu.engine import schedules


def test_topk_matches_torch_ordering(rng):
    scores = rng.normal(size=(4, 37)).astype(np.float32)
    # inject ties to exercise tie-breaking toward lower index
    scores[0, 5] = scores[0, 11] = 0.5
    for k in (1, 3, 17, 37):
        got = np.asarray(pruning.topk_select(jnp.asarray(scores), k))
        want = torch.topk(
            torch.from_numpy(scores), k, dim=1, largest=True, sorted=True
        ).indices.numpy()
        np.testing.assert_array_equal(got, want)


def test_gather_tokens_extra_offset(rng):
    x = rng.normal(size=(2, 10, 8)).astype(np.float32)
    idx = np.array([[3, 0, 7], [1, 2, 5]], dtype=np.int32)
    for e in (1, 2):
        got = np.asarray(pruning.gather_tokens(jnp.asarray(x), jnp.asarray(idx), e))
        ref = np.concatenate(
            [x[:, :e], np.take_along_axis(x[:, e:], idx[..., None], axis=1)], axis=1
        )
        np.testing.assert_array_equal(got, ref)


def test_onehot_take_rows_bit_identical(rng):
    """The MXU one-hot gather (the TPU lowering of ``take_rows``) must be
    BIT-identical to take_along_axis — values and gradients, f32 and bf16
    (exactly one nonzero product per output element, so accumulation
    order cannot matter)."""
    import jax

    x = rng.normal(size=(3, 19, 16)).astype(np.float32)
    idx = rng.integers(0, 19, size=(3, 7)).astype(np.int32)
    for dt in (jnp.float32, jnp.bfloat16):
        xj = jnp.asarray(x, dt)
        want = jnp.take_along_axis(xj, jnp.asarray(idx)[..., None], axis=1)
        got = pruning.onehot_take_rows(xj, jnp.asarray(idx))
        np.testing.assert_array_equal(
            np.asarray(got, np.float32), np.asarray(want, np.float32)
        )

    # gradient: the one-hot backward (transposed matmul) == scatter-add,
    # incl. duplicate indices accumulating
    idx_dup = np.array([[0, 0, 5], [2, 2, 2], [1, 3, 1]], dtype=np.int32)
    xj = jnp.asarray(x)

    def loss_oh(x):
        return jnp.sum(pruning.onehot_take_rows(x, jnp.asarray(idx_dup)) ** 2)

    def loss_ta(x):
        return jnp.sum(
            jnp.take_along_axis(x, jnp.asarray(idx_dup)[..., None], axis=1) ** 2
        )

    np.testing.assert_array_equal(
        np.asarray(jax.grad(loss_oh)(xj)), np.asarray(jax.grad(loss_ta)(xj))
    )


def test_num_left_tokens_ceil():
    # ESC-50 shape walk (SURVEY.md §3.5): 256 -> 128 -> 64 -> 32 at keep 0.5
    assert pruning.num_left_tokens(0.5, 256) == 128
    assert pruning.num_left_tokens(0.5, 128) == 64
    assert pruning.num_left_tokens(0.5, 65) == math.ceil(0.5 * 65) == 33
    assert pruning.num_left_tokens(0.7, 512) == 359


def test_masked_refine_matches_physical_topk(rng):
    scores = rng.normal(size=(3, 20)).astype(np.float32)
    mask = np.ones((3, 20), dtype=bool)
    mask[:, 15:] = False  # 15 kept
    num_left = 6
    new_mask = np.asarray(
        pruning.masked_refine(
            jnp.asarray(scores), jnp.asarray(mask), jnp.asarray(num_left)
        )
    )
    for b in range(3):
        kept_idx = np.where(mask[b])[0]
        order = kept_idx[np.argsort(-scores[b, kept_idx], kind="stable")]
        want = set(order[:num_left].tolist())
        assert set(np.where(new_mask[b])[0].tolist()) == want


def test_masked_softmax_matches_dense_subset(rng):
    logits = rng.normal(size=(2, 3, 8, 8)).astype(np.float32)
    key_mask = np.ones((2, 1, 1, 8), dtype=bool)
    key_mask[..., 5:] = False
    got = np.asarray(
        pruning.masked_softmax(jnp.asarray(logits), jnp.asarray(key_mask))
    )
    sub = torch.from_numpy(logits[..., :5]).softmax(dim=-1).numpy()
    np.testing.assert_allclose(got[..., :5], sub, rtol=1e-5, atol=1e-6)
    np.testing.assert_array_equal(got[..., 5:], 0.0)


def test_compose_topk_indices(rng):
    # composing stage indices must address the original grid
    idx0 = jnp.asarray([[4, 2, 0, 3]])  # keep 4 of 6
    idx1 = jnp.asarray([[2, 0]])  # keep 2 of 4
    composed = np.asarray(pruning.compose_topk_indices([idx0, idx1]))
    np.testing.assert_array_equal(composed, [[0, 4]])


def test_keep_rate_schedule_golden():
    kw = dict(
        shrink_start_epoch=2,
        total_epochs=6,
        iters_per_epoch=10,
        base_keep_rate=0.5,
        drop_loc=(3, 6, 9),
        num_blocks=12,
    )
    # pre-shrink: all ones
    assert schedules.scheduled_keep_rates(5, 0, **kw) == (1.0,) * 12
    # start of shrink: cos(0) -> max_keep_rate
    rates = schedules.scheduled_keep_rates(20, 2, **kw)
    assert rates[3] == 1.0 and rates[0] == 1.0
    # midpoint: cos(pi/2) -> (base+max)/2
    rates = schedules.scheduled_keep_rates(40, 4, **kw)
    assert abs(rates[3] - 0.75) < 1e-9
    assert rates[2] == 1.0
    # post-shrink: None (use baked defaults)
    assert schedules.scheduled_keep_rates(60, 6, **kw) is None


def test_lr_schedule_golden():
    lr = schedules.warmup_cosine_lr(
        2.5, lr=1e-3, min_lr=1e-6, warmup_epochs=5, total_epochs=10
    )
    assert abs(float(lr) - 1e-3 * 2.5 / 5) < 1e-9
    lr = schedules.warmup_cosine_lr(
        7.5, lr=1e-3, min_lr=1e-6, warmup_epochs=5, total_epochs=10
    )
    want = 1e-6 + (1e-3 - 1e-6) * 0.5 * (1 + math.cos(math.pi * 0.5))
    assert abs(float(lr) - want) < 1e-8


def test_layer_decay_scales():
    depth = 12
    ld = 0.75
    assert schedules.layer_decay_scale(("cls_token",), depth, ld) == ld ** 13
    assert schedules.layer_decay_scale(("patch_embed", "proj"), depth, ld) == ld ** 13
    assert schedules.layer_decay_scale(("blocks_0", "norm1"), depth, ld) == ld ** 12
    assert schedules.layer_decay_scale(("blocks_11", "mlp"), depth, ld) == ld ** 1
    assert schedules.layer_decay_scale(("head",), depth, ld) == ld ** 0


def test_schedule_phase():
    kw = dict(shrink_start_epoch=20, shrink_epochs=40, base_keep_rate=0.5)
    assert schedules.schedule_phase(0, **kw) == "dense"
    assert schedules.schedule_phase(19, **kw) == "dense"
    assert schedules.schedule_phase(20, **kw) == "anneal"
    assert schedules.schedule_phase(59, **kw) == "anneal"
    assert schedules.schedule_phase(60, **kw) == "static"
    assert (
        schedules.schedule_phase(99, shrink_start_epoch=20, shrink_epochs=40,
                                 base_keep_rate=1.0)
        == "dense"
    )


def test_masked_kept_counts_match_static_double_math():
    """The host-composed masked-path counts equal the static path's
    math.ceil chain for every block — including integer-boundary products
    where the in-graph float32 ceil disagrees with double (keep 0.07 *
    100 is 7.000000000000001 in double -> 8, but rounds to 7.0 in f32)."""
    import math

    import jax.numpy as jnp

    from tpat_tpu.engine.schedules import masked_kept_counts
    from tpat_tpu.ops.pruning import masked_num_left

    # adversarial: f32 and double ceil disagree here
    assert math.ceil(0.07 * 100) == 8
    assert int(masked_num_left(jnp.float32(0.07), jnp.int32(100))) == 7
    assert masked_kept_counts((1.0, 0.07), (1,), 100) == (100, 8)

    # equivalence with ViTConfig.tokens_per_block on a realistic chain
    from tpat_tpu.config import ViTConfig

    cfg = ViTConfig(
        compute_dtype="float32",
        embed_dim=64, num_heads=2, depth=12, target_length=512,
        num_mel_bins=128, drop_loc=(3, 6, 9), base_keep_rate=0.5,
    )
    rates = tuple(
        0.5 if i in cfg.drop_loc else 1.0 for i in range(cfg.depth)
    )
    counts = masked_kept_counts(rates, cfg.drop_loc, cfg.num_patches)
    static = [out for (_in, out) in cfg.tokens_per_block(rates)]
    assert list(counts) == static
