"""GSPMD partitioning of the Pallas kernels (ops/partitioning.py).

Mosaic kernels cannot be auto-partitioned: under a multi-device mesh a
plain jit raises at lowering ("please wrap the call in a shard_map",
jax/_src/tpu_custom_call.py) — reproduced against an AOT v5e:2x4
topology before the custom_partitioning wrappers existed.  These tests
run the wrapped kernels on the 8-virtual-CPU mesh (interpret-mode
kernels, REAL partition callbacks): batch-sharded execution must agree
with single-device execution for forward and gradients, including the
psum'd cross-shard sums (the window kernels' d(scale)/d(template)).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from tpat_tpu.config import audiomae_vit_base
from tpat_tpu.models.mae import SwinBlock
from tpat_tpu.models.vit import AudioViT


def _mesh():
    return Mesh(np.array(jax.devices()[:8]), ("data",))


def _shard(mesh, x):
    return jax.device_put(x, NamedSharding(mesh, P("data")))


def _rep(mesh, tree):
    return jax.device_put(tree, NamedSharding(mesh, P()))


@pytest.fixture(scope="module")
def vit_setup():
    cfg = audiomae_vit_base(
        compute_dtype="float32",
        target_length=64, num_classes=4, base_keep_rate=0.7, drop_loc=(1,),
        drop_path_rate=0.0,
    )
    import dataclasses

    # fused-kernel-supported tiny geometry: C=128 (4 heads x 32)
    cfg = dataclasses.replace(
        cfg, embed_dim=128, depth=3, num_heads=4, num_mel_bins=32,
        attention_impl="fused",
    )
    model = AudioViT(cfg)
    x = np.random.default_rng(0).normal(size=(16, 1, 64, 32)).astype(
        np.float32
    )
    params = model.init(
        {"params": jax.random.PRNGKey(0)}, jnp.asarray(x[:1])
    )["params"]
    return model, params, x


def test_fused_vit_grad_matches_on_mesh(vit_setup):
    """Pruned ViT forward + backward (fused attention kernel incl. the
    score emission) sharded over 8 devices == single device."""
    model, params, x = vit_setup

    def loss(p, x):
        return jnp.mean(model.apply({"params": p}, x).astype(jnp.float32) ** 2)

    l_ref, g_ref = jax.value_and_grad(loss)(params, jnp.asarray(x))

    mesh = _mesh()
    l_m, g_m = jax.jit(jax.value_and_grad(loss))(
        _rep(mesh, params), _shard(mesh, x)
    )
    np.testing.assert_allclose(float(l_m), float(l_ref), rtol=1e-5)
    for (k, a), (_, b) in zip(
        jax.tree_util.tree_leaves_with_path(g_ref),
        jax.tree_util.tree_leaves_with_path(g_m),
    ):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=1e-4, atol=1e-5,
            err_msg=f"grad mismatch at {jax.tree_util.keystr(k)}",
        )


def test_fused_prefix_path_matches_on_mesh(vit_setup, monkeypatch):
    """The hybrid-anneal prefix kernel (traced kv_valid scalar,
    ``fused_qkv_attention_prefix``) under the mesh: forward_hybrid at a
    bucket width strictly wider than the exact kept count, so the
    post-drop blocks dispatch the prefix kernel's custom_partitioning
    rules — the multi-chip hybrid-anneal training default.  A trace-time
    counter asserts the prefix kernel actually ran (guarding against the
    dispatch silently falling back to the masked XLA path)."""
    from tpat_tpu.engine.schedules import bucket_keep_rates, masked_kept_counts
    from tpat_tpu.ops import pallas_attention as pa

    model, params, x = vit_setup
    cfg = model.cfg

    # exact ceil(0.75*8)=6 < bucket width ceil(0.85*8)=7 -> real prefix
    rates = tuple(0.75 if i in cfg.drop_loc else 1.0 for i in range(cfg.depth))
    bucket = bucket_keep_rates(
        rates, base_keep_rate=cfg.base_keep_rate, n_buckets=2
    )
    nl = jnp.asarray(
        masked_kept_counts(rates, cfg.drop_loc, cfg.num_patches), jnp.int32
    )
    kr = jnp.asarray(rates, jnp.float32)

    calls = {"prefix": 0}
    real_prefix = pa.fused_qkv_attention_prefix

    def counting_prefix(*a, **kw):
        calls["prefix"] += 1
        return real_prefix(*a, **kw)

    monkeypatch.setattr(pa, "fused_qkv_attention_prefix", counting_prefix)

    def loss(p, x):
        out = model.apply(
            {"params": p}, x, kr, num_left_array=nl, bucket_rates=bucket,
            method=AudioViT.forward_hybrid,
        )
        return jnp.mean(out.astype(jnp.float32) ** 2)

    l_ref, g_ref = jax.value_and_grad(loss)(params, jnp.asarray(x))
    assert calls["prefix"] > 0, (
        "forward_hybrid never dispatched the fused prefix kernel — the "
        "test geometry no longer exercises the prefix partitioning rules"
    )
    mesh = _mesh()
    l_m, g_m = jax.jit(jax.value_and_grad(loss))(
        _rep(mesh, params), _shard(mesh, x)
    )
    np.testing.assert_allclose(float(l_m), float(l_ref), rtol=1e-5)
    for (k, a), (_, b) in zip(
        jax.tree_util.tree_leaves_with_path(g_ref),
        jax.tree_util.tree_leaves_with_path(g_m),
    ):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=1e-4, atol=1e-5,
            err_msg=f"grad mismatch at {jax.tree_util.keystr(k)}",
        )


@pytest.mark.parametrize("impl", ["fused", "banded"])
def test_window_kernels_match_on_mesh(impl):
    """Swin window attention (dense-masked and banded): the backward's
    d(scale)/d(template) are batch sums — the partition psums them
    across shards; gradients must match single-device exactly enough."""
    kw = dict(
        dim=128, num_heads=4, feat_size=(16, 8), window=(4, 4),
        shift=(2, 0), mlp_ratio=1.0,
    )
    blk = SwinBlock(attn_impl=impl, **kw)
    x = np.random.default_rng(1).normal(size=(16, 128, 128)).astype(
        np.float32
    )
    params = blk.init({"params": jax.random.PRNGKey(0)}, jnp.asarray(x))[
        "params"
    ]
    params["attn"]["logit_scale"] = jnp.asarray(
        np.random.default_rng(2).normal(size=(4,)).astype(np.float32)
    )

    def loss(p, x):
        return jnp.mean(blk.apply({"params": p}, x) ** 2)

    l_ref, g_ref = jax.value_and_grad(loss)(params, jnp.asarray(x))
    mesh = _mesh()
    l_m, g_m = jax.jit(jax.value_and_grad(loss))(
        _rep(mesh, params), _shard(mesh, x)
    )
    np.testing.assert_allclose(float(l_m), float(l_ref), rtol=1e-5)
    for (k, a), (_, b) in zip(
        jax.tree_util.tree_leaves_with_path(g_ref),
        jax.tree_util.tree_leaves_with_path(g_m),
    ):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=1e-4, atol=1e-4,
            err_msg=f"grad mismatch at {jax.tree_util.keystr(k)}",
        )
