"""MAE pretraining model tests: patchify round-trip, masking semantics
(counts, restore composition, 2D union mask), forward/loss, and a short
overfit run."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tpat_tpu.models.mae import MAEConfig, MaskedAutoencoderViT


def tiny_mae(decoder_mode):
    return MAEConfig(
        embed_dim=64,
        depth=2,
        num_heads=2,
        decoder_embed_dim=32,
        decoder_depth=2,
        decoder_num_heads=2,
        decoder_mode=decoder_mode,
        window_size=(2, 2),
        target_length=64,
        num_mel_bins=32,
    )


def test_patchify_roundtrip(rng):
    cfg = tiny_mae(0)
    model = MaskedAutoencoderViT(cfg)
    imgs = jnp.asarray(rng.normal(size=(2, 1, 64, 32)).astype(np.float32))
    x = model.patchify(imgs)
    assert x.shape == (2, cfg.num_patches, 256)
    back = model.unpatchify(x)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(imgs))


def test_random_masking_semantics(rng):
    cfg = tiny_mae(0)
    model = MaskedAutoencoderViT(cfg)
    x = jnp.asarray(rng.normal(size=(2, 8, 4)).astype(np.float32))
    xm, mask, ids_restore = model.random_masking(x, 0.75, jax.random.PRNGKey(0))
    assert xm.shape == (2, 2, 4)  # int(8 * 0.25)
    assert mask.shape == (2, 8)
    np.testing.assert_array_equal(np.asarray(mask).sum(axis=1), [6, 6])
    # restore composition: visible tokens land where mask == 0
    m = np.asarray(mask)
    for b in range(2):
        vis_positions = np.where(m[b] == 0)[0]
        assert len(vis_positions) == 2


def test_random_masking_2d_union(rng):
    cfg = tiny_mae(0)  # grid (4, 2)
    model = MaskedAutoencoderViT(cfg)
    x = jnp.asarray(rng.normal(size=(3, 8, 4)).astype(np.float32))
    xm, mask, ids_restore = model.random_masking_2d(
        x, 0.5, 0.5, jax.random.PRNGKey(1)
    )
    # keep 2 of 4 time rows and 1 of 2 freq cols -> 2 tokens kept
    assert xm.shape == (3, 2, 4)
    np.testing.assert_array_equal(np.asarray(mask).sum(axis=1), [6, 6, 6])


@pytest.mark.parametrize("decoder_mode", [0, 1])
def test_mae_forward_and_loss(rng, decoder_mode):
    cfg = tiny_mae(decoder_mode)
    model = MaskedAutoencoderViT(cfg)
    imgs = jnp.asarray(rng.normal(size=(2, 1, 64, 32)).astype(np.float32))
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "masking": jax.random.PRNGKey(1)},
        imgs,
        0.75,
    )
    loss, pred, mask = model.apply(
        variables, imgs, 0.75, rngs={"masking": jax.random.PRNGKey(2)}
    )
    assert np.isfinite(float(loss))
    assert pred.shape == (2, cfg.num_patches, 256)
    assert mask.shape == (2, cfg.num_patches)


def test_mae_overfits_one_batch(rng):
    import optax

    cfg = tiny_mae(1)
    model = MaskedAutoencoderViT(cfg)
    imgs = jnp.asarray(rng.normal(size=(4, 1, 64, 32)).astype(np.float32))
    params = model.init(
        {"params": jax.random.PRNGKey(0), "masking": jax.random.PRNGKey(1)},
        imgs, 0.5,
    )["params"]
    tx = optax.adam(1e-3)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state, rng):
        def loss_fn(p):
            loss, _, _ = model.apply(
                {"params": p}, imgs, 0.5, rngs={"masking": rng}
            )
            return loss

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    losses = []
    rng_ = jax.random.PRNGKey(3)
    for i in range(40):
        rng_, sub = jax.random.split(rng_)
        params, opt_state, loss = step(params, opt_state, sub)
        losses.append(float(loss))
    # random-noise targets learn slowly; expect a clear downward trend
    assert np.mean(losses[-5:]) < np.mean(losses[:5]) * 0.97, (
        losses[:3] + losses[-3:]
    )
