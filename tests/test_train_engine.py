"""Training-engine tests: phase transitions, loss decrease under SPMD over
the virtual 8-device mesh, optimizer parity (layer-decay scales, frozen
pos-embed), eval metrics, and checkpoint round-trip."""

import math
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tpat_tpu.config import TrainConfig, ViTConfig
from tpat_tpu.engine import evaluate as eval_lib
from tpat_tpu.engine import optimizer as opt_lib
from tpat_tpu.engine.train import TrainModule, bce_with_logits, soft_cross_entropy
from tpat_tpu.models.vit import AudioViT
from tpat_tpu.parallel import mesh as mesh_lib
from tpat_tpu.utils import checkpoint as ckpt_lib


def tiny_cfg(**kw):
    kw.setdefault("embed_dim", 64)
    kw.setdefault("depth", 3)
    kw.setdefault("num_heads", 2)
    kw.setdefault("num_classes", 4)
    kw.setdefault("target_length", 64)
    kw.setdefault("num_mel_bins", 32)
    kw.setdefault("drop_loc", (1,))
    kw.setdefault("drop_path_rate", 0.1)
    kw.setdefault("compute_dtype", "float32")
    return ViTConfig(**kw)


def synthetic_batches(n_batches, batch, cfg, seed=0):
    rng = np.random.default_rng(seed)
    out = []
    for _ in range(n_batches):
        y_idx = rng.integers(0, cfg.num_classes, size=batch)
        x = rng.normal(size=(batch, 1, cfg.target_length, cfg.num_mel_bins))
        # make inputs class-dependent so the model can overfit
        x[np.arange(batch), 0, 0, 0] = y_idx * 2.0
        y = np.eye(cfg.num_classes, dtype=np.float32)[y_idx]
        out.append((x.astype(np.float32), y))
    return out


def make_module(cfg, train_cfg, loss="ce", mesh=None, iters=4):
    return TrainModule(
        model=AudioViT(cfg),
        model_cfg=cfg,
        train_cfg=train_cfg,
        loss_type=loss,
        iters_per_epoch=iters,
        mesh=mesh,
    )


def test_losses_match_torch():
    import torch

    rng = np.random.default_rng(0)
    logits = rng.normal(size=(5, 7)).astype(np.float32)
    targets = rng.uniform(size=(5, 7)).astype(np.float32)
    got = float(bce_with_logits(jnp.asarray(logits), jnp.asarray(targets)))
    want = float(
        torch.nn.BCEWithLogitsLoss()(
            torch.from_numpy(logits), torch.from_numpy(targets)
        )
    )
    assert abs(got - want) < 1e-6

    probs = targets / targets.sum(axis=1, keepdims=True)
    got = float(soft_cross_entropy(jnp.asarray(logits), jnp.asarray(probs)))
    want = float(
        torch.nn.CrossEntropyLoss()(
            torch.from_numpy(logits), torch.from_numpy(probs)
        )
    )
    assert abs(got - want) < 1e-6


def test_train_phases_and_loss_decreases():
    cfg = tiny_cfg(base_keep_rate=0.6)
    tc = TrainConfig(
        batch_size=8,
        epochs=6,
        blr=2e-3,
        warmup_epochs=1,
        shrink_start_epoch=1,
        shrink_epochs=2,
        base_keep_rate=0.6,
        drop_loc=(1,),
        mask_t_prob=0.2,
        mask_f_prob=0.2,
    )
    mesh = mesh_lib.make_mesh()
    mod = make_module(cfg, tc, mesh=mesh)
    batches = synthetic_batches(4, 8, cfg)
    state = mod.init(jnp.asarray(batches[0][0]))

    phases = []
    losses = []
    for epoch in range(6):
        state, stats = mod.train_epoch(state, batches, epoch)
        phases.append(stats["phase"])
        losses.append(stats["loss"])
    assert phases == ["dense", "anneal", "anneal", "static", "static", "static"]
    assert losses[-1] < losses[0], f"loss did not decrease: {losses}"
    # frozen pos-embed must not have moved
    init_pos = np.asarray(
        AudioViT(cfg).init({"params": jax.random.PRNGKey(tc.seed)},
                           jnp.asarray(batches[0][0][:1]))["params"]["pos_embed"]
    )
    np.testing.assert_array_equal(np.asarray(state.params["pos_embed"]), init_pos)


def test_train_multidevice_mesh():
    assert jax.device_count() == 8, "conftest must provide 8 virtual devices"
    cfg = tiny_cfg()
    tc = TrainConfig(batch_size=16, epochs=2, warmup_epochs=0)
    mesh = mesh_lib.make_mesh()
    mod = make_module(cfg, tc, mesh=mesh)
    batches = synthetic_batches(2, 16, cfg)
    state = mod.init(jnp.asarray(batches[0][0]))
    state, stats = mod.train_epoch(state, batches, 0)
    assert math.isfinite(stats["loss"])
    # single-device reference run must produce the same loss sequence
    mod1 = make_module(cfg, tc, mesh=mesh_lib.make_mesh(n_devices=1))
    state1 = mod1.init(jnp.asarray(batches[0][0]))
    state1, stats1 = mod1.train_epoch(state1, batches, 0)
    assert abs(stats["loss"] - stats1["loss"]) < 1e-4


def test_nan_abort_via_device_flag():
    """The NaN hard abort (engine_finetune.py:108-110) now fires from a
    device-side finite flag at fetch points, not a per-step host sync."""
    cfg = tiny_cfg()
    tc = TrainConfig(batch_size=4, epochs=1, warmup_epochs=0)
    mod = make_module(cfg, tc, iters=2)
    batches = synthetic_batches(2, 4, cfg)
    state = mod.init(jnp.asarray(batches[0][0]))
    bad = batches[0][0].copy()
    bad[0, 0, 0, 0] = np.nan
    with pytest.raises(FloatingPointError):
        mod.train_epoch(
            state, [(bad, batches[0][1])] + batches[1:], 0, nan_check_every=1
        )
    # ... and also at epoch end when the check interval never fires
    state2 = mod.init(jnp.asarray(batches[0][0]))
    with pytest.raises(FloatingPointError):
        mod.train_epoch(
            state2, [(bad, batches[0][1])], 0, nan_check_every=0
        )


def test_bucket_keep_rates():
    from tpat_tpu.engine.schedules import bucket_keep_rates, scheduled_keep_rates

    # levels for base 0.7, 4 buckets: ~0.7, ~0.8, ~0.9, 1.0 — emitted as
    # the exact float level values (no decimal rounding; see below)
    lv = [0.7 + (1.0 - 0.7) * i / 3 for i in range(4)]
    assert bucket_keep_rates(
        (1.0, 0.95, 0.85, 0.71, 0.7), base_keep_rate=0.7, n_buckets=4
    ) == (1.0, 1.0, lv[2], lv[1], 0.7)
    # bucketed rate is always >= the scheduled rate (STRICT snap-up: the
    # kept-token count ceil(rate*P) must never fall below the schedule's,
    # for any patch count), and monotone over the anneal (never re-grows)
    import math

    prev = None
    for it in range(20, 60):  # global iters: epochs 1-2 of the shrink
        epoch = it // 20
        rates = scheduled_keep_rates(
            it, epoch, shrink_start_epoch=1, total_epochs=3,
            iters_per_epoch=20, base_keep_rate=0.7, num_blocks=4,
            drop_loc=(1, 3),
        )
        b = bucket_keep_rates(rates, base_keep_rate=0.7, n_buckets=4)
        for r, bb in zip(rates, b):
            assert bb >= r - 1e-9
            for p in (64, 128, 256, 512):
                assert math.ceil(bb * p) >= math.ceil(r * p)
        if prev is not None:
            assert all(x <= y + 1e-9 for x, y in zip(b, prev))
        prev = b
    # the cosine tail (0.7005...) rides one level above base — the base
    # bucket itself is reached only at an exact hit; the static phase
    # takes over at base right after the shrink window
    assert prev[1] == lv[1]
    # boundary values snap UP, never down (the old 1e-3 tolerance kept
    # one token fewer than the schedule at every bucket boundary)
    assert bucket_keep_rates((0.8009,), base_keep_rate=0.7, n_buckets=4) == (lv[2],)
    # levels are emitted VERBATIM (no decimal rounding): the base bucket
    # must compare == cfg.base_keep_rate even for rates like 1/3 so it
    # shares the post-shrink static step's compile-cache key (train.py)
    base = 1.0 / 3.0
    assert bucket_keep_rates((base,), base_keep_rate=base, n_buckets=4) == (base,)
    lv1 = base + (1.0 - base) / 3.0
    assert bucket_keep_rates((base + 1e-5,), base_keep_rate=base, n_buckets=4) == (lv1,)


def test_bucketed_anneal_rejects_custom_rank():
    """Both anneal modes enforce the same rule: the custom-rank ablation is
    static-phase only (models_vit.py:341-351).  The masked path asserts in
    _forward; the bucketed path must not silently bypass that."""
    import pytest

    cfg = tiny_cfg(base_keep_rate=0.6)
    tc = TrainConfig(
        batch_size=8, epochs=4, blr=2e-3, warmup_epochs=1,
        shrink_start_epoch=1, shrink_epochs=2, base_keep_rate=0.6,
        drop_loc=(1,), anneal_mode="bucketed", anneal_buckets=3,
    )
    mod = make_module(cfg, tc)
    mod.custom_rank = "mean"
    batches = synthetic_batches(2, 8, cfg)
    state = mod.init(jnp.asarray(batches[0][0]))
    with pytest.raises(AssertionError, match="static-phase only"):
        mod.train_epoch(state, batches, epoch=1)


def test_bucketed_anneal_trains_and_bounds_compiles():
    """anneal_mode='bucketed': the shrink phase runs physically-pruned
    static steps, compiling at most anneal_buckets variants, and training
    still converges across all three phases."""
    cfg = tiny_cfg(base_keep_rate=0.6)
    tc = TrainConfig(
        batch_size=8, epochs=6, blr=2e-3, warmup_epochs=1,
        shrink_start_epoch=1, shrink_epochs=2, base_keep_rate=0.6,
        drop_loc=(1,), anneal_mode="bucketed", anneal_buckets=3,
    )
    mod = make_module(cfg, tc)
    batches = synthetic_batches(4, 8, cfg)
    state = mod.init(jnp.asarray(batches[0][0]))
    phases, losses = [], []
    for epoch in range(6):
        state, stats = mod.train_epoch(state, batches, epoch)
        phases.append(stats["phase"])
        losses.append(stats["loss"])
    assert phases == ["dense", "anneal", "anneal", "static", "static", "static"]
    assert losses[-1] < losses[0], losses
    bucket_steps = [k for k in mod._steps if k[2] is not None]
    assert 1 <= len(bucket_steps) <= tc.anneal_buckets
    # every bucket variant is a valid keep-rate tuple >= base
    for _, _, rates in bucket_steps:
        assert all(r >= tc.base_keep_rate - 1e-9 for r in rates)


def test_logger_window_means(capsys):
    """Log-point meters report true window means derived from device-side
    sums: with log_every=2 each update must equal the mean loss of the
    steps since the previous log point, not a 1-in-N subsample."""
    cfg = tiny_cfg()
    tc = TrainConfig(batch_size=4, epochs=1, warmup_epochs=0)
    mod = make_module(cfg, tc, iters=4)
    batches = synthetic_batches(4, 4, cfg)
    state = mod.init(jnp.asarray(batches[0][0]))
    lines = []
    state, stats = mod.train_epoch(
        state, batches, 0, log_every=2, log_fn=lines.append
    )
    assert math.isfinite(stats["loss"]) and math.isfinite(stats["grad_norm"])
    loss_lines = [l for l in lines if "loss:" in l]
    # iters 0 and 2, plus the reference's final-iteration print at iter 3
    # (util/misc.py:151)
    assert len(loss_lines) == 3
    import re

    vals = [float(re.search(r"loss: (\d+\.\d+)", l).group(1)) for l in loss_lines]
    assert all(math.isfinite(v) and v > 0 for v in vals)


def test_optimizer_lr_scales():
    cfg = tiny_cfg()
    model = AudioViT(cfg)
    params = model.init(
        {"params": jax.random.PRNGKey(0)},
        jnp.zeros((1, 1, cfg.target_length, cfg.num_mel_bins)),
    )["params"]
    scales = opt_lib.lr_scale_tree(params, cfg.depth, 0.75, True)
    assert scales["pos_embed"] == 0.0  # frozen
    assert scales["cls_token"] == 0.75 ** (cfg.depth + 1)
    assert scales["blocks_0"]["norm1"]["scale"] == 0.75 ** cfg.depth
    assert scales["head"]["kernel"] == 1.0
    mask = opt_lib.wd_mask_tree(params)
    assert mask["blocks_0"]["attn"]["qkv"]["kernel"] is True
    assert mask["blocks_0"]["attn"]["qkv"]["bias"] is False
    assert mask["cls_token"] is False


def test_evaluate_classification_and_multilabel():
    cfg = tiny_cfg()
    model = AudioViT(cfg)
    mesh = mesh_lib.make_mesh()
    params = model.init(
        {"params": jax.random.PRNGKey(0)},
        jnp.zeros((1, 1, cfg.target_length, cfg.num_mel_bins)),
    )["params"]
    batches = synthetic_batches(3, 8, cfg)
    # last batch smaller than compiled size -> padding path
    batches[-1] = (batches[-1][0][:5], batches[-1][1][:5])
    stats = eval_lib.evaluate_classification(
        model, params, batches, batch_size=8, mesh=mesh
    )
    assert 0.0 <= stats["acc1"] <= 100.0
    assert stats["acc5"] >= stats["acc1"]
    ml = eval_lib.evaluate_multilabel(
        model, params, batches, batch_size=8, mesh=mesh
    )
    assert 0.0 <= ml["mAP"] <= 1.0


def test_checkpoint_roundtrip(tmp_path):
    cfg = tiny_cfg()
    tc = TrainConfig(batch_size=4, epochs=2, warmup_epochs=0)
    mod = make_module(cfg, tc)
    batches = synthetic_batches(1, 4, cfg)
    state = mod.init(jnp.asarray(batches[0][0]))
    state, _ = mod.train_epoch(state, batches, 0)

    keeper = ckpt_lib.BestCheckpointKeeper(
        str(tmp_path / "scratch"), str(tmp_path / "out")
    )
    assert keeper.update(0.5, state, epoch=0)
    assert not keeper.update(0.3, state, epoch=1)  # worse -> not saved
    assert keeper.update(0.5, state, epoch=2)  # ties keep the later epoch
    best = keeper.finalize()
    assert best is not None
    markers = [p for p in os.listdir(tmp_path / "out") if p.startswith("best-")]
    assert markers == ["best-002-0.5000.txt"]

    restored = ckpt_lib.restore_checkpoint(best)
    np.testing.assert_allclose(
        restored["params"]["cls_token"],
        np.asarray(state.params["cls_token"]),
        rtol=1e-6,
    )
    assert restored["epoch"] == 2


def test_checkpoint_async_matches_sync(tmp_path):
    """async_save=True overlaps the disk writes on the background writer
    but must produce byte-equivalent final artifacts: same best marker,
    same restored params/epoch, scratch pruned to the single best.
    finalize() joins the writer, so reads after it are always safe."""
    cfg = tiny_cfg()
    tc = TrainConfig(batch_size=4, epochs=2, warmup_epochs=0)
    mod = make_module(cfg, tc)
    batches = synthetic_batches(1, 4, cfg)
    state = mod.init(jnp.asarray(batches[0][0]))
    state, _ = mod.train_epoch(state, batches, 0)

    keeper = ckpt_lib.BestCheckpointKeeper(
        str(tmp_path / "scratch"), str(tmp_path / "out"), async_save=True
    )
    assert keeper.update(0.5, state, epoch=0)
    assert not keeper.update(0.3, state, epoch=1)
    cls_host = np.asarray(state.params["cls_token"])
    assert keeper.update(0.7, state, epoch=2)
    # update() must snapshot device->host on the CALLER thread: with the
    # train step donating its input state, the next step deletes these
    # buffers before the writer thread runs.  Simulate by deleting every
    # device array right after update() returns — the background write
    # must still commit the epoch-2 payload.
    for leaf in jax.tree_util.tree_leaves(state.params):
        if isinstance(leaf, jax.Array):
            leaf.delete()
    # the background prune (same single-worker queue, after the save) is
    # the thing that removed checkpoint-000 — check BEFORE finalize(),
    # which would delete everything in scratch itself.
    ckpt_lib.wait_for_checkpoints()
    assert sorted(
        p for p in os.listdir(tmp_path / "scratch")
        if p.startswith("checkpoint-")
    ) == ["checkpoint-002"]
    best = keeper.finalize()  # joins the background writes
    markers = [p for p in os.listdir(tmp_path / "out") if p.startswith("best-")]
    assert markers == ["best-002-0.7000.txt"]
    restored = ckpt_lib.restore_checkpoint(best)
    np.testing.assert_allclose(
        restored["params"]["cls_token"], cls_host, rtol=1e-6
    )
    assert restored["epoch"] == 2


def test_checkpoint_best_on_device_snapshot(tmp_path):
    """snapshot_on_device=True keeps the best state as an HBM-resident
    COPY and touches disk only at finalize (one fetch per run, not one
    per improving epoch — the mode that makes the twin grid feasible on
    the relay).  Contract pinned here: (1) no scratch writes before
    finalize; (2) the snapshot owns FRESH buffers, so deleting the
    original state's arrays right after update() — what the next train
    step's donation does for real — must not corrupt the final write;
    (3) tie epochs replace the snapshot (AudioMAE last-wins rule)."""
    cfg = tiny_cfg()
    tc = TrainConfig(batch_size=4, epochs=2, warmup_epochs=0)
    mod = make_module(cfg, tc)
    batches = synthetic_batches(1, 4, cfg)
    state = mod.init(jnp.asarray(batches[0][0]))

    keeper = ckpt_lib.BestCheckpointKeeper(
        str(tmp_path / "scratch"), str(tmp_path / "out"),
        snapshot_on_device=True,
    )
    assert keeper.update(0.5, state, epoch=0)
    state2, _ = mod.train_epoch(state, batches, 0)
    cls_host = np.asarray(state2.params["cls_token"])
    assert keeper.update(0.5, state2, epoch=1)  # tie -> later epoch wins
    assert not keeper.update(0.3, state2, epoch=2)
    # nothing on disk yet: disk work is deferred entirely to finalize
    assert not any(
        p.startswith("checkpoint-") for p in os.listdir(tmp_path / "scratch")
    )
    # simulate the next step's donation invalidating the live state
    for leaf in jax.tree_util.tree_leaves((state2.params, state2.opt_state)):
        if isinstance(leaf, jax.Array):
            leaf.delete()
    best = keeper.finalize()
    markers = [p for p in os.listdir(tmp_path / "out") if p.startswith("best-")]
    assert markers == ["best-001-0.5000.txt"]
    restored = ckpt_lib.restore_checkpoint(best)
    np.testing.assert_allclose(
        restored["params"]["cls_token"], cls_host, rtol=1e-6
    )
    assert restored["epoch"] == 1
    # finalize() empties the scratch dir entirely
    assert os.listdir(tmp_path / "scratch") == []

    # background save_checkpoint + wait_for_checkpoints: readable after
    # the join, and the pending list drains (fresh state — the one above
    # had its device buffers deleted by the donation simulation)
    state = mod.init(jnp.asarray(batches[0][0]))
    fut = ckpt_lib.save_checkpoint(
        str(tmp_path / "last"), state, epoch=3, background=True
    )
    ckpt_lib.wait_for_checkpoints()
    assert fut.done() and fut.exception() is None
    assert ckpt_lib.restore_checkpoint(str(tmp_path / "last"))["epoch"] == 3


def test_checkpoint_async_failed_save_keeps_previous_best(
    tmp_path, monkeypatch
):
    """The keeper's crash-safety contract (checkpoint.py update docstring):
    a failed save must not lose BOTH checkpoints.  In the async path the
    prune rides the writer queue as a separate job, so it must check the
    save future's outcome — otherwise a serialize error (disk full) would
    still delete the previous best."""
    cfg = tiny_cfg()
    tc = TrainConfig(batch_size=4, epochs=1, warmup_epochs=0)
    mod = make_module(cfg, tc)
    batches = synthetic_batches(1, 4, cfg)
    state = mod.init(jnp.asarray(batches[0][0]))

    keeper = ckpt_lib.BestCheckpointKeeper(
        str(tmp_path / "scratch"), str(tmp_path / "out"), async_save=True
    )
    assert keeper.update(0.5, state, epoch=0)
    ckpt_lib.wait_for_checkpoints()  # epoch-0 best committed for real

    real_checkpointer = ckpt_lib._checkpointer

    class _DiskFull:
        def save(self, path, payload, force=True):
            raise OSError("scratch ramdisk full")

    monkeypatch.setattr(ckpt_lib, "_checkpointer", lambda: _DiskFull())
    assert keeper.update(0.7, state, epoch=2)  # save fails on the writer
    with pytest.raises(OSError, match="ramdisk full"):
        ckpt_lib.wait_for_checkpoints()
    # the previous best SURVIVED the failed save (and the failed epoch-2
    # checkpoint never materialized)
    assert sorted(
        p for p in os.listdir(tmp_path / "scratch")
        if p.startswith("checkpoint-")
    ) == ["checkpoint-000"]
    # the failed save ROLLED BACK best tracking (prune's re-arm): the
    # phantom 0.7 must not block a later 0.6 that can actually commit —
    # otherwise the run ends with only the stale epoch-0 checkpoint
    assert (keeper.best_score, keeper.best_epoch) == (0.5, 0)
    monkeypatch.setattr(ckpt_lib, "_checkpointer", real_checkpointer)
    assert keeper.update(0.6, state, epoch=3)  # re-armed -> saves for real
    # finalize() re-raises the failure (its futures list still holds the
    # failed save) so the caller cannot silently lose the run — but only
    # AFTER securing the best committed checkpoint in the output dir
    with pytest.raises(OSError, match="ramdisk full"):
        keeper.finalize()
    markers = [p for p in os.listdir(tmp_path / "out") if p.startswith("best-")]
    assert markers == ["best-003-0.6000.txt"]
    restored = ckpt_lib.restore_checkpoint(str(tmp_path / "out" / "best_model"))
    assert restored["epoch"] == 3


def test_evaluate_multilabel_with_extraction(tmp_path):
    """AudioSet-style mAP eval with feature extraction (the reference's
    evaluate_audioset extraction path, engine_finetune.py:233-256)."""
    from tpat_tpu.utils.features import FeatureWriter, combine_feature_dict

    cfg = tiny_cfg(base_keep_rate=0.6)
    model = AudioViT(cfg)
    params = model.init(
        {"params": jax.random.PRNGKey(0)},
        jnp.zeros((1, 1, cfg.target_length, cfg.num_mel_bins)),
    )["params"]
    rng = np.random.default_rng(0)
    batches = [
        (
            rng.normal(size=(4, 1, cfg.target_length, cfg.num_mel_bins)).astype(
                np.float32
            ),
            (rng.uniform(size=(4, cfg.num_classes)) < 0.3).astype(np.float32),
        )
        for _ in range(2)
    ]
    writer = FeatureWriter(str(tmp_path))
    stats = eval_lib.evaluate_multilabel(
        model, params, batches, batch_size=4, feature_writer=writer
    )
    assert 0.0 <= stats["mAP"] <= 1.0
    mel = combine_feature_dict(str(tmp_path), "mel")
    assert mel.shape[0] == 8
    assert combine_feature_dict(str(tmp_path), "block-1.topk_idx") is not None
    assert combine_feature_dict(str(tmp_path), "labels") == ["temp"] * 8


def test_eval_loss_weights_batches_equally():
    """The reference reports the eval CE loss as an unweighted mean of
    PER-BATCH losses (metric_logger.update(loss=...) with n=1,
    engine_finetune.py:194), so a ragged last batch counts the same as a
    full one."""
    from tpat_tpu.engine import evaluate as eval_lib

    cfg = tiny_cfg(drop_loc=(), drop_path_rate=0.0)
    model = AudioViT(cfg)
    rng = np.random.default_rng(0)
    x = rng.normal(size=(7, 1, 64, 32)).astype(np.float32)  # 4 + 3 split
    y = np.eye(4, dtype=np.float32)[rng.integers(0, 4, size=7)]
    params = model.init(
        {"params": jax.random.PRNGKey(0)}, jnp.asarray(x[:1])
    )["params"]

    stats = eval_lib.evaluate_classification(
        model, params, [(x[:4], y[:4]), (x[4:], y[4:])], batch_size=4
    )

    logits = np.asarray(model.apply({"params": params}, jnp.asarray(x)))
    logp = np.asarray(jax.nn.log_softmax(jnp.asarray(logits), axis=-1))
    tgt = np.argmax(y, axis=1)
    l1 = -np.mean(logp[np.arange(4), tgt[:4]])
    l2 = -np.mean(logp[np.arange(4, 7), tgt[4:]])
    np.testing.assert_allclose(stats["loss"], (l1 + l2) / 2.0, rtol=1e-5)
    # and NOT the per-sample mean (they differ on ragged splits)
    per_sample = -np.mean(logp[np.arange(7), tgt])
    assert abs(stats["loss"] - per_sample) > 1e-9


def test_smoothed_value_median_and_final_log():
    """torch.median takes the LOWER middle on even windows; log_every
    also prints on the final iteration (util/misc.py:151)."""
    from tpat_tpu.utils.logging import MetricLogger, SmoothedValue

    sv = SmoothedValue(window_size=10)
    for v in [1.0, 2.0, 3.0, 4.0]:
        sv.update(v)
    assert sv.median == 2.0  # not 3.0

    lines = []
    ml = MetricLogger(print_fn=lines.append)
    list(ml.log_every(range(7), print_freq=3, header="h"))
    # prints at i=0, 3, 6 (6 == total-1 is the final-iteration print)
    assert sum("[6/7]" in l or "[6]" in l for l in lines) == 1


def test_hybrid_anneal_default_trains_and_bounds_compiles():
    """anneal_mode='hybrid' (the DEFAULT): shrink-phase steps run at
    bucket-level physical widths with the exact traced schedule masked
    inside, compiling at most anneal_buckets hybrid variants, and training
    converges across all three phases."""
    cfg = tiny_cfg(base_keep_rate=0.6)
    tc = TrainConfig(
        batch_size=8, epochs=6, blr=2e-3, warmup_epochs=1,
        shrink_start_epoch=1, shrink_epochs=2, base_keep_rate=0.6,
        drop_loc=(1,), anneal_buckets=3,
    )
    assert tc.anneal_mode == "hybrid"  # the default
    mod = make_module(cfg, tc)
    batches = synthetic_batches(4, 8, cfg)
    state = mod.init(jnp.asarray(batches[0][0]))
    phases, losses = [], []
    for epoch in range(6):
        state, stats = mod.train_epoch(state, batches, epoch)
        phases.append(stats["phase"])
        losses.append(stats["loss"])
    assert phases == ["dense", "anneal", "anneal", "static", "static", "static"]
    assert losses[-1] < losses[0], losses
    hybrid_steps = [k for k in mod._steps if k[0] == "anneal" and k[2]]
    assert 1 <= len(hybrid_steps) <= tc.anneal_buckets
    for _, _, rates in hybrid_steps:
        assert all(r >= tc.base_keep_rate - 1e-9 for r in rates)


def test_hybrid_anneal_matches_masked_trajectory():
    """The hybrid anneal is the SAME schedule as 'masked' (same kept sets
    and widths, traced exact counts) — per-epoch train losses from
    identical inits must agree to float tolerance."""
    import dataclasses as dc

    cfg = tiny_cfg(base_keep_rate=0.6, drop_path_rate=0.0)
    base_tc = TrainConfig(
        batch_size=8, epochs=4, blr=2e-3, warmup_epochs=1,
        shrink_start_epoch=0, shrink_epochs=3, base_keep_rate=0.6,
        drop_loc=(1,), anneal_buckets=4,
    )
    batches = synthetic_batches(3, 8, cfg)
    traj = {}
    for mode in ("hybrid", "masked"):
        tc = dc.replace(base_tc, anneal_mode=mode)
        mod = make_module(cfg, tc)
        state = mod.init(jnp.asarray(batches[0][0]), seed=7)
        losses = []
        for epoch in range(3):
            state, stats = mod.train_epoch(state, batches, epoch)
            assert stats["phase"] == "anneal"
            losses.append(stats["loss"])
        traj[mode] = losses
    np.testing.assert_allclose(
        traj["hybrid"], traj["masked"], rtol=1e-3, atol=2e-3
    )


def test_hybrid_anneal_rejects_custom_rank():
    cfg = tiny_cfg(base_keep_rate=0.6)
    tc = TrainConfig(
        batch_size=8, epochs=4, blr=2e-3, warmup_epochs=1,
        shrink_start_epoch=1, shrink_epochs=2, base_keep_rate=0.6,
        drop_loc=(1,), anneal_mode="hybrid", anneal_buckets=3,
    )
    mod = make_module(cfg, tc)
    mod.custom_rank = "mean"
    batches = synthetic_batches(2, 8, cfg)
    state = mod.init(jnp.asarray(batches[0][0]))
    with pytest.raises(AssertionError, match="static-phase only"):
        mod.train_epoch(state, batches, epoch=1)


def test_train_epoch_streams_epoch1000x_scalars():
    """Intra-epoch loss/lr TB points at the reference's epoch_1000x index
    (engine_finetune.py:131-137), streamed from the window fetches."""
    cfg = tiny_cfg()
    tc = TrainConfig(batch_size=4, epochs=2, warmup_epochs=0)
    mod = make_module(cfg, tc, iters=6)
    batches = synthetic_batches(6, 4, cfg)
    state = mod.init(jnp.asarray(batches[0][0]))

    class StubTB:
        def __init__(self):
            self.points = []

        def add_scalar(self, tag, value, step):
            self.points.append((tag, float(value), int(step)))

    tb = StubTB()
    state, _ = mod.train_epoch(
        state, batches, epoch=1, log_every=2, tb_writer=tb,
        log_fn=lambda *_: None,
    )
    loss_pts = [(v, s) for t, v, s in tb.points if t == "loss"]
    lr_pts = [(v, s) for t, v, s in tb.points if t == "lr"]
    assert len(loss_pts) == 3 and len(lr_pts) == 3  # iters 0, 2, 4
    steps = [s for _, s in loss_pts]
    # epoch 1, 6 iters: x = int((i/6 + 1) * 1000) for i in (0, 2, 4)
    assert steps == [1000, 1333, 1666]
    assert all(np.isfinite(v) for v, _ in loss_pts)


def test_compiled_step_process_memo():
    """Two equal-config modules (different seeds) share ONE compiled
    train-step program — the process-level memo that keeps multi-run
    harnesses (one cli.finetune per grid arm) from recompiling identical
    programs on the slow remote-compile backend.  A config change must
    split the cache, and the shared step must train the second module
    correctly (its own state/optimizer, reused program)."""
    cfg = tiny_cfg(base_keep_rate=0.6)

    def tc(seed, blr=2e-3):
        return TrainConfig(
            batch_size=8, epochs=4, blr=blr, warmup_epochs=1,
            shrink_start_epoch=1, shrink_epochs=1,
            base_keep_rate=0.6, drop_loc=(1,), seed=seed,
        )

    mesh = mesh_lib.make_mesh()
    batches = synthetic_batches(2, 8, cfg)

    m0 = make_module(cfg, tc(seed=0), mesh=mesh)
    s0 = m0.init(jnp.asarray(batches[0][0]), seed=0)
    m1 = make_module(cfg, tc(seed=1), mesh=mesh)
    s1 = m1.init(jnp.asarray(batches[0][0]), seed=1)
    assert m0.compiled_step("dense") is m1.compiled_step("dense")
    assert m0.compiled_step("static") is m1.compiled_step("static")
    # different schedule-defining field -> different program
    m2 = make_module(cfg, tc(seed=0, blr=1e-3), mesh=mesh)
    m2.init(jnp.asarray(batches[0][0]), seed=0)
    assert m2.compiled_step("dense") is not m0.compiled_step("dense")

    # the reused program trains module 1's OWN state (loss decreases,
    # step counter advances) — closures from module 0 are equivalent
    losses = []
    for epoch in range(3):
        s1, stats = m1.train_epoch(s1, batches, epoch)
        losses.append(stats["loss"])
    assert int(jax.device_get(s1.step)) == 6
    assert losses[-1] < losses[0]

    # eval programs share the same way (equal model config)
    e0 = eval_lib.make_eval_step(m0.model)
    e1 = eval_lib.make_eval_step(m1.model)
    assert e0 is e1
