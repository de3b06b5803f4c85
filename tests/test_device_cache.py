"""Device-resident dataset cache (data/device_cache.py): the cached
loader must be a bit-exact stand-in for the streaming DataLoader — same
sampler order, same items, same batches — and must refuse any dataset
whose per-item pipeline draws randomness."""

import dataclasses
import json
import math

import numpy as np
import pytest

from tpat_tpu.config import DATASET_PRESETS
from tpat_tpu.data.datasets import AudiosetDataset
from tpat_tpu.data.device_cache import (
    DeviceCachedLoader,
    _REGISTRY,
    clear_cache,
    maybe_device_cached,
    nondeterminism_reason,
)
from tpat_tpu.data.loader import DataLoader
from tpat_tpu.data.sampler import EpochShardSampler
from tpat_tpu.data.wav import save_wav


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    root = tmp_path_factory.mktemp("dc_corpus")
    sr = 16000
    rng = np.random.default_rng(7)
    entries = []
    for i in range(10):
        t = np.arange(sr) / sr
        wave = 0.4 * np.sin(2 * math.pi * (250 + 150 * (i % 4)) * t)
        wave += 0.02 * rng.normal(size=sr)
        path = str(root / f"c{i}.wav")
        save_wav(path, wave.astype(np.float32), sr)
        entries.append({"wav": path, "labels": f"/m/{i % 4:02d}"})
    manifest = str(root / "data.json")
    json.dump({"data": entries}, open(manifest, "w"))
    label_csv = str(root / "labels.csv")
    with open(label_csv, "w") as f:
        f.write("index,mid,display_name\n")
        for c in range(4):
            f.write(f'{c},/m/{c:02d},"tone {c}"\n')
    return manifest, label_csv


def _cfg(**kw):
    base = dict(target_length=128, num_classes=4, freqm=0, timem=0,
                mixup=0.0, roll_mag_aug=False)
    base.update(kw)
    return dataclasses.replace(DATASET_PRESETS["esc50"], **base)


@pytest.mark.parametrize("waveform", [False, True])
def test_cached_loader_matches_streaming(corpus, waveform):
    """Two epochs of batches: identical arrays, labels, and ids in
    identical order — the cache changes where bytes live, not what the
    model sees."""
    manifest, label_csv = corpus
    clear_cache()
    ds = AudiosetDataset(
        manifest, _cfg(), label_csv, train=True, return_waveform=waveform,
    )
    kw = dict(batch_size=4, num_workers=2, drop_last=True)
    streaming = DataLoader(
        ds, sampler=EpochShardSampler(len(ds), shuffle=True, seed=3), **kw
    )
    cached = DeviceCachedLoader(
        ds, sampler=EpochShardSampler(len(ds), shuffle=True, seed=3), **kw
    )
    for epoch in (0, 1):
        streaming.set_epoch(epoch)
        cached.set_epoch(epoch)
        got_s, got_c = list(streaming), list(cached)
        assert len(got_s) == len(got_c) == len(cached) > 0
        for (xs, ys, ids_s), (xc, yc, ids_c) in zip(got_s, got_c):
            np.testing.assert_array_equal(xs, np.asarray(xc))
            np.testing.assert_array_equal(ys, np.asarray(yc))
            assert ids_s == ids_c


def test_registry_shares_one_device_copy(corpus):
    """Equal-signature datasets (the grid harness re-running cli.finetune
    on one corpus) must reuse the same HBM arrays, not re-transfer."""
    manifest, label_csv = corpus
    clear_cache()
    ds1 = AudiosetDataset(manifest, _cfg(), label_csv, train=True)
    ds2 = AudiosetDataset(manifest, _cfg(), label_csv, train=False)
    l1 = DeviceCachedLoader(ds1, batch_size=4)
    l2 = DeviceCachedLoader(ds2, batch_size=4)
    next(iter(l1)), next(iter(l2))
    assert l1._store[0] is l2._store[0]
    assert len(_REGISTRY) == 1
    clear_cache()
    assert len(_REGISTRY) == 0


def test_nondeterminism_refusal(corpus):
    manifest, label_csv = corpus
    # host-fbank path with SpecAug on: random -> refuse
    noisy = AudiosetDataset(
        manifest, _cfg(freqm=4, timem=4), label_csv, train=True,
    )
    assert "SpecAug" in nondeterminism_reason(noisy)
    with pytest.raises(ValueError, match="SpecAug"):
        DeviceCachedLoader(noisy, batch_size=4)
    assert maybe_device_cached(noisy, 4, mode="auto") is None
    with pytest.raises(ValueError, match="SpecAug"):
        maybe_device_cached(noisy, 4, mode="true")
    # same knobs in WAVEFORM mode: SpecAug runs on device, item is
    # deterministic -> eligible
    wf = AudiosetDataset(
        manifest, _cfg(freqm=4, timem=4), label_csv, train=True,
        return_waveform=True,
    )
    assert nondeterminism_reason(wf) is None
    # mixup randomizes both modes
    mix = AudiosetDataset(
        manifest, _cfg(mixup=0.5), label_csv, train=True,
        return_waveform=True,
    )
    assert "mixup" in nondeterminism_reason(mix)
    # auto mode declines oversized datasets instead of filling HBM
    small = AudiosetDataset(manifest, _cfg(), label_csv, train=True)
    assert maybe_device_cached(small, 4, mode="auto", max_bytes=1) is None
    assert maybe_device_cached(small, 4, mode="false") is None


def test_cli_parity_cached_vs_streaming(corpus, tmp_path):
    """The real finetune driver with --device_dataset true reproduces the
    streaming run's per-epoch losses and best accuracy exactly (same
    seed, augs off => identical batches => identical training)."""
    from tpat_tpu.cli.finetune import get_args_parser, main

    manifest, label_csv = corpus

    def run(tag, device_dataset):
        out = tmp_path / tag
        main(get_args_parser().parse_args([
            "--dataset", "esc50", "--model", "audiomae_vit_tiny",
            "--target_length", "128",
            "--data_train", manifest, "--data_eval", manifest,
            "--label_csv", label_csv,
            "--nb_classes", "4", "--batch_size", "8", "--epochs", "2",
            "--blr", "2e-3", "--warmup_epochs", "1",
            "--base_keep_rate", "0.6", "--drop_loc", "(1, 3)",
            "--shrink_start_epoch", "1", "--shrink_epochs", "1",
            "--freqm", "0", "--timem", "0", "--num_workers", "2",
            "--device_dataset", device_dataset,
            "--output_dir", str(out),
            "--result_path", str(out / "result.txt"),
        ]))
        logs = [json.loads(l) for l in open(out / "log.txt")]
        return (
            [l["train_loss"] for l in logs],
            [l["test_acc1"] for l in logs],
            float(open(out / "result.txt").read()),
        )

    clear_cache()
    loss_s, acc_s, best_s = run("streaming", "false")
    loss_c, acc_c, best_c = run("cached", "true")
    assert loss_s == pytest.approx(loss_c, rel=1e-6)
    assert acc_s == acc_c
    assert best_s == best_c
