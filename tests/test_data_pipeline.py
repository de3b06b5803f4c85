"""Data pipeline tests over synthetic WAV fixtures: decode, dataset
semantics (labels, mixup soft labels, padding, normalization), SpecAug,
samplers, and the threaded loader."""

import json
import math
import os

import numpy as np
import pytest

from tpat_tpu.config import DATASET_PRESETS, DataConfig
from tpat_tpu.data import augment
from tpat_tpu.data.datasets import AudiosetDataset, make_index_dict, make_name_dict
from tpat_tpu.data.loader import DataLoader
from tpat_tpu.data.sampler import EpochShardSampler, eval_shard
from tpat_tpu.data.wav import load_wav, save_wav


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    """5 one-second 16 kHz tones + manifest + label csv."""
    root = tmp_path_factory.mktemp("corpus")
    sr = 16000
    entries = []
    for i in range(5):
        t = np.arange(sr) / sr
        wave = 0.5 * np.sin(2 * math.pi * (200 + 200 * i) * t)
        path = str(root / f"tone{i}.wav")
        save_wav(path, wave.astype(np.float32), sr)
        entries.append({"wav": path, "labels": f"/m/{i:02d}"})
    manifest = str(root / "data.json")
    with open(manifest, "w") as f:
        json.dump({"data": entries}, f)
    label_csv = str(root / "labels.csv")
    with open(label_csv, "w") as f:
        f.write("index,mid,display_name\n")
        for i in range(5):
            f.write(f'{i},/m/{i:02d},"tone {i}"\n')
    return manifest, label_csv, root


def test_wav_roundtrip(tmp_path):
    sr = 16000
    wave = np.clip(np.random.default_rng(0).normal(size=8000) * 0.1, -1, 1)
    p = str(tmp_path / "x.wav")
    save_wav(p, wave.astype(np.float32), sr)
    got, got_sr = load_wav(p)
    assert got_sr == sr and got.shape == (1, 8000)
    np.testing.assert_allclose(got[0], wave, atol=2.0 / 32768)


def test_label_maps(corpus):
    _, label_csv, _ = corpus
    idx = make_index_dict(label_csv)
    assert idx["/m/03"] == 3
    names = make_name_dict(label_csv)
    assert names[2] == "tone 2"


def test_dataset_eval_item(corpus):
    manifest, label_csv, _ = corpus
    cfg = DataConfig(
        name="t", num_classes=5, target_length=128, norm_mean=-6.0,
        norm_std=5.0, multilabel=False, use_noise=False, loss_type="ce",
    )
    ds = AudiosetDataset(manifest, cfg, label_csv, train=False)
    x, y, path = ds[1]
    assert x.shape == (1, 128, 128)
    # 1 s at 16 kHz -> 98 frames, padded to 128 with the min value
    np.testing.assert_array_equal(y, [0, 1, 0, 0, 0])
    assert path.endswith("tone1.wav")
    # padding rows are all equal to the (normalized) pre-pad min
    assert np.ptp(x[0, 98:]) == 0.0
    # deterministic in eval mode
    x2, _, _ = ds[1]
    np.testing.assert_array_equal(x, x2)


def test_dataset_mixup_soft_labels(corpus):
    manifest, label_csv, _ = corpus
    cfg = DataConfig(
        name="t", num_classes=5, target_length=128, norm_mean=-6.0,
        norm_std=5.0, multilabel=True, use_noise=False, loss_type="bce",
        mixup=1.0,
    )
    ds = AudiosetDataset(manifest, cfg, label_csv, train=True, seed=3)
    x, y, _ = ds[0]
    # mixup always fires: labels sum to 1 with at most two classes > 0
    assert abs(y.sum() - 1.0) < 1e-6
    assert (y > 0).sum() in (1, 2)


def test_skip_norm_and_norm_stats(corpus):
    """skip_norm hatch (ast/src/dataloader.py:82-88, 203-207) + the
    norm-stats helper: computed (mean, std) must re-normalize the corpus
    to zero mean / 0.5 std under the (x - mean)/(2 std) convention."""
    from tpat_tpu.cli.get_norm_stats import compute_norm_stats

    manifest, label_csv, _ = corpus
    cfg = DataConfig(
        name="t", num_classes=5, target_length=128, norm_mean=-6.0,
        norm_std=5.0, multilabel=False, use_noise=False, loss_type="ce",
    )
    raw = AudiosetDataset(manifest, cfg, label_csv, train=False, skip_norm=True)
    norm = AudiosetDataset(manifest, cfg, label_csv, train=False)
    x_raw, _, _ = raw[0]
    x_norm, _, _ = norm[0]
    # skip_norm output is exactly the pre-normalization fbank
    np.testing.assert_allclose(x_raw, x_norm * (2 * 5.0) + (-6.0), atol=1e-4)

    mean, std = compute_norm_stats(raw, batch_size=2)
    allx = np.concatenate([np.asarray(raw[i][0]).ravel() for i in range(5)])
    assert abs(mean - allx.mean()) < 0.05 * max(1.0, abs(allx.mean()))
    assert abs(std - allx.std()) < 0.1 * allx.std()

    # normalizing with the computed constants recenters the corpus
    cfg2 = DataConfig(
        name="t", num_classes=5, target_length=128, norm_mean=mean,
        norm_std=std, multilabel=False, use_noise=False, loss_type="ce",
    )
    ds2 = AudiosetDataset(manifest, cfg2, label_csv, train=False)
    ally = np.concatenate([np.asarray(ds2[i][0]).ravel() for i in range(5)])
    assert abs(ally.mean()) < 0.05
    assert abs(ally.std() - 0.5) < 0.05

    # compute_norm_stats refuses a normalizing dataset
    with pytest.raises(ValueError):
        compute_norm_stats(norm)


def test_spec_masking_bounds():
    rng = np.random.default_rng(0)
    mel = np.ones((100, 128), dtype=np.float32)
    out = augment.spec_masking(mel, freqm=48, timem=48, rng=rng)
    assert out.shape == mel.shape
    # masked cells are zero, rest untouched
    assert set(np.unique(out)).issubset({0.0, 1.0})


def test_sampler_epoch_and_sharding():
    s0 = EpochShardSampler(10, shuffle=True, seed=0, world=1, rank=0)
    s0.set_epoch(0)
    a = list(s0)
    s0.set_epoch(1)
    b = list(s0)
    assert sorted(a) == list(range(10)) and a != b
    # two-way sharding covers everything with wraparound padding
    sh = [
        EpochShardSampler(10, shuffle=False, world=4, rank=r).indices()
        for r in range(4)
    ]
    assert all(len(x) == 3 for x in sh)
    assert set(sum(sh, [])) == set(range(10))
    # eval shard: unpadded, exact
    ev = [eval_shard(10, 4, r) for r in range(4)]
    assert sorted(sum(ev, [])) == list(range(10))
    assert [len(e) for e in ev] == [3, 3, 2, 2]


def test_loader_batching(corpus):
    manifest, label_csv, _ = corpus
    cfg = DataConfig(
        name="t", num_classes=5, target_length=64, norm_mean=-6.0,
        norm_std=5.0, multilabel=False, use_noise=False, loss_type="ce",
    )
    ds = AudiosetDataset(manifest, cfg, label_csv, train=False)
    dl = DataLoader(ds, batch_size=2, num_workers=2, drop_last=True)
    batches = list(dl)
    assert len(batches) == 2 == len(dl)
    x, y, ids = batches[0]
    assert x.shape == (2, 1, 64, 128) and y.shape == (2, 5) and len(ids) == 2
    dl2 = DataLoader(ds, batch_size=2, num_workers=2, drop_last=False)
    assert len(list(dl2)) == 3


def test_weighted_shard_sampler():
    from tpat_tpu.data.sampler import WeightedShardSampler

    weights = np.array([100.0] * 2 + [1.0] * 18)  # heavily favor items 0-1
    s = WeightedShardSampler(weights, shuffle=True, seed=0)
    s.set_epoch(0)
    idx = list(s)
    assert len(idx) == 20
    # favored items dominate the draw
    favored = sum(1 for i in idx if i < 2)
    assert favored > 10
    # deterministic per epoch, varies across epochs
    assert idx == list(s)
    s.set_epoch(1)
    assert idx != list(s)


@pytest.fixture(scope="module")
def voxceleb_tree(tmp_path_factory):
    """Synthetic VoxCeleb1 layout: root/wav/id100xx/clip/utt.wav +
    iden_split.txt (1=train, 3=test)."""
    root = tmp_path_factory.mktemp("vox")
    sr = 16000
    rng = np.random.default_rng(0)
    lines = []
    for s, spk in enumerate(["id10001", "id10002", "id10003"]):
        for u in range(3):
            rel = f"{spk}/clipA/{u:05d}.wav"
            p = root / "wav" / spk / "clipA"
            p.mkdir(parents=True, exist_ok=True)
            wave = 0.3 * np.sin(
                2 * math.pi * (200 + 100 * s) * np.arange(sr) / sr
            ) + 0.01 * rng.normal(size=sr)
            save_wav(str(root / "wav" / rel), wave.astype(np.float32), sr)
            split = 1 if u < 2 else 3  # 2 train, 1 test per speaker
            lines.append(f"{split} {rel}")
    (root / "iden_split.txt").write_text("\n".join(lines) + "\n")
    return str(root)


def test_voxceleb_dataset(voxceleb_tree):
    from tpat_tpu.data.datasets import VoxCeleb1Dataset

    cfg = DataConfig(
        name="voxceleb1", num_classes=3, target_length=128,
        norm_mean=-6.37, norm_std=3.074, multilabel=False,
        use_noise=False, loss_type="ce",
    )
    train = VoxCeleb1Dataset(voxceleb_tree, "train", cfg, lr_pad=True)
    test = VoxCeleb1Dataset(voxceleb_tree, "test", cfg)
    assert len(train) == 6 and len(test) == 3
    assert train.total_classes == 3

    x, y, rel = test[0]
    assert x.shape == (1, 128, 128)
    # id10001 -> speaker 1 -> one-hot index 0
    np.testing.assert_array_equal(y, [1, 0, 0])
    assert rel.startswith("id10001/")
    # deterministic eval
    x2, _, _ = test[0]
    np.testing.assert_array_equal(x, x2)
    # train with lr_pad: padding may land left or right but content rows
    # must match the unpadded fbank somewhere
    xt, yt, _ = train[0]
    assert xt.shape == (1, 128, 128)
    assert yt.sum() == 1.0


def test_voxceleb_noncontiguous_speaker_ids(tmp_path):
    """The one-hot index must come from the scanned sorted speaker map
    (dataset.py:409-417), not from id arithmetic — a non-contiguous tree
    (e.g. a corpus subset) would silently mislabel otherwise."""
    from tpat_tpu.data.datasets import VoxCeleb1Dataset

    sr = 16000
    rng = np.random.default_rng(1)
    lines = []
    speakers = ["id10007", "id10500", "id11251"]  # gaps on purpose
    for spk in speakers:
        rel = f"{spk}/clipA/00000.wav"
        p = tmp_path / "wav" / spk / "clipA"
        p.mkdir(parents=True)
        save_wav(
            str(tmp_path / "wav" / rel),
            (0.1 * rng.normal(size=sr)).astype(np.float32),
            sr,
        )
        lines.append(f"1 {rel}")
    (tmp_path / "iden_split.txt").write_text("\n".join(lines) + "\n")

    cfg = DataConfig(
        name="voxceleb1", num_classes=3, target_length=128,
        norm_mean=-6.37, norm_std=3.074, multilabel=False,
        use_noise=False, loss_type="ce",
    )
    ds = VoxCeleb1Dataset(str(tmp_path), "train", cfg)
    assert ds.total_classes == 3
    assert ds.id2class == {"id10007": 0, "id10500": 1, "id11251": 2}
    got = {}
    for i in range(3):
        _, y, rel = ds[i]
        assert y.shape == (3,) and y.sum() == 1.0
        got[rel.split("/")[0]] = int(np.argmax(y))
    assert got == ds.id2class


def test_dataset_threaded_loader_deterministic(corpus):
    """__getitem__ must not mutate shared state: the per-item generator is
    local, so concurrent threads in the loader can't cross-contaminate
    augmentation streams, and two threaded epochs replay identically."""
    manifest, label_csv, _ = corpus
    cfg = DataConfig(
        name="t", num_classes=5, target_length=128, norm_mean=-6.0,
        norm_std=5.0, multilabel=True, use_noise=True, loss_type="bce",
        mixup=0.5, freqm=8, timem=8,
    )
    ds = AudiosetDataset(
        manifest, cfg, label_csv, train=True, roll_mag_aug=True, seed=7
    )

    def epoch_batches():
        dl = DataLoader(ds, batch_size=2, num_workers=4, seed=7)
        dl.set_epoch(1)
        return [x for x, _y, _ids in dl]

    a, b = epoch_batches(), epoch_batches()
    assert len(a) == len(b) == 3
    for xa, xb in zip(a, b):
        np.testing.assert_array_equal(xa, xb)
    assert not hasattr(ds, "rng")  # no shared generator survives


def test_mixup_uses_first_files_sample_rate(corpus, monkeypatch):
    """The fbank runs at file 1's sample rate under mixup, as the
    reference passes the first file's sr (dataset.py:183-209)."""
    from tpat_tpu.data import datasets as ds_mod
    from tpat_tpu.data.wav import load_wav as real_load

    manifest, label_csv, _ = corpus
    cfg = DataConfig(
        name="t", num_classes=5, target_length=128, norm_mean=-6.0,
        norm_std=5.0, multilabel=True, use_noise=False, loss_type="bce",
        mixup=1.0,
    )
    ds = AudiosetDataset(manifest, cfg, label_csv, train=True, seed=0)

    calls = {}
    orig_paths = []

    def fake_load(path):
        wav, sr = real_load(path)
        # pretend every file after the first has a different rate
        orig_paths.append(path)
        return wav, 16000 if len(orig_paths) == 1 else 8000

    seen_srs = []

    # spy at the backend-agnostic seam: _host_fbank dispatches to numpy
    # or the native C++ kernel by core count, so patching fbank_numpy
    # would silently miss on multi-core hosts with the .so built
    def spy_fbank(wave, sr, num_mel_bins):
        seen_srs.append(sr)
        return ds_mod.fb.fbank_numpy(
            wave, ds_mod.fb.FbankConfig(sample_rate=sr,
                                        num_mel_bins=num_mel_bins)
        )

    monkeypatch.setattr(ds_mod, "load_wav", fake_load)
    monkeypatch.setattr(ds_mod, "_host_fbank", spy_fbank)
    ds[0]
    assert len(orig_paths) == 2  # mixup loaded a partner
    assert seen_srs == [16000]  # fbank ran once, at file 1's rate


def test_roll_mag_is_gain_only():
    """The reference's roll index is always 0 (randint over len of a
    (1, N) array), so roll_mag_aug must be a pure gain: same shape, a
    constant multiple of the input, nothing circularly shifted."""
    rng = np.random.default_rng(0)
    w = rng.normal(size=(1, 1000)).astype(np.float32)
    out = augment.roll_mag_aug(w, np.random.default_rng(1))
    ratio = out / w
    np.testing.assert_allclose(ratio, ratio[0, 0], rtol=1e-5)
    g = float(ratio[0, 0])
    assert 0.5 <= g <= 1.5  # Beta(10,10) + 0.5


def test_loader_propagates_worker_exception(corpus):
    """A dataset failure must raise in the consumer (torch DataLoader
    semantics), not hang the training loop forever."""
    class Boom:
        def __len__(self):
            return 8

        def __getitem__(self, i):
            if i == 5:
                raise RuntimeError("bad wav")
            return (np.zeros((1, 4, 4), np.float32),
                    np.zeros(2, np.float32), str(i))

    dl = DataLoader(Boom(), batch_size=2, num_workers=2)
    with pytest.raises(RuntimeError, match="bad wav"):
        for _ in dl:
            pass


def test_loader_early_exit_no_leak(corpus):
    """Breaking out of iteration mid-epoch must not leave the producer
    thread parked forever on a full queue."""
    import threading

    class Slowish:
        def __len__(self):
            return 64

        def __getitem__(self, i):
            return (np.zeros((1, 4, 4), np.float32),
                    np.zeros(2, np.float32), str(i))

    before = threading.active_count()
    for _ in range(5):
        it = iter(DataLoader(Slowish(), batch_size=2, num_workers=2,
                             prefetch=1))
        next(it)
        it.close()  # generator finally -> stop event
    import time as _t
    _t.sleep(0.5)  # let producers notice stop and exit
    assert threading.active_count() <= before + 2


def test_voxceleb_waveform_mode_matches_host(voxceleb_tree):
    """VoxCeleb --device_frontend: the NaN head/tail waveform contract
    must reproduce the host mel pipeline INCLUDING lr_pad's random left
    placement (same rng stream -> same pad_left draw; the NaN head of
    pad_left * window_shift samples keeps real frames bit-aligned)."""
    import jax
    import jax.numpy as jnp

    from tpat_tpu.data.datasets import VoxCeleb1Dataset
    from tpat_tpu.ops.frontend import FrontendConfig, device_frontend

    cfg = DataConfig(
        name="voxceleb1", num_classes=3, target_length=128,
        norm_mean=-6.37, norm_std=3.074, multilabel=False,
        use_noise=False, loss_type="ce",
    )
    fcfg = FrontendConfig(
        target_length=128, norm_mean=cfg.norm_mean, norm_std=cfg.norm_std
    )
    fn = jax.jit(lambda w: device_frontend(w, fcfg))
    for subset, lr_pad in [("test", False), ("train", True)]:
        wf_ds = VoxCeleb1Dataset(
            voxceleb_tree, subset, cfg, lr_pad=lr_pad, return_waveform=True
        )
        mel_ds = VoxCeleb1Dataset(voxceleb_tree, subset, cfg, lr_pad=lr_pad)
        for i in range(len(wf_ds)):
            wav, y, rel = wf_ds[i]
            assert wav.shape == (wf_ds.num_samples,)
            want, y2, rel2 = mel_ds[i]
            assert rel == rel2
            np.testing.assert_array_equal(y, y2)
            got = np.asarray(fn(jnp.asarray(wav[None])))[0]
            np.testing.assert_allclose(got, want, rtol=2e-3, atol=4e-3)
        # 1-s clips at target 128 always have a deficit (98 real frames);
        # the train stream must actually exercise a nonzero left pad
        if lr_pad:
            heads = []
            for i in range(len(wf_ds)):
                w, _, _ = wf_ds[i]
                heads.append(int(np.argmax(np.isfinite(w))))
            assert any(h > 0 for h in heads), heads
            assert all(h % 160 == 0 for h in heads), heads
