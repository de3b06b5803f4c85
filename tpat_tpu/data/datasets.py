"""Host-side datasets mirroring the reference data pipeline.

- ``AudiosetDataset`` (``/root/reference/audiomae/dataset.py:128-306``,
  near-duplicate ``ast/src/dataloader.py:57-219``): JSON manifest
  ``{"data": [{"wav": path, "labels": "/m/x,/m/y"}]}`` + label CSV
  ``(index, mid, display_name)``; per-item pipeline wav -> DC removal ->
  [roll-mag] -> [waveform mixup w/ soft labels] -> Kaldi fbank ->
  pad-with-min/crop -> [SpecAug] -> (x - mean)/(2 std) -> [noise].
- ``VoxCeleb1Dataset`` (``dataset.py:310-417``): identification split via
  ``iden_split.txt``, 1251-speaker one-hot labels, optional random
  left/right padding split (lr_pad).

Decoding and fbank run on the host (numpy); the engine can alternatively
take raw padded waveforms and run the batched JAX fbank on-device
(``ops/fbank.fbank_jax``).
"""

from __future__ import annotations

import csv
import json
import os
from typing import Dict, List, Optional, Tuple

import numpy as np

from tpat_tpu.config import DataConfig
from tpat_tpu.data import augment
from tpat_tpu.data.wav import load_wav
from tpat_tpu.ops import fbank as fb


def _host_fbank(wav: np.ndarray, sr: int, num_mel_bins: int) -> np.ndarray:
    """Kaldi fbank for the host pipeline, backend chosen by core count.

    The pure-numpy path is faster single-threaded (pocketfft) but holds
    the GIL through its Python framing loop, so the threaded DataLoader
    cannot scale it across cores; the native C++ kernel releases the GIL
    for the whole computation and parallelizes cleanly under the loader's
    thread pool.  Measured on this image's 1-core host: numpy 2.8 ms vs
    native 4.5 ms per 5-s clip, identical at any worker count — so on a
    single core numpy wins; on the multi-core hosts real TPU VMs have,
    the GIL-free native path is the one that scales.  Both implement the
    same Kaldi spec (hanning, dither 0, htk_compat) and agree to ~1e-4
    (tests/test_native_frontend.py); TPAT_DISABLE_NATIVE=1 forces numpy."""
    from tpat_tpu.data import native

    try:
        # affinity-aware: in a container/SLURM task pinned to one core of
        # a many-core machine there is no parallelism for the GIL-free
        # path to exploit, and single-threaded numpy wins
        n_cores = len(os.sched_getaffinity(0))
    except AttributeError:  # non-Linux
        n_cores = os.cpu_count() or 1
    if native.available() and n_cores > 1:
        return native.fbank(wav, sr, num_mel_bins)
    return fb.fbank_numpy(
        wav, fb.FbankConfig(sample_rate=sr, num_mel_bins=num_mel_bins)
    )


def make_index_dict(label_csv: str) -> Dict[str, int]:
    """mid -> class index (dataset.py:101-109)."""
    out = {}
    with open(label_csv) as f:
        for row in csv.DictReader(f):
            out[row["mid"]] = int(row["index"])
    return out


def make_name_dict(label_csv: str) -> Dict[int, str]:
    """class index -> display name (dataset.py:111-119)."""
    out = {}
    with open(label_csv) as f:
        for row in csv.DictReader(f):
            out[int(row["index"])] = row["display_name"]
    return out


class AudiosetDataset:
    def __init__(
        self,
        manifest_json: str,
        data_cfg: DataConfig,
        label_csv: str,
        train: bool = True,
        roll_mag_aug: bool = False,
        seed: int = 0,
        return_waveform: bool = False,
        num_samples: Optional[int] = None,
        skip_norm: bool = False,
    ):
        with open(manifest_json) as f:
            self.data: List[dict] = json.load(f)["data"]
        # identity signature for the device cache registry
        # (data/device_cache.py): same manifest + label map -> same items
        self.source = (os.path.abspath(manifest_json),
                       os.path.abspath(label_csv))
        self.cfg = data_cfg
        # waveform mode: emit fixed-length raw audio; fbank + SpecAug +
        # normalization then run batched ON DEVICE (ops/frontend.py) —
        # the north-star fused preprocessing path.
        self.return_waveform = return_waveform
        if return_waveform and num_samples is None:
            # frames -> samples for the snip-edges framing: covering
            # target_length frames needs (target-1)*shift + window samples
            num_samples = (data_cfg.target_length - 1) * 160 + 400
        self.num_samples = num_samples
        self.train = train
        self.index_dict = make_index_dict(label_csv)
        self.label_num = len(self.index_dict)
        self.roll_mag = roll_mag_aug and train
        # mutable aug knobs — the engine zeroes them when shrink starts
        # (main_finetune.py:518-522)
        self.freqm = data_cfg.freqm if train else 0
        self.timem = data_cfg.timem if train else 0
        self.mixup = data_cfg.mixup if train else 0.0
        self.noise = data_cfg.use_noise and train
        # skip_norm: emit UN-normalized fbanks so (mean, std) for a new
        # dataset can be computed (ast/src/dataloader.py:82-88, 203-207)
        self.skip_norm = skip_norm
        self.seed = seed
        self.epoch = 0  # set by the loader each epoch

    def set_epoch(self, epoch: int):
        self.epoch = epoch

    def __len__(self):
        return len(self.data)

    def _load_centered(self, path: str, rng) -> Tuple[np.ndarray, int]:
        wav, sr = load_wav(path)
        wav = wav - wav.mean()
        if self.roll_mag:
            wav = augment.roll_mag_aug(wav, rng)
        return wav, sr

    def _wav2fbank(self, path: str, rng, path2: Optional[str] = None):
        # mixup keeps file 1's sample rate for the fbank, exactly as the
        # reference passes the first file's sr (dataset.py:183-209)
        w1, sr = self._load_centered(path, rng)
        lam = 0.0
        if path2 is not None:
            w2, _ = self._load_centered(path2, rng)
            w1, lam = augment.mixup_waveforms(w1, w2, rng)
        mel = _host_fbank(w1[0], sr, self.cfg.num_mel_bins)
        mel = fb.pad_or_crop(mel, self.cfg.target_length)
        return mel, lam

    def _fixed_waveform(self, path: str, rng, path2: Optional[str] = None):
        w1, _ = self._load_centered(path, rng)
        if path2 is not None:
            w2, _ = self._load_centered(path2, rng)
            w1, lam = augment.mixup_waveforms(w1, w2, rng)
        else:
            lam = 0.0
        wav = w1.reshape(-1)
        n = self.num_samples
        if len(wav) < n:
            # NaN tail, not zeros: device_frontend recovers the true
            # length from the NaN run and min-fills the frames a shorter
            # clip cannot produce, matching the reference's compute-
            # fbank-on-the-unpadded-clip-then-pad-mel-with-min semantics
            # (dataset.py:218-225).  NaN cannot occur in decoded PCM.
            wav = np.pad(
                wav, (0, n - len(wav)), constant_values=np.nan
            )
        else:
            wav = wav[:n]
        return wav.astype(np.float32), lam

    def __getitem__(self, index: int) -> Tuple[np.ndarray, np.ndarray, str]:
        # per-(seed, epoch, index) generator, LOCAL to this call: the
        # threaded loader runs __getitem__ concurrently on one dataset
        # object, so the generator must never live on self
        rng = np.random.default_rng((self.seed, self.epoch, index))
        datum = self.data[index]
        labels = np.zeros(self.label_num, dtype=np.float32)
        do_mixup = rng.random() < self.mixup
        partner = (
            self.data[int(rng.integers(len(self.data)))]
            if do_mixup
            else None
        )

        if self.return_waveform:
            wav, lam = self._fixed_waveform(
                datum["wav"], rng, partner["wav"] if partner else None
            )
            if partner is not None:
                for s in datum["labels"].split(","):
                    labels[self.index_dict[s.strip()]] += lam
                for s in partner["labels"].split(","):
                    labels[self.index_dict[s.strip()]] += 1.0 - lam
            else:
                for s in datum["labels"].split(","):
                    labels[self.index_dict[s.strip()]] = 1.0
            return wav, labels, datum["wav"]

        if do_mixup:
            mel, lam = self._wav2fbank(datum["wav"], rng, partner["wav"])
            for s in datum["labels"].split(","):
                labels[self.index_dict[s.strip()]] += lam
            for s in partner["labels"].split(","):
                labels[self.index_dict[s.strip()]] += 1.0 - lam
        else:
            mel, _ = self._wav2fbank(datum["wav"], rng)
            for s in datum["labels"].split(","):
                labels[self.index_dict[s.strip()]] = 1.0

        if self.freqm or self.timem:
            mel = augment.spec_masking(mel, self.freqm, self.timem, rng)
        if not self.skip_norm:
            mel = fb.normalize(mel, self.cfg.norm_mean, self.cfg.norm_std)
        if self.noise:
            mel = augment.noise_aug(mel, rng)
        return mel[None].astype(np.float32), labels, datum["wav"]


class VoxCeleb1Dataset:
    """Speaker identification over a VoxCeleb1 directory tree:
    ``root/wav/id10001/<clip>/<utt>.wav`` with the standard
    ``iden_split.txt`` (1=train, 2=dev, 3=test).  The reference maps
    subset 'train'->1 and 'test'->3 and one-hots 1251 speakers
    (dataset.py:310-417)."""

    SPLIT = {"train": 1, "dev": 2, "test": 3}

    def __init__(
        self,
        root: str,
        subset: str,
        data_cfg: DataConfig,
        lr_pad: bool = False,
        seed: int = 0,
        skip_norm: bool = False,
        return_waveform: bool = False,
        num_samples: Optional[int] = None,
    ):
        assert subset in ("train", "test")
        self.root = root
        # identity signature for the device cache registry
        self.source = (os.path.abspath(root), subset)
        self.cfg = data_cfg
        # waveform mode (--device_frontend): emit fixed-length raw audio
        # with the NaN head/tail contract of ops/frontend.device_frontend
        # — lr_pad's random left pad becomes a NaN head of
        # pad_left * window_shift samples (frame-exact, see frontend.py)
        self.return_waveform = return_waveform
        if return_waveform and num_samples is None:
            num_samples = (data_cfg.target_length - 1) * 160 + 400
        self.num_samples = num_samples
        self.train = subset == "train"
        self.lr_pad = lr_pad and self.train
        self.freqm = data_cfg.freqm if self.train else 0
        self.timem = data_cfg.timem if self.train else 0
        self.noise = data_cfg.use_noise and self.train
        self.roll_mag = data_cfg.roll_mag_aug and self.train
        self.skip_norm = skip_norm
        self.seed = seed
        self.epoch = 0

        split_file = os.path.join(root, "iden_split.txt")
        want = self.SPLIT[subset]
        self.files: List[str] = []
        with open(split_file) as f:
            for line in f:
                part, rel = line.split()
                if int(part) == want:
                    self.files.append(rel)
        # Speaker map from a sorted directory scan (dataset.py:409-417's
        # _map_spk_id).  The label index comes from this map — on the full
        # contiguous id10001..id11251 corpus it equals the reference's
        # runtime one-hot index (speaker_id - 1, dataset.py:398-400), and
        # unlike that arithmetic it stays correct on subset or
        # non-contiguous speaker trees.
        speakers = sorted(set(self._scan_speakers()))
        self.id2class: Dict[str, int] = {s: i for i, s in enumerate(speakers)}
        self.total_classes = len(speakers)

    def _scan_speakers(self):
        base = os.path.join(self.root, "wav")
        return [d for d in os.listdir(base) if d.startswith("id")]

    def __len__(self):
        return len(self.files)

    def set_epoch(self, epoch: int):
        self.epoch = epoch

    def __getitem__(self, index: int):
        # local per-call generator — see AudiosetDataset.__getitem__
        rng = np.random.default_rng((self.seed, self.epoch, index))
        rel = self.files[index]
        label = np.zeros(self.total_classes, dtype=np.float32)
        label[self.id2class[rel.split("/")[0]]] = 1.0

        wav, sr = load_wav(os.path.join(self.root, "wav", rel))
        wav = wav - wav.mean()
        if self.roll_mag:
            wav = augment.roll_mag_aug(wav, rng)

        if self.return_waveform:
            assert sr == 16000, "waveform mode assumes 16 kHz (VoxCeleb1)"
            flat = wav.reshape(-1)
            n, shift, window = self.num_samples, 160, 400
            out = np.full(n, np.nan, dtype=np.float32)
            if len(flat) >= n:
                out[:] = flat[:n]
            else:
                # the same pad_left draw as the mel path below, in frames
                real_frames = (
                    1 + (len(flat) - window) // shift
                    if len(flat) >= window
                    else 0
                )
                deficit = self.cfg.target_length - real_frames
                pad_left = (
                    int(rng.integers(0, deficit + 1))
                    if (self.lr_pad and deficit > 0)
                    else 0
                )
                start = pad_left * shift
                m = min(len(flat), n - start)
                out[start : start + m] = flat[:m]
            return out, label, rel

        mel = _host_fbank(wav[0], sr, self.cfg.num_mel_bins)
        pad_left = 0
        deficit = self.cfg.target_length - mel.shape[0]
        if self.lr_pad and deficit > 0:
            pad_left = int(rng.integers(0, deficit + 1))
        mel = fb.pad_or_crop(mel, self.cfg.target_length, pad_left=pad_left)
        if self.freqm or self.timem:
            mel = augment.spec_masking(mel, self.freqm, self.timem, rng)
        if not self.skip_norm:
            mel = fb.normalize(mel, self.cfg.norm_mean, self.cfg.norm_std)
        if self.noise:
            mel = augment.noise_aug(mel, rng)
        return mel[None].astype(np.float32), label, rel
