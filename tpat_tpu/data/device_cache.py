"""Device-resident dataset cache: HBM as the dataset store.

The reference streams every batch host->device each step for its whole
run (``/root/reference/audiomae/main_finetune.py:506-534`` over a torch
DataLoader).  On PCIe that costs little; on a TPU host link it is the
wall-clock bottleneck for small-corpus finetuning — an ESC-50-scale
epoch moves ~200 MB of inputs for ~0.6 s of MXU work, so the link, not
the chip, sets the epoch time (measured: ~78 s/epoch streamed vs ~2 s
cached on the v5e relay, docs/BENCH_NOTES.md "Device-resident dataset
cache").

The TPU-native fix: when the per-item pipeline is DETERMINISTIC (no
host-side augmentation), materialize the whole dataset's model inputs
once, transfer to HBM once, and serve every epoch's batches as
on-device gathers (one jitted ``take`` per step).  Batches are
bit-identical to the streaming loader's — same dataset ``__getitem__``,
same sampler order — so this changes WHERE bytes live, never what the
model sees.  Device-side augmentation (``ops/frontend``'s SpecAug /
noise on the waveform path) still runs inside the compiled step and is
unaffected.

Eligibility (``nondeterminism_reason``): mixup, roll-mag, lr_pad, and —
for the host-fbank path — SpecAug/noise all make ``__getitem__`` a
function of (seed, epoch), so any of them disables the cache.  Size is
guarded (``max_bytes``) and multi-host runs are ineligible (each
process' sampler shard walks the full index set across epochs).

A process-level registry keyed by the dataset's identity signature
shares one HBM copy across repeated driver invocations in the same
process (e.g. the twin-grid harness running many ``cli.finetune`` arms
back to back).
"""

from __future__ import annotations

import concurrent.futures as cf
from collections import OrderedDict
from typing import Iterator, List, Optional, Tuple

import numpy as np

from tpat_tpu.data.sampler import EpochShardSampler

# dataset signature -> (x_dev, y_dev, ids); tiny LRU so switching corpora
# in one process cannot accumulate stale HBM copies
_REGISTRY: "OrderedDict[tuple, tuple]" = OrderedDict()
_REGISTRY_MAX = 4
# transfer in slices so a relay stall mid-way still shows progress and no
# single RPC carries hundreds of MB
_CHUNK_BYTES = 32 << 20


def clear_cache() -> None:
    """Drop every cached device copy (frees the HBM references)."""
    _REGISTRY.clear()


def nondeterminism_reason(dataset) -> Optional[str]:
    """Why ``dataset.__getitem__`` is NOT a pure function of the index —
    or None when it is (and the cache is sound).

    Waveform mode leaves SpecAug/noise to the device frontend, so only
    the host-side draws matter there; the host-fbank path bakes them
    into the item and must have them off.
    """
    if getattr(dataset, "mixup", 0.0):
        return "waveform mixup is enabled (mixup > 0)"
    if getattr(dataset, "roll_mag", False):
        return "roll-mag augmentation is enabled"
    if getattr(dataset, "lr_pad", False):
        return "random left/right padding (lr_pad) is enabled"
    if not getattr(dataset, "return_waveform", False):
        if getattr(dataset, "freqm", 0) or getattr(dataset, "timem", 0):
            return "host-side SpecAug is enabled (freqm/timem > 0)"
        if getattr(dataset, "noise", False):
            return "host-side noise augmentation is enabled"
    return None


def _cache_key(dataset) -> tuple:
    cfg = getattr(dataset, "cfg", None)
    return (
        type(dataset).__name__,
        # datasets carry a stable `source`; fall back to object identity
        # (correct, just not shareable across constructions)
        getattr(dataset, "source", id(dataset)),
        getattr(dataset, "return_waveform", False),
        getattr(dataset, "num_samples", None),
        getattr(dataset, "skip_norm", False),
        len(dataset),
        getattr(cfg, "target_length", None),
        getattr(cfg, "num_mel_bins", None),
        getattr(cfg, "norm_mean", None),
        getattr(cfg, "norm_std", None),
    )


def estimated_bytes(dataset) -> int:
    """Size of the materialized (inputs + labels) arrays, from item 0."""
    x0, y0, _ = dataset[0]
    return len(dataset) * (
        np.asarray(x0).nbytes + np.asarray(y0).nbytes
    )


def _materialize(dataset, num_workers: int):
    """One deterministic pass over the dataset -> host arrays + ids."""
    n = len(dataset)
    x0, y0, _ = dataset[0]
    x0, y0 = np.asarray(x0), np.asarray(y0)
    xs = np.empty((n,) + x0.shape, x0.dtype)
    ys = np.empty((n,) + y0.shape, y0.dtype)
    ids: List = [None] * n

    def fill(i):
        x, y, d = dataset[i]
        xs[i], ys[i], ids[i] = x, y, d

    with cf.ThreadPoolExecutor(max_workers=max(num_workers, 1)) as pool:
        list(pool.map(fill, range(n)))
    return xs, ys, ids


def _to_device(arr: np.ndarray, label: str):
    """Chunked host->device transfer (one concatenate on device)."""
    import jax
    import jax.numpy as jnp

    rows_per_chunk = max(1, _CHUNK_BYTES // max(arr[:1].nbytes, 1))
    if rows_per_chunk >= arr.shape[0]:
        return jax.device_put(arr)
    chunks = []
    for i in range(0, arr.shape[0], rows_per_chunk):
        chunks.append(jax.device_put(arr[i : i + rows_per_chunk]))
    out = jnp.concatenate(chunks, axis=0)
    out.block_until_ready()
    return out


class DeviceCachedLoader:
    """Drop-in for ``data.loader.DataLoader`` over a deterministic
    dataset: same ``(x, y, ids)`` batch triples in the same sampler
    order, but ``x``/``y`` are device arrays gathered from one
    HBM-resident copy instead of fresh host->device streams.
    """

    def __init__(
        self,
        dataset,
        batch_size: int,
        sampler: Optional[EpochShardSampler] = None,
        shuffle: bool = False,
        num_workers: int = 4,
        drop_last: bool = False,
        seed: int = 0,
        mesh=None,
    ):
        import jax

        reason = nondeterminism_reason(dataset)
        if reason is not None:
            raise ValueError(
                f"dataset is not cacheable on device: {reason}"
            )
        if jax.process_count() > 1:
            raise ValueError(
                "device dataset cache is single-process only "
                "(per-host sampler shards walk the full index set)"
            )
        self.dataset = dataset
        self.batch_size = batch_size
        self.sampler = sampler or EpochShardSampler(
            len(dataset), shuffle=shuffle, seed=seed
        )
        self.num_workers = max(num_workers, 1)
        self.drop_last = drop_last
        self.mesh = mesh  # placement happens downstream (shard_batch)
        self._store = None  # (x_dev, y_dev, ids), filled lazily
        self._gather = None

    # -- lifecycle ------------------------------------------------------

    def set_epoch(self, epoch: int):
        self.sampler.set_epoch(epoch)
        if hasattr(self.dataset, "set_epoch"):
            self.dataset.set_epoch(epoch)

    def __len__(self):
        n = len(self.sampler)
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def _ensure_store(self):
        import jax
        import jax.numpy as jnp
        import time

        if self._store is not None:
            return
        key = _cache_key(self.dataset)
        if key in _REGISTRY:
            _REGISTRY.move_to_end(key)
            self._store = _REGISTRY[key]
        else:
            t0 = time.time()
            xs, ys, ids = _materialize(self.dataset, self.num_workers)
            t1 = time.time()
            x_dev = _to_device(xs, "x")
            y_dev = _to_device(ys, "y")
            print(
                f"[device_cache] cached {len(ids)} items "
                f"({(xs.nbytes + ys.nbytes) / 1e6:.0f} MB) on device: "
                f"materialize {t1 - t0:.1f}s, "
                f"transfer {time.time() - t1:.1f}s",
                flush=True,
            )
            self._store = (x_dev, y_dev, ids)
            _REGISTRY[key] = self._store
            while len(_REGISTRY) > _REGISTRY_MAX:
                _REGISTRY.popitem(last=False)
        if self._gather is None:
            self._gather = jax.jit(
                lambda d, l, i: (
                    jnp.take(d, i, axis=0),
                    jnp.take(l, i, axis=0),
                )
            )

    # -- iteration ------------------------------------------------------

    def __iter__(self) -> Iterator[Tuple[object, object, list]]:
        import jax.numpy as jnp

        self._ensure_store()
        x_dev, y_dev, ids = self._store
        idx = list(self.sampler)
        batches = [
            idx[i : i + self.batch_size]
            for i in range(0, len(idx), self.batch_size)
        ]
        if self.drop_last:
            batches = [b for b in batches if len(b) == self.batch_size]
        for b in batches:
            bi = jnp.asarray(np.asarray(b, np.int32))
            x, y = self._gather(x_dev, y_dev, bi)
            yield x, y, [ids[i] for i in b]


def maybe_device_cached(
    dataset,
    batch_size: int,
    *,
    sampler: Optional[EpochShardSampler] = None,
    shuffle: bool = False,
    num_workers: int = 4,
    drop_last: bool = False,
    seed: int = 0,
    mesh=None,
    mode: str = "auto",
    max_bytes: int = 2 << 30,
    label: str = "dataset",
) -> Optional[DeviceCachedLoader]:
    """Build a :class:`DeviceCachedLoader` when eligible.

    ``mode``: ``"false"`` -> always None; ``"true"`` -> required (raises
    with the reason when ineligible); ``"auto"`` -> enabled exactly when
    the cache is *semantically free* (single process, deterministic
    pipeline) and fits ``max_bytes``, else None.
    """
    import jax

    if mode == "false":
        return None
    assert mode in ("auto", "true"), mode

    def decline(reason: str):
        if mode == "true":
            raise ValueError(
                f"--device_dataset true but the {label} cannot be "
                f"cached: {reason}"
            )
        return None

    if jax.process_count() > 1:
        return decline("multi-host run")
    reason = nondeterminism_reason(dataset)
    if reason is not None:
        return decline(reason)
    est = estimated_bytes(dataset)
    if est > max_bytes:
        return decline(
            f"estimated size {est / 1e9:.2f} GB exceeds the "
            f"{max_bytes / 1e9:.2f} GB cache budget"
        )
    print(
        f"[device_cache] {label}: device-resident "
        f"({est / 1e6:.0f} MB est., {len(dataset)} items)",
        flush=True,
    )
    return DeviceCachedLoader(
        dataset, batch_size, sampler=sampler, shuffle=shuffle,
        num_workers=num_workers, drop_last=drop_last, seed=seed, mesh=mesh,
    )
