"""Checkpoint save/load (orbax) with the reference's best-tracking and
resume semantics.

Reference behavior (``/root/reference/audiomae/util/misc.py:297-335``,
``main_finetune.py:548-589``): checkpoint = {model, optimizer, epoch,
scaler, args}; best-so-far checkpoints go to a fast scratch dir (tmpfs
"ramdisk"), old ones are deleted, and only the final best is copied to the
output dir as ``best_model.pth``.  Resume restores model+optimizer+epoch.

Here: orbax PyTree checkpoints holding {params, opt_state, step, epoch};
no loss-scaler state exists (bf16 needs none — SURVEY.md §2 #25).
"""

from __future__ import annotations

import os
import shutil
import threading
from concurrent.futures import Future, ThreadPoolExecutor
from typing import Any, Dict, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp


def _to_host(tree):
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


# One jitted whole-tree copy, module-level: jax.jit caches per input
# structure, so every keeper shares it and equal-structure states reuse
# the compiled program.
_SNAPSHOT_FN = None


def _device_snapshot(state):
    """On-device copy of ``state`` with FRESH buffers.

    The train step donates its input state (engine/train.py
    donate_argnums), so merely holding a reference to the best state
    would read deleted arrays one step later; ``jnp.copy`` under a
    single jit forces distinct output buffers (no donation -> no
    aliasing) and preserves shardings.  One dispatch per call — never
    per-leaf unjitted ops, which cost ~seconds each on the TPU relay.
    """
    global _SNAPSHOT_FN
    if _SNAPSHOT_FN is None:
        import jax.numpy as jnp

        _SNAPSHOT_FN = jax.jit(
            lambda t: jax.tree_util.tree_map(jnp.copy, t)
        )
    return _SNAPSHOT_FN(state)


# One background writer, lazily created: a SINGLE worker serializes all
# async checkpoint writes (orbax commits tmp-dir+rename per save; ordering
# across saves must match submission order so "delete the previous best"
# never races the save it follows).
_WRITER_LOCK = threading.Lock()
_WRITER: Optional[ThreadPoolExecutor] = None
_PENDING: list = []


def _writer() -> ThreadPoolExecutor:
    global _WRITER
    with _WRITER_LOCK:
        if _WRITER is None:
            _WRITER = ThreadPoolExecutor(
                max_workers=1, thread_name_prefix="tpat-ckpt"
            )
        return _WRITER


def wait_for_checkpoints():
    """Block until every ``background=True`` save has committed, re-raising
    the first failure.  Call before reading a just-written checkpoint and
    before process exit (the writer thread is non-daemonic, so an exit
    without this still flushes — but silently swallows errors)."""
    global _PENDING
    with _WRITER_LOCK:
        pending, _PENDING = _PENDING, []
    _join_all(pending)


def _join_all(futures):
    """Wait on every future, THEN re-raise the first failure — later
    writes must be joined even when an earlier one failed, or the caller
    would exit with commits still in flight."""
    first = None
    for f in futures:
        try:
            f.result()
        except Exception as e:  # noqa: BLE001 — re-raised below
            if first is None:
                first = e
    if first is not None:
        raise first


def _checkpointer() -> ocp.Checkpointer:
    """PyTree checkpointer that is safe to call from a SINGLE process of a
    multi-process run.  Orbax's ``Checkpointer.save`` runs a *global*
    barrier (``multihost.sync_global_processes``); the reference's
    rank-0-only save pattern (``util/misc.py:297-312`` ``save_on_master``)
    would therefore deadlock under ``jax.distributed`` — rank 0 blocks in
    the barrier while the other ranks are already in the next epoch's
    psum.  All payloads here are replicated host numpy (``_to_host``), so
    no cross-host coordination is needed: restrict the barrier set to the
    calling process and make it the write primary."""
    if jax.process_count() == 1:
        return ocp.PyTreeCheckpointer()
    me = jax.process_index()
    mp = ocp.options.MultiprocessingOptions(
        primary_host=me,
        active_processes={me},
        barrier_sync_key_prefix=f"tpat-proc-{me}",
    )
    return ocp.Checkpointer(
        ocp.PyTreeCheckpointHandler(multiprocessing_options=mp),
        multiprocessing_options=mp,
    )


def save_checkpoint(
    path: str,
    state,
    epoch: int,
    extra: Optional[Dict] = None,
    *,
    background: bool = False,
) -> Optional[Future]:
    """Write {params, opt_state, step, epoch} to ``path``.

    ``background=True`` overlaps the disk write with training: the
    device->host fetch still happens here (jax arrays are immutable, so
    the fetched payload is a consistent snapshot no later step can
    mutate), but the orbax serialize+commit runs on the single background
    writer thread.  Returns the Future; ``wait_for_checkpoints()`` (or
    ``future.result()``) must run before the file is read back or the
    process exits, to surface write errors.
    """
    path = os.path.abspath(path)
    payload = {
        "params": _to_host(state.params),
        "opt_state": _to_host(state.opt_state),
        "step": int(state.step),
        "epoch": int(epoch),
    }
    if extra:
        payload["extra"] = extra
    if not background:
        _checkpointer().save(path, payload, force=True)
        return None
    fut = _writer().submit(
        lambda: _checkpointer().save(path, payload, force=True)
    )
    with _WRITER_LOCK:
        _PENDING.append(fut)
    return fut


def restore_checkpoint(path: str, template: Optional[Dict] = None) -> Dict:
    ckptr = _checkpointer()
    if template is not None:
        return ckptr.restore(path, item=template)
    return ckptr.restore(path)


class BestCheckpointKeeper:
    """Keep only the best checkpoint in a scratch dir; finalize by copying
    it to the output dir and writing the ``best-{epoch:03d}-{score}.txt``
    marker (main_finetune.py:548-589)."""

    def __init__(
        self,
        scratch_dir: str,
        output_dir: str,
        ties: str = "last",
        async_save: bool = False,
        snapshot_on_device: bool = False,
    ):
        self.scratch_dir = scratch_dir
        self.output_dir = output_dir
        os.makedirs(scratch_dir, exist_ok=True)
        os.makedirs(output_dir, exist_ok=True)
        self.best_score = float("-inf")
        self.best_epoch = -1
        if ties not in ("last", "first"):
            raise ValueError(f"ties must be 'last' or 'first', got {ties!r}")
        self.ties = ties
        # async_save overlaps the save+prune disk work with the next
        # epoch's training on the background writer; ``finalize`` joins
        # and re-raises, so a failed write cannot silently lose the best.
        self.async_save = async_save
        self._futures: list = []
        # snapshot_on_device keeps the best state as an HBM-resident copy
        # and touches disk ONLY in finalize: one device->host fetch per
        # RUN instead of one per improving/tie epoch.  On the axon relay
        # the per-epoch fetch of a ViT-B state (~1 GB) costs ~60 s, which
        # dominates a device-cached epoch (<1 s) — this mode is what makes
        # multi-arm harnesses (the twin grid) feasible.  Trade-off: a
        # crash before finalize loses the best (nothing is persisted
        # mid-run), so prefer async_save for long single runs and
        # snapshot_on_device for many short arms.  Costs one extra state
        # copy of HBM (~1 GB for ViT-B f32 state; v5e has 16 GB).
        self.snapshot_on_device = snapshot_on_device
        self._snapshot = None  # (device state copy, epoch)

    def track(self, score: float, epoch: int) -> bool:
        """Update best_score/best_epoch per the tie rule WITHOUT touching
        disk — for non-main ranks that compute the same collective score
        but must not write checkpoints (artifact writes are rank-0-gated);
        without this they would report the initial -inf forever.

        Phrased as a positive comparison so a NaN score can never become
        (or dethrone) the best: the reference's ``max_score <=
        test_stats[metric]`` (main_finetune.py:548) likewise leaves
        max_score untouched on NaN — the inverted-negation form
        (``not (score < best)``) would instead let NaN in and then let
        ANY later score replace it."""
        improved = score > self.best_score or (
            self.ties == "last" and score == self.best_score
        )
        if not improved:
            return False
        self.best_score = score
        self.best_epoch = epoch
        return True

    def update(self, score: float, state, epoch: int) -> bool:
        """Tie semantics differ between the two reference drivers:
        AudioMAE keeps the LAST epoch achieving >= max score
        (main_finetune.py:548: ``max_score <= test_stats[metric]``),
        AST keeps the FIRST (traintest.py:236-247: strict ``>``) —
        select with ``ties``.

        The new checkpoint is saved BEFORE the previous best is deleted:
        a failed save (disk full, interrupt mid-write) must not lose both.
        The price is ~2x peak scratch usage while both exist — inherent
        to crash-safety (a rename frees nothing) — so size a ramdisk
        scratch dir for two checkpoints, not one.
        """
        prev = (self.best_score, self.best_epoch)
        if not self.track(score, epoch):
            return False
        if self.snapshot_on_device:
            # no disk, no host fetch: replace the HBM-resident best copy
            # (tie-saves replace it too, preserving the ties rule above)
            self._snapshot = (_device_snapshot(state), epoch)
            return True
        new_name = f"checkpoint-{epoch:03d}"
        new_path = os.path.join(self.scratch_dir, new_name)

        def prune(save_fut: Optional[Future] = None):
            # Save-before-delete is the crash-safety contract (docstring
            # above): if the save failed, the previous best must survive.
            if save_fut is not None and save_fut.exception() is not None:
                # Re-arm tracking: with best_score left at the failed
                # epoch's score, a later score that is lower but better
                # than anything actually ON DISK would never be saved and
                # the run would end with only a stale checkpoint.  Roll
                # back to the pre-update best — unless a newer best has
                # already superseded this epoch (single-writer ordering
                # makes that visible here).  Benign race with the caller
                # thread's next track(): worst case one epoch sees the
                # stale best and the re-arm takes effect the epoch after.
                if (self.best_score, self.best_epoch) == (score, epoch):
                    self.best_score, self.best_epoch = prev
                print(
                    f"[checkpoint] WARNING: async save of {new_name} "
                    f"failed ({save_fut.exception()!r}); best tracking "
                    f"rolled back to epoch {self.best_epoch}",
                    flush=True,
                )
                return
            for old in os.listdir(self.scratch_dir):
                if old.startswith("checkpoint-") and old != new_name:
                    shutil.rmtree(
                        os.path.join(self.scratch_dir, old),
                        ignore_errors=True,
                    )

        if self.async_save:
            # The device->host fetch MUST happen here, on the caller
            # thread, before returning: the train step is jitted with
            # donated state (engine/train.py donate_argnums), so by the
            # time the writer thread runs, the next epoch's first step
            # has already invalidated ``state``'s device buffers and a
            # deferred _to_host reads deleted arrays.
            # save_checkpoint(background=True) fetches eagerly and only
            # defers the orbax serialize+commit; the prune rides the same
            # single-worker executor, so save-before-prune ordering holds
            # and ``save_fut`` is already resolved when prune runs.
            save_fut = save_checkpoint(new_path, state, epoch, background=True)
            self._futures.append(save_fut)
            fut = _writer().submit(prune, save_fut)
            with _WRITER_LOCK:
                _PENDING.append(fut)
            self._futures.append(fut)
        else:
            save_checkpoint(new_path, state, epoch)
            prune()
        return True

    def finalize(self):
        # Join async writes collecting failures, but SECURE THE BEST
        # CHECKPOINT FIRST: a failed save was already rolled back by its
        # prune job, so best_epoch points at the best checkpoint that
        # actually committed — copy it to the output dir before
        # re-raising, so a loud failure never destroys the best
        # recoverable model (the pre-round-4 order raised first and lost
        # it).
        if self._snapshot is not None:
            # snapshot mode's single device->host fetch + write: land the
            # HBM-resident best in the scratch dir so the marker/copy
            # logic below sees the same layout as the per-epoch modes
            snap, epoch = self._snapshot
            save_checkpoint(
                os.path.join(self.scratch_dir, f"checkpoint-{epoch:03d}"),
                snap,
                epoch,
            )
            self._snapshot = None
        pending, self._futures = self._futures, []
        errors = []
        for f in pending:
            try:
                f.result()
            except Exception as e:  # noqa: BLE001 — re-raised below
                errors.append(e)
        dst = None
        if self.best_epoch >= 0:
            marker = os.path.join(
                self.output_dir,
                f"best-{self.best_epoch:03d}-{self.best_score:.4f}.txt",
            )
            open(marker, "w").close()
            src = os.path.join(
                self.scratch_dir, f"checkpoint-{self.best_epoch:03d}"
            )
            dst = os.path.join(self.output_dir, "best_model")
            if os.path.exists(dst):
                shutil.rmtree(dst)
            shutil.copytree(src, dst)
            for old in os.listdir(self.scratch_dir):
                if old.startswith("checkpoint-"):
                    shutil.rmtree(
                        os.path.join(self.scratch_dir, old), ignore_errors=True
                    )
        if errors:
            raise errors[0]
        return dst
