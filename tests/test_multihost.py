"""Real 2-process ``jax.distributed`` test (VERDICT r2 #3).

Two child processes (tests/_multihost_child.py), each owning 2 virtual CPU
devices, join a coordinator and train the tiny ViT over the global 4-device
mesh, each feeding ONLY its ``EpochShardSampler(world=2, rank)`` shard —
the torch DistributedSampler contract the reference runs under
(``main_finetune.py:292-294``, torchrun ``--nproc_per_node=2``).  The
parent reproduces the identical global batches single-process on a local
4-device mesh; per-epoch losses must agree, and the children's gathered
unpadded dist-eval (DistributedEvalSampler semantics) must agree with the
parent's full-set eval.
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

N, B_HOST, CLASSES = 16, 4, 4


def _dataset():
    rng = np.random.default_rng(42)
    y_idx = rng.integers(0, CLASSES, size=N)
    x = rng.normal(size=(N, 1, 64, 32)).astype(np.float32)
    x[np.arange(N), 0, 0, 0] = y_idx * 2.0
    y = np.eye(CLASSES, dtype=np.float32)[y_idx]
    return x, y


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_distributed_matches_single_process(tmp_path):
    X, Y = _dataset()
    np.savez(tmp_path / "data.npz", x=X, y=Y)

    port = _free_port()
    env_base = dict(os.environ)
    env_base["PYTHONPATH"] = REPO + os.pathsep + env_base.get("PYTHONPATH", "")
    env_base["JAX_PLATFORMS"] = "cpu"
    env_base["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    # never inherit a coordinator from an outer run
    for k in ("COORDINATOR_ADDRESS", "NUM_PROCESSES", "PROCESS_ID"):
        env_base.pop(k, None)

    procs = []
    for rank in (0, 1):
        procs.append(
            subprocess.Popen(
                [
                    sys.executable,
                    os.path.join(REPO, "tests", "_multihost_child.py"),
                    "--rank", str(rank), "--port", str(port),
                    "--data", str(tmp_path / "data.npz"),
                    "--out", str(tmp_path),
                ],
                env=env_base,
                stdout=subprocess.PIPE,
                stderr=subprocess.STDOUT,
                text=True,
            )
        )
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=540)
        outs.append(out)
    for rank, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"rank {rank} failed:\n{out[-4000:]}"

    child = [
        json.load(open(tmp_path / f"rank{r}.json")) for r in (0, 1)
    ]
    # both hosts observe the same replicated metrics
    np.testing.assert_allclose(child[0]["losses"], child[1]["losses"], rtol=0)
    assert child[0]["acc1"] == child[1]["acc1"]

    # the rank-0-only mid-training save must not deadlock (orbax barriers
    # restricted to the saving process) and must round-trip bit-exactly
    # through both ranks' restore
    assert child[0]["ckpt_checksum_at_save"] is not None
    assert child[0]["ckpt_checksum_restored"] == child[0]["ckpt_checksum_at_save"]
    assert child[1]["ckpt_checksum_restored"] == child[0]["ckpt_checksum_at_save"]

    # ---- single-process baseline over the SAME global batches ----------
    from tpat_tpu.config import TrainConfig, ViTConfig
    from tpat_tpu.data.sampler import EpochShardSampler
    from tpat_tpu.engine import evaluate as eval_lib
    from tpat_tpu.engine.train import TrainModule
    from tpat_tpu.models.vit import AudioViT
    from tpat_tpu.parallel import mesh as mesh_lib

    cfg = ViTConfig(
        compute_dtype="float32",
        embed_dim=64, depth=3, num_heads=2, num_classes=CLASSES,
        target_length=64, num_mel_bins=32, drop_loc=(1,),
        base_keep_rate=0.6, drop_path_rate=0.0, attention_impl="xla",
    )
    mesh = mesh_lib.make_mesh(n_devices=4)
    tc = TrainConfig(
        batch_size=2 * B_HOST, epochs=4, blr=2e-3, warmup_epochs=1,
        shrink_start_epoch=1, shrink_epochs=1, base_keep_rate=0.6,
        drop_loc=(1,), num_hosts=1,  # eff batch 8 == child 4 * 2 hosts
    )
    samplers = [
        EpochShardSampler(N, shuffle=True, seed=3, world=2, rank=r)
        for r in (0, 1)
    ]
    iters = len(samplers[0]) // B_HOST
    mod = TrainModule(
        model=AudioViT(cfg), model_cfg=cfg, train_cfg=tc,
        loss_type="ce", iters_per_epoch=iters, mesh=mesh,
    )
    state = mod.init(np.zeros((1, 1, 64, 32), np.float32), seed=11)
    losses = []
    for epoch in range(3):
        for s in samplers:
            s.set_epoch(epoch)
        shards = [np.asarray(s.indices()) for s in samplers]
        batches = [
            (
                X[np.concatenate([sh[i : i + B_HOST] for sh in shards])],
                Y[np.concatenate([sh[i : i + B_HOST] for sh in shards])],
            )
            for i in range(0, iters * B_HOST, B_HOST)
        ]
        state, stats = mod.train_epoch(state, batches, epoch)
        losses.append(stats["loss"])

    np.testing.assert_allclose(child[0]["losses"], losses, rtol=2e-4)

    ebatches = (
        (X[i : i + 2 * B_HOST], Y[i : i + 2 * B_HOST])
        for i in range(0, N, 2 * B_HOST)
    )
    stats = eval_lib.evaluate_classification(
        mod.model, state.params, ebatches, 2 * B_HOST, mesh
    )
    assert child[0]["acc1"] == pytest.approx(stats["acc1"], abs=1e-9)
