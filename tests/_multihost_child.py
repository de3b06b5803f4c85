"""Child process for the 2-host jax.distributed test
(tests/test_multihost.py).  Each process owns 2 virtual CPU devices; the
global mesh spans 4.  Rank r feeds the rows of EpochShardSampler(world=2,
rank=r) — the torch DistributedSampler contract the reference trains
under (main_finetune.py:292-294, torchrun --nproc_per_node=2)."""

import argparse
import json
import os
import sys

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rank", type=int, required=True)
    ap.add_argument("--port", type=int, required=True)
    ap.add_argument("--data", type=str, required=True)
    ap.add_argument("--out", type=str, required=True)
    args = ap.parse_args()

    os.environ["COORDINATOR_ADDRESS"] = f"localhost:{args.port}"
    os.environ["NUM_PROCESSES"] = "2"
    os.environ["PROCESS_ID"] = str(args.rank)

    import jax

    jax.config.update("jax_platforms", "cpu")  # sitecustomize override

    from tpat_tpu.config import TrainConfig, ViTConfig
    from tpat_tpu.data.sampler import EpochShardSampler, eval_shard
    from tpat_tpu.engine import evaluate as eval_lib
    from tpat_tpu.engine.train import TrainModule
    from tpat_tpu.models.vit import AudioViT
    from tpat_tpu.parallel import distributed as dist_lib
    from tpat_tpu.parallel import mesh as mesh_lib

    rank, world = dist_lib.init_distributed_mode()
    assert (rank, world) == (args.rank, 2), (rank, world)
    assert len(jax.devices()) == 4 and len(jax.local_devices()) == 2

    blob = np.load(args.data)
    X, Y = blob["x"], blob["y"]
    n = len(X)
    per_host_batch = 4

    cfg = ViTConfig(
        compute_dtype="float32",
        embed_dim=64, depth=3, num_heads=2, num_classes=4,
        target_length=64, num_mel_bins=32, drop_loc=(1,),
        base_keep_rate=0.6, drop_path_rate=0.0, attention_impl="xla",
    )
    mesh = mesh_lib.make_mesh()  # all 4 global devices
    tc = TrainConfig(
        batch_size=per_host_batch, epochs=4, blr=2e-3, warmup_epochs=1,
        shrink_start_epoch=1, shrink_epochs=1, base_keep_rate=0.6,
        drop_loc=(1,), num_hosts=world,
    )
    sampler = EpochShardSampler(n, shuffle=True, seed=3, world=world, rank=rank)
    iters = len(sampler) // per_host_batch
    mod = TrainModule(
        model=AudioViT(cfg), model_cfg=cfg, train_cfg=tc,
        loss_type="ce", iters_per_epoch=iters, mesh=mesh,
    )
    state = mod.init(np.zeros((1, 1, 64, 32), np.float32), seed=11)

    from tpat_tpu.utils import checkpoint as ckpt_lib

    def _checksum(tree):
        return float(
            sum(np.abs(np.asarray(l)).sum() for l in jax.tree_util.tree_leaves(tree))
        )

    ckpt_path = os.path.join(args.out, "mid_ckpt")
    ckpt_checksum_at_save = None
    losses = []
    for epoch in range(3):
        sampler.set_epoch(epoch)
        idx = np.asarray(sampler.indices())
        batches = [
            (X[idx[i : i + per_host_batch]], Y[idx[i : i + per_host_batch]])
            for i in range(0, iters * per_host_batch, per_host_batch)
        ]
        state, stats = mod.train_epoch(state, batches, epoch)
        losses.append(stats["loss"])
        if epoch == 1 and rank == 0:
            # the reference's rank-0-only save pattern (save_on_master,
            # util/misc.py:297-312): rank 1 proceeds straight into the
            # next epoch's collectives — a globally-collective orbax save
            # would deadlock here (utils/checkpoint.py::_checkpointer)
            ckpt_lib.save_checkpoint(ckpt_path, state, epoch)
            ckpt_checksum_at_save = _checksum(state.params)

    # dist-eval: unpadded per-host shards + cross-process gather
    eidx = eval_shard(n, world, rank)
    max_shard = -(-n // world)
    n_batches = -(-max_shard // per_host_batch)
    def ebatches():
        for b in range(n_batches):
            rows = eidx[b * per_host_batch : (b + 1) * per_host_batch]
            valid = len(rows)
            if not rows:
                rows = [eidx[-1]]
            yield X[rows], Y[rows][:valid], valid

    stats = eval_lib.evaluate_classification(
        mod.model, state.params, ebatches(), per_host_batch, mesh,
        allgather=True,
    )

    # both ranks restore the rank-0-written checkpoint (resume is called
    # by every process) and must see the identical payload
    restored = ckpt_lib.restore_checkpoint(ckpt_path)
    assert restored["epoch"] == 1, restored["epoch"]

    out = {
        "losses": losses,
        "acc1": stats["acc1"],
        "rank": rank,
        "ckpt_checksum_at_save": ckpt_checksum_at_save,
        "ckpt_checksum_restored": _checksum(restored["params"]),
    }
    with open(os.path.join(args.out, f"rank{rank}.json"), "w") as f:
        json.dump(out, f)
    print("CHILD_OK", rank)


if __name__ == "__main__":
    sys.exit(main())
