"""MAE pretraining driver.

The reference *references* a ``main_pretrain.py`` (``run_pretrain.sh:18``)
that does not exist in the repo (SURVEY.md §2 #6) — this driver completes
the workflow: masked-autoencoder pretraining on spectrograms with the MAE
recipe (AdamW betas (0.9, 0.95), lr = blr * eff_batch / 256, per-iteration
warmup + cosine, bf16-ready), SPMD over the data mesh, orbax checkpoints
whose encoder weights feed directly into the finetune driver.  Multi-host:
``init_distributed_mode`` + per-host ``EpochShardSampler`` shards, the
same contract as ``cli/finetune.py`` (each host loads and feeds only its
rows; rank 0 writes logs/checkpoints/exports).
"""

from __future__ import annotations

import argparse
import json
import os
import time
from pathlib import Path

import numpy as np

from tpat_tpu.cli import str2bool


def get_args_parser():
    p = argparse.ArgumentParser("tpat_tpu MAE pretraining", add_help=False)
    p.add_argument("--batch_size", default=64, type=int)
    p.add_argument("--epochs", default=32, type=int)
    p.add_argument("--blr", type=float, default=2e-4)
    p.add_argument("--lr", type=float, default=None)
    p.add_argument("--min_lr", type=float, default=0.0)
    p.add_argument("--warmup_epochs", type=float, default=4)
    p.add_argument("--weight_decay", type=float, default=0.0001)
    p.add_argument("--mask_ratio", default=0.8, type=float)
    p.add_argument("--mask_2d", action="store_true")
    p.add_argument("--mask_t_prob", default=0.7, type=float)
    p.add_argument("--mask_f_prob", default=0.3, type=float)
    p.add_argument("--norm_pix_loss", action="store_true")
    p.add_argument("--decoder_mode", default=1, type=int)
    p.add_argument("--dataset", default="audioset")
    p.add_argument("--target_length", default=None, type=int,
                   help="override the preset's frame count")
    p.add_argument("--data_train", required=True)
    p.add_argument("--label_csv", required=True)
    p.add_argument("--roll_mag_aug", default=True, type=str2bool)
    p.add_argument("--output_dir", default="./pretrain_out")
    p.add_argument("--num_workers", default=4, type=int)
    p.add_argument("--seed", default=0, type=int)
    p.add_argument("--save_every_epochs", default=4, type=int)
    p.add_argument("--async_checkpoint", type=str2bool, default=False,
                   help="overlap periodic checkpoint disk writes with "
                        "the next epoch (joined before exit)")
    # bf16 = the TPU form of the reference's AMP training; f32 opt-out
    p.add_argument(
        "--compute_dtype", default="bfloat16",
        choices=["bfloat16", "float32"],
    )
    # escape hatch for the polynomial bf16 GELU (ops/fast_gelu.py):
    # 'exact' forces erf even under bfloat16
    p.add_argument(
        "--gelu_impl", default="auto", choices=["auto", "exact", "poly"],
    )
    p.add_argument("--resume", default="",
                   help="orbax checkpoint dir to resume from, or a "
                        "reference-layout full-MAE .pth to continue "
                        "pretraining from (fresh optimizer)")
    p.add_argument("--export_torch", default=True, type=str2bool,
                   help="also write mae_pretrained.pth (reference "
                        "models_mae.py layout) at the end")
    p.add_argument("--model", default="mae_vit_base",
                   choices=["mae_vit_base", "mae_vit_tiny"])
    return p


def main(args):
    import jax
    import jax.numpy as jnp

    from tpat_tpu import config as cfg_lib
    from tpat_tpu.data.datasets import AudiosetDataset
    from tpat_tpu.data.loader import DataLoader
    from tpat_tpu.data.sampler import EpochShardSampler
    from tpat_tpu.engine import pretrain as pretrain_lib
    from tpat_tpu.parallel import distributed as dist_lib
    from tpat_tpu.engine import schedules
    from tpat_tpu.models.mae import MAEConfig, MaskedAutoencoderViT, mae_vit_base_dec512d8b
    from tpat_tpu.parallel import mesh as mesh_lib
    from tpat_tpu.utils import checkpoint as ckpt_lib

    preset = cfg_lib.DATASET_PRESETS[args.dataset]
    import dataclasses

    data_cfg = dataclasses.replace(preset, freqm=0, timem=0, mixup=0.0)
    if args.target_length:
        data_cfg = dataclasses.replace(
            data_cfg, target_length=args.target_length
        )
    ds = AudiosetDataset(
        args.data_train, data_cfg, args.label_csv, train=True,
        roll_mag_aug=args.roll_mag_aug, seed=args.seed,
    )
    # Multi-host: same contract as cli/finetune.py — each process loads
    # only its sampler shard and feeds --batch_size local rows; the
    # global batch (batch_size * world) is assembled by mesh.shard_batch.
    rank, world = dist_lib.init_distributed_mode()
    is_main = rank == 0
    if world > 1:
        assert args.batch_size % jax.local_device_count() == 0, (
            f"per-host batch {args.batch_size} must be a multiple of the "
            f"local device count {jax.local_device_count()}"
        )
    loader = DataLoader(
        ds, args.batch_size,
        sampler=EpochShardSampler(
            len(ds), shuffle=True, seed=args.seed, world=world, rank=rank,
        ),
        num_workers=args.num_workers, drop_last=True,
    )

    common = dict(
        target_length=data_cfg.target_length,
        num_mel_bins=data_cfg.num_mel_bins,
        decoder_mode=args.decoder_mode,
        norm_pix_loss=args.norm_pix_loss,
        mask_2d=args.mask_2d,
        mask_t_prob=args.mask_t_prob,
        mask_f_prob=args.mask_f_prob,
        compute_dtype=args.compute_dtype,
        gelu_impl=args.gelu_impl,
    )
    if args.model == "mae_vit_base":
        cfg = mae_vit_base_dec512d8b(**common)
    else:
        cfg = MAEConfig(
            # depth 6 matches config.audiomae_vit_tiny so a tiny pretrain's
            # encoder feeds the tiny finetune model end-to-end (the same
            # depth-parity the reference keeps between models_mae.py and
            # models_vit.py at base scale)
            embed_dim=192, depth=6, num_heads=3, decoder_embed_dim=128,
            decoder_depth=2, decoder_num_heads=4, **common,
        )
    model = MaskedAutoencoderViT(cfg)

    mesh = mesh_lib.make_mesh()
    # blr scales by the GLOBAL effective batch (batch_size per host x
    # world), the MAE lr convention the reference keeps for finetune
    # (main_finetune.py:443-449 eff_batch_size)
    lr = args.lr if args.lr else args.blr * args.batch_size * world / 256.0

    x0 = jnp.zeros((1, 1, cfg.target_length, cfg.num_mel_bins))
    params = model.init(
        {"params": jax.random.PRNGKey(args.seed),
         "masking": jax.random.PRNGKey(1)},
        x0, args.mask_ratio,
    )["params"]

    iters_per_epoch = len(loader)

    def lr_fn(step):
        return schedules.warmup_cosine_lr(
            step / iters_per_epoch,
            lr=lr, min_lr=args.min_lr,
            warmup_epochs=args.warmup_epochs, total_epochs=args.epochs,
        )

    tx = pretrain_lib.make_mae_optimizer(
        params, lr_fn=lr_fn, weight_decay=args.weight_decay,
        pos_trainable=cfg.pos_trainable,
    )
    opt_state = tx.init(params)
    rng = jax.random.PRNGKey(args.seed)
    step = 0
    start_epoch = 0
    if args.resume and args.resume.endswith(".pth"):
        # a reference-layout torch checkpoint (models_mae.py full MAE:
        # encoder + decoder): continue pretraining from its weights with
        # a fresh optimizer/schedule — the reference's released
        # pretrained.pth carries no optimizer state
        from tpat_tpu.utils.torch_import import (
            load_torch_state_dict,
            mae_params_from_state_dict,
        )

        params = mae_params_from_state_dict(
            load_torch_state_dict(args.resume)
        )
        opt_state = tx.init(params)
        print(f"initialized from torch checkpoint {args.resume}")
    elif args.resume:
        template = {
            "params": jax.tree_util.tree_map(np.asarray, params),
            "opt_state": jax.tree_util.tree_map(np.asarray, opt_state),
            "step": 0,
            "epoch": 0,
        }
        restored = ckpt_lib.restore_checkpoint(args.resume, template)
        params, opt_state = restored["params"], restored["opt_state"]
        step = int(restored["step"])
        start_epoch = int(restored["epoch"]) + 1
        print(f"resumed from {args.resume}: epoch {start_epoch}, step {step}")
    rep = mesh_lib.replicated_sharding(mesh)
    params, opt_state = jax.device_put((params, opt_state), rep)

    train_step = pretrain_lib.make_mae_train_step(model, tx, args.mask_ratio)

    out = Path(args.output_dir)
    out.mkdir(parents=True, exist_ok=True)
    t0 = time.time()
    for epoch in range(start_epoch, args.epochs):
        loader.set_epoch(epoch)
        loss_sum = jax.device_put(jnp.zeros(()), rep)
        n = 0
        for x, _y, _ids in loader:
            x = mesh_lib.shard_batch(mesh, jnp.asarray(x))
            params, opt_state, loss_sum = train_step(
                params, opt_state, loss_sum, rng, jnp.asarray(step), x
            )
            step += 1
            n += 1
        mean_loss = float(loss_sum) / max(n, 1)
        if not np.isfinite(mean_loss):
            raise FloatingPointError(
                f"Non-finite loss in epoch {epoch}, stopping pretraining "
                "(engine_finetune.py:108-110 semantics)"
            )
        if is_main:
            print(
                f"epoch {epoch}: loss={mean_loss:.4f} "
                f"lr={float(lr_fn(step)):.2e}"
            )
            with open(out / "log.txt", "a") as f:
                f.write(json.dumps({"epoch": epoch, "loss": mean_loss}) + "\n")
        if is_main and (
            (
                args.save_every_epochs > 0
                and (epoch + 1) % args.save_every_epochs == 0
            ) or epoch == args.epochs - 1
        ):
            import types

            s = types.SimpleNamespace(
                params=params, opt_state=opt_state, step=step
            )
            ckpt_lib.save_checkpoint(
                str(out / f"checkpoint-{epoch:03d}"), s, epoch,
                background=args.async_checkpoint,
            )
    if args.export_torch and is_main:
        from tpat_tpu.utils.torch_export import save_pth

        save_pth(
            str(out / "mae_pretrained.pth"),
            jax.tree_util.tree_map(np.asarray, params),
            flavor="mae",
            epoch=args.epochs - 1,
        )
        print(f"wrote {out / 'mae_pretrained.pth'}")
    if is_main:
        ckpt_lib.wait_for_checkpoints()  # join background writes, re-raise
    print(f"pretraining done in {time.time() - t0:.1f}s")


def cli(argv=None):
    """Console-script entry point (``tpat-pretrain``).

    ``get_args_parser`` is ``add_help=False`` (composable); wrap it so
    the installed script still answers ``--help``.
    """
    parser = argparse.ArgumentParser("tpat-pretrain", parents=[get_args_parser()])
    main(parser.parse_args(argv))


if __name__ == "__main__":
    cli()
