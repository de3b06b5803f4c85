"""Finetune/eval driver — the ``main_finetune.py`` equivalent
(``/root/reference/audiomae/main_finetune.py``), same knob names, backed by
the typed config system and the SPMD engine.

Usage examples (mirroring ft_esc50.sh):

  python -m tpat_tpu.cli.finetune \
    --dataset esc50 --data_train train.json --data_eval eval.json \
    --label_csv labels.csv --nb_classes 50 --batch_size 64 --epochs 120 \
    --blr 1e-3 --base_keep_rate 0.5 --drop_loc "(3, 6, 9)" \
    --shrink_start_epoch 20 --shrink_epochs 40 \
    --audioset_pretrained_model_path pretrained.pth \
    --output_dir out --ramdisk_dir /dev/shm/tpat

  # eval + feature extraction (engine_finetune.py:145-202 path)
  python -m tpat_tpu.cli.finetune ... --eval \
    --finetuned_model_path out/best_model \
    --flag_extract_features true --extract_features_path feats/
"""

from __future__ import annotations

import argparse
import ast
import dataclasses
import json
import os
import time
from pathlib import Path

import numpy as np

from tpat_tpu.cli import str2bool


def get_args_parser():
    p = argparse.ArgumentParser("tpat_tpu finetuning", add_help=False)
    p.add_argument("--batch_size", required=True, type=int)
    p.add_argument("--epochs", required=True, type=int)
    p.add_argument("--accum_iter", default=1, type=int)
    p.add_argument("--model", default="audiomae_vit_base",
                   choices=["audiomae_vit_base", "audiomae_vit_small",
                            "audiomae_vit_large", "audiomae_vit_tiny",
                            "ast_vit_base"])
    p.add_argument("--drop_path", type=float, default=0.1)
    # the reference trains under torch.amp autocast (engine_finetune.py:
    # 102); the TPU equivalent is bfloat16 matmuls with f32 softmax/
    # statistics and no loss scaler — on by default, like AMP upstream
    p.add_argument(
        "--compute_dtype", default="bfloat16",
        choices=["bfloat16", "float32"],
    )
    # escape hatch for the polynomial bf16 GELU (ops/fast_gelu.py):
    # 'exact' forces erf even under bfloat16
    p.add_argument(
        "--gelu_impl", default="auto", choices=["auto", "exact", "poly"],
    )
    # jax.profiler trace of one training epoch (TPU-native replacement
    # for the reference's torch.cuda wall-clock meters, SURVEY §5)
    p.add_argument("--profile_dir", default=None, type=str)
    p.add_argument("--profile_epoch", default=1, type=int)
    # optimizer
    p.add_argument("--clip_grad", type=float, default=None)
    p.add_argument("--weight_decay", type=float, default=1e-4)
    p.add_argument("--lr", type=float, default=None)
    p.add_argument("--blr", type=float, default=1e-3)
    p.add_argument("--layer_decay", type=float, default=0.75)
    p.add_argument("--min_lr", type=float, default=1e-6)
    p.add_argument("--warmup_epochs", type=float, default=5)
    # checkpoints
    p.add_argument("--audioset_pretrained_model_path", default="")
    p.add_argument("--finetuned_model_path", default="")
    p.add_argument("--mean_pooling", type=str2bool, default=True)
    # data
    p.add_argument("--dataset", required=True,
                   choices=["audioset", "esc50", "spc2", "voxceleb1"])
    p.add_argument("--data_train", default="")
    p.add_argument("--data_eval", default="")
    p.add_argument("--label_csv", default="")
    p.add_argument("--voxceleb1_root", default=None)
    p.add_argument("--nb_classes", required=True, type=int)
    p.add_argument("--freqm", type=int, default=None)
    p.add_argument("--timem", type=int, default=None)
    p.add_argument("--mixup", type=float, default=0.0)
    p.add_argument("--roll_mag_aug", type=str2bool, default=False)
    p.add_argument("--mask_2d", type=str2bool, default=True)
    p.add_argument("--mask_t_prob", type=float, default=0.0)
    p.add_argument("--mask_f_prob", type=float, default=0.0)
    p.add_argument("--num_workers", default=4, type=int)
    # Beyond-reference: tensor-parallel model axis.  >1 builds a 2-D
    # (data, model) mesh over the local devices with Megatron column/row
    # weight sharding (parallel/sharding.py); attention auto-selects the
    # XLA impl.  The reference's only parallelism is 2-way DDP.
    p.add_argument("--model_axis", default=1, type=int)
    p.add_argument("--target_length", type=int, default=None,
                   help="override the preset target length (testing)")
    p.add_argument("--device_frontend", type=str2bool, default=False,
                   help="datasets emit raw waveforms; fbank + SpecAug + "
                        "normalization run batched on the TPU inside the "
                        "compiled step (ops/frontend.py)")
    p.add_argument("--device_dataset", default="auto",
                   choices=["auto", "true", "false"],
                   help="HBM-resident dataset cache (data/device_cache.py): "
                        "when the per-item pipeline is deterministic (no "
                        "host-side augs) the whole dataset transfers to the "
                        "device once and epochs serve on-device gathers — "
                        "bit-identical batches, no per-step host streaming. "
                        "'auto' enables it whenever that holds and the data "
                        "fits the cache budget; 'true' requires it (errors "
                        "with the reason otherwise)")
    # run control
    p.add_argument("--output_dir", default="./output_dir")
    p.add_argument("--ramdisk_dir", default="")
    p.add_argument("--async_checkpoint", type=str2bool, default=False,
                   help="overlap best/last checkpoint disk writes with "
                        "the next epoch's training (background writer "
                        "thread; joined before reads and at exit)")
    p.add_argument("--best_on_device", type=str2bool, default=False,
                   help="keep the best state as an HBM-resident copy and "
                        "fetch+write it ONCE at the end of training "
                        "instead of per improving epoch (~60 s/epoch of "
                        "relay fetch for ViT-B); a crash before the end "
                        "loses the best — meant for multi-arm harnesses")
    p.add_argument("--seed", default=0, type=int)
    p.add_argument("--resume", default="")
    p.add_argument("--start_epoch", default=0, type=int)
    p.add_argument("--eval", action="store_true")
    p.add_argument("--dist_eval", action="store_true", default=False)
    p.add_argument("--first_eval_ep", default=0, type=int)
    p.add_argument("--result_path", type=str, default=None)
    p.add_argument("--save_every_epochs", type=int, default=0,
                   help="periodic crash-resume checkpoint (0 = off)")
    # feature extraction
    p.add_argument("--flag_extract_features", type=str2bool, default=False)
    p.add_argument("--extract_features_path", type=str, default=None)
    # pruning
    p.add_argument("--drop_loc", default="(3, 6, 9)", type=str)
    p.add_argument("--base_keep_rate", type=float, default=1.0)
    p.add_argument("--shrink_epochs", default=0, type=int)
    p.add_argument("--shrink_start_epoch", default=10, type=int)
    p.add_argument(
        "--anneal_mode", default="hybrid",
        choices=["hybrid", "masked", "bucketed"],
        help="shrink-phase execution: 'hybrid' (default) = exact reference "
             "schedule masked inside physically-pruned bucket-level shapes "
             "(near-static cost, <= anneal_buckets compiles); 'masked' = "
             "exact schedule under ONE compilation but full shapes; "
             "'bucketed' = schedule quantized to the bucket levels, "
             "physically-pruned static steps",
    )
    p.add_argument("--anneal_buckets", default=4, type=int)
    # ablations
    p.add_argument("--custom_rank", default=None, choices=[None, "mean", "std"])
    p.add_argument("--retain_min", default=-100, type=float)
    p.add_argument("--retain_max", default=100, type=float)
    p.add_argument("--drop_token_blk_idx", type=int, default=None)
    return p


def args_checker(args):
    """main_finetune.py:220-233."""
    assert args.mean_pooling, (
        "mean_pooling must be True (models_vit.py:307 asserts it)"
    )
    if not args.eval:
        assert not args.flag_extract_features, (
            "extract_features is only supported during evaluation"
        )
    else:
        assert args.finetuned_model_path, (
            "finetuned_model_path is required for evaluation"
        )
    if args.flag_extract_features:
        assert args.extract_features_path, (
            "extract_features_path is required for feature extraction"
        )
    # main_finetune.py:511 — the engine applies one probability to both
    # axes, so unequal values would silently train a different
    # augmentation than requested
    assert args.mask_t_prob == args.mask_f_prob, (
        f"mask_t_prob ({args.mask_t_prob}) must equal mask_f_prob "
        f"({args.mask_f_prob}) (main_finetune.py:511)"
    )
    # the reference builds the masked-2d machinery only when mask_2d=True
    # (main_finetune.py:362, models_vit.py:468); here the path always
    # exists, so requesting masking with mask_2d=False is a config error
    # rather than a silent difference
    if args.mask_t_prob > 0.0:
        assert args.mask_2d, "mask_t_prob > 0 requires --mask_2d True"


def build_everything(args):
    import jax
    import jax.numpy as jnp

    from tpat_tpu import config as cfg_lib
    from tpat_tpu.data.datasets import AudiosetDataset, VoxCeleb1Dataset, make_name_dict
    from tpat_tpu.data.loader import DataLoader
    from tpat_tpu.data.sampler import EpochShardSampler
    from tpat_tpu.engine.train import TrainModule
    from tpat_tpu.models.vit import AudioViT
    from tpat_tpu.parallel import mesh as mesh_lib

    preset = cfg_lib.DATASET_PRESETS[args.dataset]
    data_cfg = dataclasses.replace(
        preset,
        target_length=args.target_length or preset.target_length,
        num_classes=args.nb_classes,
        freqm=args.freqm if args.freqm is not None else preset.freqm,
        timem=args.timem if args.timem is not None else preset.timem,
        mixup=args.mixup,
        roll_mag_aug=args.roll_mag_aug,
    )

    drop_loc = tuple(ast.literal_eval(args.drop_loc))
    factory = getattr(cfg_lib, args.model)
    model_cfg = factory(
        num_classes=args.nb_classes,
        target_length=data_cfg.target_length,
        drop_path_rate=args.drop_path,
        drop_loc=drop_loc,
        base_keep_rate=args.base_keep_rate,
        compute_dtype=args.compute_dtype,
        gelu_impl=args.gelu_impl,
    )
    model = AudioViT(model_cfg)

    wf = bool(args.device_frontend)
    if args.dataset == "voxceleb1":
        ds_train = VoxCeleb1Dataset(
            args.voxceleb1_root, "train", data_cfg, lr_pad=True,
            seed=args.seed, return_waveform=wf,
        )
        ds_val = VoxCeleb1Dataset(
            args.voxceleb1_root, "test", data_cfg, return_waveform=wf
        )
    else:
        ds_train = (
            AudiosetDataset(
                args.data_train, data_cfg, args.label_csv, train=True,
                roll_mag_aug=args.roll_mag_aug, seed=args.seed,
                return_waveform=wf,
            )
            if args.data_train
            else None
        )
        ds_val = AudiosetDataset(
            args.data_eval, data_cfg, args.label_csv, train=False,
            return_waveform=wf,
        )

    # Multi-host: each process loads ONLY its sampler shard (torch
    # DistributedSampler semantics, main_finetune.py:292-294) and feeds
    # --batch_size local rows; the global batch is batch_size * world
    # (assembled by mesh.shard_batch).  Single-host: world == 1, one
    # process feeds the whole batch — identical to before.
    rank, world = jax.process_index(), jax.process_count()
    if world > 1:
        assert args.batch_size % jax.local_device_count() == 0, (
            f"per-host batch {args.batch_size} must be a multiple of the "
            f"local device count {jax.local_device_count()}"
        )

    if getattr(args, "model_axis", 1) > 1:
        from tpat_tpu.parallel import sharding as shd

        n = jax.device_count()
        assert n % args.model_axis == 0, (
            f"model_axis {args.model_axis} must divide device count {n}"
        )
        mesh = shd.make_mesh_2d(n // args.model_axis, args.model_axis)
    else:
        mesh = mesh_lib.make_mesh()

    from tpat_tpu.data.device_cache import maybe_device_cached

    dd_mode = getattr(args, "device_dataset", "auto")
    loader_train = None
    if ds_train is not None:
        train_sampler = EpochShardSampler(
            len(ds_train), shuffle=True, seed=args.seed,
            world=world, rank=rank,
        )
        loader_train = maybe_device_cached(
            ds_train, args.batch_size, sampler=train_sampler,
            num_workers=args.num_workers, drop_last=True,
            mesh=mesh, mode=dd_mode, label="train set",
        ) or DataLoader(
            ds_train, args.batch_size, sampler=train_sampler,
            num_workers=args.num_workers, drop_last=True,
        )
    # --dist_eval bypasses loader_val for its sharded generator, so a
    # device cache there would transfer the full set for nothing
    eval_dd_mode = "false" if (args.dist_eval and world > 1) else dd_mode
    loader_val = maybe_device_cached(
        ds_val, args.batch_size, shuffle=False,
        num_workers=args.num_workers, drop_last=False,
        mesh=mesh, mode=eval_dd_mode, label="eval set",
    ) or DataLoader(
        ds_val, args.batch_size, shuffle=False,
        num_workers=args.num_workers, drop_last=False,
    )

    train_cfg = cfg_lib.TrainConfig(
        batch_size=args.batch_size,
        epochs=args.epochs,
        accum_iter=args.accum_iter,
        blr=args.blr,
        lr=args.lr,
        min_lr=args.min_lr,
        warmup_epochs=args.warmup_epochs,
        weight_decay=args.weight_decay,
        layer_decay=args.layer_decay,
        clip_grad=args.clip_grad,
        seed=args.seed,
        base_keep_rate=args.base_keep_rate,
        drop_loc=drop_loc,
        shrink_start_epoch=args.shrink_start_epoch,
        shrink_epochs=args.shrink_epochs,
        anneal_mode=args.anneal_mode,
        anneal_buckets=args.anneal_buckets,
        mask_t_prob=args.mask_t_prob,
        mask_f_prob=args.mask_f_prob,
        first_eval_ep=args.first_eval_ep,
        num_hosts=world,
        dist_eval=args.dist_eval,
    )
    preprocess = None
    if wf:
        from tpat_tpu.ops.frontend import FrontendConfig, device_frontend

        fc_train = FrontendConfig(
            num_mel_bins=data_cfg.num_mel_bins,
            target_length=data_cfg.target_length,
            norm_mean=data_cfg.norm_mean,
            norm_std=data_cfg.norm_std,
            freqm=data_cfg.freqm,
            timem=data_cfg.timem,
            noise=data_cfg.use_noise,
        )
        fc_eval = dataclasses.replace(
            fc_train, freqm=0, timem=0, noise=False
        )

        def preprocess(x, rng, specaug, train):
            cfg = fc_train if (train and specaug) else (
                dataclasses.replace(fc_train, freqm=0, timem=0)
                if train
                else fc_eval
            )
            return device_frontend(x, cfg, rng=rng, train=train)

        # identity for the engine's process-level compiled-step memo:
        # equal frontend configs trace to the same program
        preprocess.cache_key = ("audiomae_frontend", fc_train)

    module = TrainModule(
        model=model,
        model_cfg=model_cfg,
        train_cfg=train_cfg,
        loss_type=data_cfg.loss_type,
        iters_per_epoch=len(loader_train) if loader_train else 1,
        mesh=mesh,
        custom_rank=args.custom_rank,
        preprocess=preprocess,
    )
    # the module may have re-selected attention_impl under a model axis —
    # every downstream consumer (eval, export) must use ITS model
    return module.model, module.model_cfg, data_cfg, module, loader_train, loader_val


def load_params(args, model, model_cfg):
    """Checkpoint surgery chain (main_finetune.py:384-426)."""
    import jax
    import jax.numpy as jnp

    from tpat_tpu.utils import torch_import as ti
    from tpat_tpu.utils import checkpoint as ckpt_lib

    x0 = jnp.zeros((1, 1, model_cfg.target_length, model_cfg.num_mel_bins))
    params = model.init({"params": jax.random.PRNGKey(args.seed)}, x0)["params"]

    if args.audioset_pretrained_model_path:
        sd = ti.load_torch_state_dict(args.audioset_pretrained_model_path)
        if model_cfg.num_extra_tokens == 2:
            imported = ti.ast_params_from_state_dict(sd, model_cfg)
        else:
            # The reference hardcodes the pretrain grid as (8, 64)
            # (main_finetune.py:408-409, AudioSet-1024 pretraining); we
            # infer (freq, time) from the checkpoint's pos-embed row count
            # so checkpoints pretrained at other lengths (e.g. our own
            # cli/pretrain.py runs) crop correctly too — identical to the
            # reference for the 512-patch AudioSet layout.
            ckpt_grid = (8, 64)
            if "pos_embed" in sd:
                rows = sd["pos_embed"].shape[1] - 1
                ckpt_grid = (model_cfg.grid_f, rows // model_cfg.grid_f)
            imported = ti.audiomae_params_from_state_dict(
                sd, model_cfg, ckpt_grid=ckpt_grid
            )
            # the reference re-initializes head.weight with
            # trunc_normal(2e-5) unconditionally AFTER the pretrained load
            # (main_finetune.py:424) — keep the model's fresh kernel, let
            # an imported matching-shape bias overlay (strict=False keeps
            # it upstream)
            if "head" in imported:
                imported["head"].pop("kernel", None)
        params = ti.overlay_params(params, imported)
        print(f"loaded pretrained checkpoint: {args.audioset_pretrained_model_path}")

    if args.finetuned_model_path:
        path = args.finetuned_model_path
        if path.endswith(".pth"):
            sd = ti.load_torch_state_dict(path)
            if model_cfg.num_extra_tokens == 2:
                imported = ti.ast_params_from_state_dict(sd, model_cfg)
            else:
                # a finetuned checkpoint is at the model geometry already —
                # the reference loads it strict=True with NO pos-embed
                # surgery (main_finetune.py:424-426).  Passing the model
                # grid makes the crop a no-op while the importer's row
                # check still enforces the strict shape match.
                imported = ti.audiomae_params_from_state_dict(
                    sd, model_cfg,
                    ckpt_grid=(model_cfg.grid_f, model_cfg.grid_t),
                )
            params = ti.overlay_params(params, imported)
        else:  # orbax dir saved by this framework
            restored = ckpt_lib.restore_checkpoint(path)
            params = restored["params"]
        print(f"loaded finetuned checkpoint: {path}")
    return params


def dist_eval_batches(ds_val, batch_size, num_workers=4):
    """Unpadded per-host eval shard (DistributedEvalSampler semantics,
    ``util/sampler.py:73-99``): rank-strided indices, no wrap padding, so
    gathered metrics are exact.  Every host is padded to the SAME dispatch
    count (rank 0 owns the largest shard) with n_valid=0 filler batches so
    the SPMD eval steps stay collective-aligned across processes.

    Items are decoded on a thread pool (decode + fbank release the GIL,
    same rationale as ``data/loader.py``) — a serial ``ds_val[i]`` loop
    would add seconds-per-thousand-clips of host work to every eval."""
    import concurrent.futures as cf

    import jax

    from tpat_tpu.data.sampler import eval_shard

    rank, world = jax.process_index(), jax.process_count()
    idx = eval_shard(len(ds_val), world, rank)
    max_shard = -(-len(ds_val) // world)
    n_batches = -(-max_shard // batch_size)
    with cf.ThreadPoolExecutor(max_workers=max(num_workers, 1)) as pool:
        for b in range(n_batches):
            rows = idx[b * batch_size : (b + 1) * batch_size]
            valid = len(rows)
            if not rows:
                rows = [idx[-1] if idx else 0]
            items = list(pool.map(ds_val.__getitem__, rows))
            x = np.stack([it[0] for it in items])
            y = np.stack([it[1] for it in items])
            yield x, y[:valid], valid


def _eval_once(
    args, model, module, loader_val, params,
    feature_writer=None, index_to_name=None, intensity_band=None,
):
    """One evaluation pass, dist-eval aware: with --dist_eval and multiple
    processes, each host scores its unpadded shard and logits are gathered
    (engine_finetune.py:246-248); otherwise every host scores the full
    set.  The single source of the dist-eval policy — both --eval and the
    in-training eval dispatch through here.  Like the reference (which
    sets use_custom_rank model-wide, main_finetune.py:448-450), the
    custom-rank ablation applies to every eval."""
    import jax

    from tpat_tpu.engine import evaluate as eval_lib

    if feature_writer is not None and jax.process_count() > 1:
        # the reference's args_checker demands world_size 1 for extraction
        # (main_finetune.py:232); multi-host extraction would also fetch
        # non-addressable feature arrays and collide per-rank batch files
        raise ValueError(
            "feature extraction requires a single process "
            "(main_finetune.py:232)"
        )
    dist = args.dist_eval and jax.process_count() > 1
    if dist:
        from tpat_tpu.data.loader import prefetch_iter

        # background-thread prefetch so batch b+1 decodes while the eval
        # step runs batch b (what DataLoader does on the non-dist path)
        batches = prefetch_iter(dist_eval_batches(
            loader_val.dataset, args.batch_size,
            num_workers=loader_val.num_workers,
        ))
    else:
        batches = ((x, y) for x, y, _ in loader_val)
    if args.dataset == "audioset":
        return eval_lib.evaluate_multilabel(
            model, params, batches, args.batch_size, module.mesh,
            feature_writer=feature_writer,
            preprocess=module.preprocess, allgather=dist,
        )
    return eval_lib.evaluate_classification(
        model, params, batches, args.batch_size, module.mesh,
        feature_writer=feature_writer, index_to_name=index_to_name,
        custom_rank=args.custom_rank, intensity_band=intensity_band,
        preprocess=module.preprocess, allgather=dist,
    )


def run_eval(args, model, model_cfg, data_cfg, module, loader_val, params):
    from tpat_tpu.data.datasets import make_name_dict
    from tpat_tpu.utils.features import FeatureWriter

    writer = None
    index_to_name = None
    if args.flag_extract_features:
        # exist_ok=False (main_finetune.py:494): stale per-batch files from
        # an earlier run would be globbed into the aggregation downstream
        Path(args.extract_features_path).mkdir(parents=True, exist_ok=False)
        writer = FeatureWriter(args.extract_features_path)
        if args.label_csv:
            index_to_name = make_name_dict(args.label_csv)

    intensity_band = None
    if args.drop_token_blk_idx is not None:
        # reference asserts eval + keep 1.0 + batch 1 (main_finetune.py:336)
        assert args.base_keep_rate == 1.0, "band ablation needs keep 1.0"
        intensity_band = (args.retain_min, args.retain_max, args.drop_token_blk_idx)

    stats = _eval_once(
        args, model, module, loader_val, params,
        feature_writer=writer, index_to_name=index_to_name,
        intensity_band=intensity_band,
    )
    metric = "mAP" if args.dataset == "audioset" else "acc1"
    # rank-0-only artifact writes, as everywhere else (misc.py:297-312
    # equivalent); under --dist_eval every process reaches here with the
    # same (allgathered) stats — N concurrent writers would race
    import jax

    if jax.process_index() == 0:
        print(f"{metric}: {stats[metric]:.4f}")
        if args.result_path:
            with open(args.result_path, "w") as f:
                f.write(f"{stats[metric]:.4f}")
    return stats


def main(args):
    import jax
    import jax.numpy as jnp

    from tpat_tpu.parallel import distributed as dist_lib
    from tpat_tpu.utils.checkpoint import BestCheckpointKeeper

    args_checker(args)
    np.random.seed(args.seed)
    # multi-host init (misc.py:218-250 equivalent): no-op unless
    # COORDINATOR_ADDRESS/SLURM env is present; afterwards jax.devices()
    # spans all hosts and every loader below shards by process
    rank, world = dist_lib.init_distributed_mode()
    is_main = rank == 0

    model, model_cfg, data_cfg, module, loader_train, loader_val = (
        build_everything(args)
    )
    params = load_params(args, model, model_cfg)

    if args.eval:
        run_eval(args, model, model_cfg, data_cfg, module, loader_val, params)
        return

    out = Path(args.output_dir)
    if is_main:  # rank-0-only artifact writes (misc.py:297-312 semantics)
        out.mkdir(parents=True, exist_ok=True)
        import yaml

        with open(out / "args.yaml", "w") as f:
            yaml.dump(vars(args), f)

    tb = None
    tb_dir = out / "tb_log"
    # refuse to clobber an existing run (main_finetune.py:313-316); resume
    # appends to the same log.  Rank 0's verdict is broadcast so every
    # process stops in lockstep — a rank-0-only SystemExit would leave the
    # other hosts waiting in the first training collective.
    stop = tb_dir.exists() and not args.resume
    if world > 1:
        from jax.experimental import multihost_utils as mh

        stop = bool(mh.broadcast_one_to_all(np.asarray(stop)))
    if stop:
        print(f"!! path {tb_dir} exists, stop training")
        raise SystemExit(1)
    if is_main:
        try:  # TensorBoard scalars like the reference (main_finetune.py:311-319)
            from torch.utils.tensorboard import SummaryWriter

            tb = SummaryWriter(str(tb_dir))
        except ImportError:
            pass

    state = module.load(params, seed=args.seed)
    if args.resume:
        import numpy as _np

        from tpat_tpu.utils.checkpoint import restore_checkpoint

        # restore INTO the live state's structure so optax NamedTuple
        # states survive the round-trip
        template = {
            "params": jax.tree_util.tree_map(_np.asarray, state.params),
            "opt_state": jax.tree_util.tree_map(_np.asarray, state.opt_state),
            "step": 0,
            "epoch": 0,
        }
        restored = restore_checkpoint(args.resume, template)
        state = state.replace(
            params=jax.tree_util.tree_map(jnp.asarray, restored["params"]),
            opt_state=jax.tree_util.tree_map(
                jnp.asarray, restored["opt_state"]
            ),
            step=jnp.asarray(restored["step"], jnp.int32),
        )
        args.start_epoch = restored["epoch"] + 1
        print(f"resumed from {args.resume} at epoch {args.start_epoch}")
    if args.profile_dir and not (
        args.start_epoch <= args.profile_epoch < args.epochs
    ):
        if args.resume and args.profile_epoch < args.epochs:
            # crash-resume past the profile epoch: the trace was (or could
            # have been) collected on the earlier run — warn, don't abort
            print(
                f"note: resuming at epoch {args.start_epoch}, past "
                f"--profile_epoch {args.profile_epoch}; no new trace will "
                "be written this run"
            )
        else:
            raise SystemExit(
                f"--profile_dir set but --profile_epoch "
                f"{args.profile_epoch} is outside the training range "
                f"[{args.start_epoch}, {args.epochs}) — no trace would "
                "ever be written"
            )
    scratch = args.ramdisk_dir or str(out / "scratch")
    keeper = BestCheckpointKeeper(
        scratch, str(out), async_save=args.async_checkpoint,
        snapshot_on_device=args.best_on_device,
    )
    metric = "mAP" if args.dataset == "audioset" else "acc1"

    start = time.time()
    for epoch in range(args.start_epoch, args.epochs):
        loader_train.set_epoch(epoch)
        if args.base_keep_rate < 1.0 and epoch >= args.shrink_start_epoch:
            # disable augmentations once shrink begins
            loader_train.dataset.freqm = 0
            loader_train.dataset.timem = 0

        batches = ((x, y) for x, y, _ in loader_train)
        from tpat_tpu.utils.logging import profiler_trace

        trace_dir = (
            args.profile_dir
            if (args.profile_dir and epoch == args.profile_epoch and is_main)
            else None
        )
        with profiler_trace(trace_dir):
            state, train_stats = module.train_epoch(
                state, batches, epoch, log_every=20, tb_writer=tb
            )

        if epoch >= args.first_eval_ep:
            test_stats = _eval_once(
                args, model, module, loader_val, state.params
            )
        else:
            test_stats = {metric: -1.0}
        score = test_stats[metric]
        print(
            f"epoch {epoch}: phase={train_stats['phase']} "
            f"train_loss={train_stats['loss']:.4f} {metric}={score:.4f}"
        )
        if is_main and epoch >= args.first_eval_ep:
            # never checkpoint the -1.0 placeholder of skipped-eval epochs
            # (reference saves only on a real >= max score,
            # main_finetune.py:548)
            keeper.update(score, state, epoch)
        if (
            is_main
            and args.save_every_epochs
            and (epoch + 1) % args.save_every_epochs == 0
        ):
            from tpat_tpu.utils.checkpoint import save_checkpoint

            save_checkpoint(
                str(out / "last_checkpoint"), state, epoch,
                background=args.async_checkpoint,
            )

        log = {
            **{f"train_{k}": v for k, v in train_stats.items()},
            **{f"test_{k}": v for k, v in test_stats.items()},
            "epoch": epoch,
        }
        if is_main:
            with open(out / "log.txt", "a") as f:
                f.write(json.dumps(log) + "\n")
        if tb is not None:
            for k, v in train_stats.items():
                if isinstance(v, (int, float)):
                    tb.add_scalar(f"train/{k}", v, epoch)
            for k, v in test_stats.items():
                if isinstance(v, (int, float)):
                    tb.add_scalar(f"test/{k}", v, epoch)
            tb.flush()

    if is_main:
        from tpat_tpu.utils.checkpoint import wait_for_checkpoints

        keeper.finalize()
        wait_for_checkpoints()  # join any background last_checkpoint write
        print(f"training time {time.time() - start:.1f}s, "
              f"best {metric}={keeper.best_score:.4f} @ epoch {keeper.best_epoch}")
        if args.result_path:
            with open(args.result_path, "w") as f:
                f.write(f"{keeper.best_score:.4f}")


def cli(argv=None):
    """Console-script entry point (``tpat-finetune``).

    ``get_args_parser`` is ``add_help=False`` (composable, like the
    reference's ``main_finetune.get_args_parser``); wrap it so the
    installed script still answers ``--help``.
    """
    parser = argparse.ArgumentParser("tpat-finetune", parents=[get_args_parser()])
    main(parser.parse_args(argv))


if __name__ == "__main__":
    cli()
