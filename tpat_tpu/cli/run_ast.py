"""AST driver — the ``ast/src/run.py`` equivalent
(``/root/reference/ast/src/run.py``): same flags (dashes included), AST
training recipe (Adam + MultiStepLR + 1000-step warmup, hard-CE/BCE),
result CSVs via np.savetxt, epochs counted from 1.
"""

from __future__ import annotations

import argparse
import ast as pyast
import dataclasses
import os

import numpy as np

from tpat_tpu.cli import str2bool


def get_parser():
    p = argparse.ArgumentParser(
        formatter_class=argparse.ArgumentDefaultsHelpFormatter
    )
    p.add_argument("--data-train", type=str, default="")
    p.add_argument("--data-val", type=str, default="")
    p.add_argument("--data-eval", type=str, default="")
    p.add_argument("--label-csv", type=str, default="")
    p.add_argument("--n_class", type=int, default=527)
    p.add_argument("--model", type=str, default="ast")
    p.add_argument("--dataset", type=str, default="audioset")
    p.add_argument("--exp-dir", type=str, default="")
    p.add_argument("--ramdisk_dir", type=str, default="")
    p.add_argument("--async_checkpoint", type=str2bool, default=False,
                   help="overlap best-checkpoint disk writes with the "
                        "next epoch's training (joined at finalize)")
    p.add_argument("--best_on_device", type=str2bool, default=False,
                   help="keep the best state as an HBM-resident copy, "
                        "fetched+written once at finalize (see "
                        "cli/finetune.py --best_on_device)")
    p.add_argument("--lr", "--learning-rate", default=0.001, type=float)
    p.add_argument("-b", "--batch-size", default=12, type=int)
    p.add_argument("-w", "--num-workers", default=8, type=int)
    p.add_argument("--n-epochs", type=int, default=1)
    p.add_argument("--n-print-steps", type=int, default=100)
    p.add_argument("--mixup", type=float, default=0)
    p.add_argument("--fstride", type=int, default=16)
    p.add_argument("--tstride", type=int, default=16)
    p.add_argument("--imagenet_pretrain", type=pyast.literal_eval, default="True")
    p.add_argument("--audioset_pretrain", type=pyast.literal_eval, default="False")
    p.add_argument("--dataset_mean", type=float, default=-4.2677393)
    p.add_argument("--dataset_std", type=float, default=4.5689974)
    p.add_argument("--audio_length", type=int, default=1024)
    p.add_argument("--noise", type=pyast.literal_eval, default="False")
    p.add_argument("--metrics", type=str, default=None, choices=["acc", "mAP"])
    p.add_argument("--loss", type=str, default=None, choices=["BCE", "CE"])
    p.add_argument("--warmup", type=pyast.literal_eval, default="False")
    p.add_argument("--lrscheduler_start", type=int, default=2)
    p.add_argument("--lrscheduler_step", type=int, default=1)
    p.add_argument("--lrscheduler_decay", type=float, default=0.5)
    # SpecAug strengths: the reference has NO flags — run.py:150-158
    # hard-codes them per dataset; None here means "use that table",
    # an explicit value overrides it (beyond-reference convenience).
    p.add_argument("--freqm", type=int, default=None)
    p.add_argument("--timem", type=int, default=None)
    # EViT
    p.add_argument("--shrink_start_epoch", type=int, default=999)
    p.add_argument("--shrink_epochs", type=int, default=999)
    p.add_argument("--base_keep_rate", type=float, default=1.0)
    p.add_argument("--drop_loc", default="(3, 6, 9)", type=str)
    p.add_argument("--extract_features_path", type=str, default=None)
    p.add_argument("--flag_extract_features", type=str2bool, default=False)
    p.add_argument("--audioset_pretrained_model_path", type=str, default=None)
    # Beyond-reference: the reference fetches the DeiT ImageNet checkpoint
    # through timm's downloader (ast_models.py:275); here the local .pth
    # (a timm vit_deit_base_distilled_patch16_384 state_dict) is passed
    # explicitly — consumed when --imagenet_pretrain True and
    # --audioset_pretrain False.
    p.add_argument("--imagenet_pretrained_model_path", type=str, default=None)
    p.add_argument("--eval", action="store_true")
    p.add_argument("--model_size", type=str, default="base384")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--custom_rank", default=None, type=str)
    p.add_argument("--retain_min", default=-100.0, type=float)
    p.add_argument("--retain_max", default=100.0, type=float)
    p.add_argument("--drop_token_blk_idx", default=None, type=int)
    p.add_argument("--first_eval_epoch", default=0, type=int)
    p.add_argument("--eval_result_path", default="eval_result.csv", type=str)
    # the reference trains under torch.amp autocast (traintest.py:175);
    # bf16 matmuls + f32 softmax are the TPU equivalent — on by default
    p.add_argument(
        "--compute_dtype", default="bfloat16",
        choices=["bfloat16", "float32"],
    )
    # escape hatch for the polynomial bf16 GELU (ops/fast_gelu.py):
    # 'exact' forces erf even under bfloat16
    p.add_argument(
        "--gelu_impl", default="auto", choices=["auto", "exact", "poly"],
    )
    # beyond-reference (mirrors cli/finetune.py --device_frontend): move
    # fbank + SpecAug + normalization onto the TPU, fused into the
    # compiled step — the loader then ships raw waveforms, relieving
    # host-CPU-bound input pipelines
    p.add_argument("--device_frontend", type=str2bool, default=False,
                   help="compute the Kaldi fbank on-device (loader emits "
                        "raw waveforms)")
    p.add_argument("--device_dataset", default="auto",
                   choices=["auto", "true", "false"],
                   help="HBM-resident dataset cache (data/device_cache.py; "
                        "see cli/finetune.py --device_dataset)")
    return p


def main(args):
    import jax
    import jax.numpy as jnp

    from tpat_tpu import config as cfg_lib
    from tpat_tpu.data.datasets import AudiosetDataset
    from tpat_tpu.data.loader import DataLoader
    from tpat_tpu.data.sampler import EpochShardSampler
    from tpat_tpu.engine import evaluate as eval_lib
    from tpat_tpu.engine.train import TrainModule
    from tpat_tpu.models.vit import AudioViT
    from tpat_tpu.parallel import distributed as dist_lib
    from tpat_tpu.parallel import mesh as mesh_lib
    from tpat_tpu.utils import torch_import as ti
    from tpat_tpu.utils.checkpoint import BestCheckpointKeeper, restore_checkpoint
    from tpat_tpu.utils.features import FeatureWriter

    assert args.fstride == 16 and args.tstride == 16, (
        "only fstride=tstride=16 (ast_models.py:258)"
    )
    assert args.model == "ast", f"only the ast model is supported, got {args.model!r}"
    np.random.seed(args.seed)
    # Multi-host DP (beyond-reference: the AST reference is single-process
    # nn.DataParallel, traintest.py:78-79): no-op without a coordinator
    rank, world = dist_lib.init_distributed_mode()
    is_main = rank == 0
    if world > 1:
        # same startup guard as cli/finetune.py — fail clearly here
        # rather than as a GSPMD shape error inside shard_batch
        assert args.batch_size % jax.local_device_count() == 0, (
            f"per-host batch {args.batch_size} must be a multiple of the "
            f"local device count {jax.local_device_count()}"
        )

    # per-dataset SpecAug table (run.py:150-158); flags override
    timem_conf = {"audioset": 192, "speechcommands": 48, "esc50": 96}
    freqm_conf = {"audioset": 48, "speechcommands": 48, "esc50": 24}
    freqm = (
        args.freqm if args.freqm is not None
        else freqm_conf.get(args.dataset, 0)
    )
    timem = (
        args.timem if args.timem is not None
        else timem_conf.get(args.dataset, 0)
    )

    data_cfg = cfg_lib.DataConfig(
        name=args.dataset,
        num_classes=args.n_class,
        target_length=args.audio_length,
        norm_mean=args.dataset_mean,
        norm_std=args.dataset_std,
        multilabel=args.metrics == "mAP",
        use_noise=bool(args.noise),
        loss_type="bce" if args.loss == "BCE" else "ce_hard",
        freqm=freqm,
        timem=timem,
        mixup=args.mixup,
    )

    drop_loc = tuple(pyast.literal_eval(args.drop_loc))
    model_kw = dict(
        num_classes=args.n_class,
        target_length=args.audio_length,
        drop_loc=drop_loc,
        base_keep_rate=args.base_keep_rate,
        compute_dtype=args.compute_dtype,
        gelu_impl=args.gelu_impl,
    )
    if args.model_size == "tiny_debug":  # smoke-test scale, not in reference
        model_cfg = dataclasses.replace(
            cfg_lib.ast_vit_base(**model_kw),
            embed_dim=192, depth=6, num_heads=3,
        )
    else:
        assert args.model_size == "base384", "only base384 (ast_models.py:286)"
        model_cfg = cfg_lib.ast_vit_base(**model_kw)
    model = AudioViT(model_cfg)

    wf = bool(args.device_frontend)
    ds_val = AudiosetDataset(
        args.data_val or args.data_eval, data_cfg, args.label_csv,
        train=False, return_waveform=wf,
    )
    from tpat_tpu.data.device_cache import maybe_device_cached

    dd_mode = getattr(args, "device_dataset", "auto")
    loader_val = maybe_device_cached(
        ds_val, args.batch_size, shuffle=False,
        num_workers=args.num_workers, mode=dd_mode, label="eval set",
    ) or DataLoader(
        ds_val, args.batch_size, shuffle=False, num_workers=args.num_workers
    )

    # AST input orientation: (B, T, 128) -> (B, 1, 128, T)
    # (ast_models.py:434-436); datasets emit (B, 1, T, F), transpose here.
    # In waveform mode the loader ships raw audio (B, L) and the
    # on-device preprocess below does fbank THEN the AST transpose.
    def ast_batches(loader):
        for x, y, _ids in loader:
            yield (x if wf else x.transpose(0, 1, 3, 2)), y

    preprocess = None
    if wf:
        import dataclasses as _dc

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
        fc_eval = _dc.replace(fc_train, freqm=0, timem=0, noise=False)

        def preprocess(x, rng, specaug, train):
            fc = fc_train if (train and specaug) else (
                _dc.replace(fc_train, freqm=0, timem=0) if train else fc_eval
            )
            spec = device_frontend(x, fc, rng=rng, train=train)  # (B,1,T,F)
            return spec.transpose(0, 1, 3, 2)  # AST orientation

        # identity for the engine's process-level compiled-step memo
        preprocess.cache_key = ("ast_frontend", fc_train)

    mesh = mesh_lib.make_mesh()

    def init_params():
        x0 = jnp.zeros((1, 1, model_cfg.num_mel_bins, model_cfg.target_length))
        params = model.init({"params": jax.random.PRNGKey(args.seed)}, x0)["params"]
        # construction-branch selection mirrors ast_models.py:273-381:
        # audioset_pretrain -> full AudioSet checkpoint (requires ImageNet
        # pretraining underneath, :345); imagenet_pretrain alone -> DeiT
        # surgery; neither -> from-scratch (fresh trunc-normal(0.02)
        # pos-embed, :327-331 — exactly this model's cold init).
        if args.audioset_pretrained_model_path and not args.audioset_pretrain:
            # a supplied checkpoint with audioset_pretrain=False would be
            # silently ignored — fail loudly instead (the reference only
            # consults the path when audioset_pretrain=True,
            # ast_models.py:343-349)
            raise ValueError(
                "--audioset_pretrained_model_path was given but "
                "--audioset_pretrain is False; pass --audioset_pretrain "
                "True to load it"
            )
        if args.audioset_pretrain:
            if not args.imagenet_pretrain:
                raise ValueError(
                    "audioset_pretrain requires imagenet_pretrain=True "
                    "(ast_models.py:344-345)"
                )
            path = args.audioset_pretrained_model_path
            if not path or not os.path.exists(path):
                # the reference hard-asserts on a missing checkpoint
                # (ast_models.py:347-349)
                raise FileNotFoundError(
                    f"--audioset_pretrained_model_path {path!r} not found"
                )
            sd = ti.load_torch_state_dict(path)
            imported = ti.ast_params_from_state_dict(sd, model_cfg)
            # the reference's audioset-pretrain path ALWAYS constructs a
            # fresh mlp_head (LayerNorm + Linear, ast_models.py:352), even
            # when label_dim matches — never warm-start the head here
            imported.pop("mlp_head", None)
            imported.pop("mlp_head_norm", None)
            params = ti.overlay_params(params, imported)
            print(f"loaded AST checkpoint {path}")
        elif args.imagenet_pretrain:
            path = args.imagenet_pretrained_model_path
            if not path or not os.path.exists(path):
                raise FileNotFoundError(
                    "--imagenet_pretrain True needs a local DeiT checkpoint "
                    "via --imagenet_pretrained_model_path (the reference "
                    "downloads vit_deit_base_distilled_patch16_384 through "
                    f"timm, ast_models.py:275); got {path!r}"
                )
            sd = ti.load_torch_state_dict(path)
            imported = ti.deit_params_from_state_dict(sd, model_cfg)
            params = ti.overlay_params(params, imported)
            print(f"loaded DeiT ImageNet checkpoint {path}")
        return params

    os.makedirs(args.exp_dir or ".", exist_ok=True)

    # ablation wiring (run.py:204-215)
    intensity_band = None
    if args.drop_token_blk_idx is not None:
        intensity_band = (
            args.retain_min, args.retain_max, args.drop_token_blk_idx
        )

    if args.eval:
        best = os.path.join(args.exp_dir, "models", "best_audio_model")
        if not os.path.exists(best):
            # the reference torch.load fails loudly on a missing
            # best_audio_model.pth (run.py:258) — never silently score
            # freshly-initialized weights
            raise FileNotFoundError(
                f"no best checkpoint at {best}; train first or fix --exp-dir"
            )
        params = restore_checkpoint(best)["params"]
        writer = None
        if args.flag_extract_features:
            # exist_ok=False (run.py:261): stale batch files from an older
            # run would be globbed together with fresh ones downstream
            os.makedirs(args.extract_features_path, exist_ok=False)
            writer = FeatureWriter(args.extract_features_path)
        # speechcommands scores the held-out test split, others the val
        # loader (run.py:264-270)
        if args.dataset == "speechcommands" and args.data_eval:
            ds_test = AudiosetDataset(
                args.data_eval, data_cfg, args.label_csv, train=False,
                return_waveform=wf,
            )
            eval_loader = DataLoader(
                ds_test, args.batch_size, shuffle=False,
                num_workers=args.num_workers,
            )
        else:
            eval_loader = loader_val
        batches = ast_batches(eval_loader)
        if args.metrics == "acc":
            stats = eval_lib.evaluate_classification(
                model, params, batches, args.batch_size, mesh,
                feature_writer=writer, preprocess=preprocess,
                custom_rank=args.custom_rank, intensity_band=intensity_band,
            )
            score = stats["acc1"] / 100.0
            print("acc: {:.6f}".format(score))
        else:
            stats = eval_lib.evaluate_multilabel(
                model, params, batches, args.batch_size, mesh,
                feature_writer=writer, preprocess=preprocess,
                custom_rank=args.custom_rank, intensity_band=intensity_band,
            )
            score = stats["mAP"]
            print("mAP: {:.6f}".format(score))
        np.savetxt(
            os.path.join(args.exp_dir, args.eval_result_path), [-1, score]
        )
        return score

    # full-arg provenance dump before training (run.py:223-224)
    if is_main:
        import yaml

        with open(os.path.join(args.exp_dir, "args.yaml"), "w") as f:
            yaml.dump(vars(args), f)

    ds_train = AudiosetDataset(
        args.data_train, data_cfg, args.label_csv, train=True,
        seed=args.seed, return_waveform=wf,
    )
    from tpat_tpu.data.device_cache import maybe_device_cached

    train_sampler = EpochShardSampler(
        len(ds_train), shuffle=True, seed=args.seed,
        world=world, rank=rank,
    )
    loader_train = maybe_device_cached(
        ds_train, args.batch_size, sampler=train_sampler,
        num_workers=args.num_workers, drop_last=True,
        mode=getattr(args, "device_dataset", "auto"), label="train set",
    ) or DataLoader(
        ds_train, args.batch_size, sampler=train_sampler,
        num_workers=args.num_workers, drop_last=True,
    )

    train_cfg = cfg_lib.TrainConfig(
        batch_size=args.batch_size,
        epochs=args.n_epochs + 1,  # AST counts epochs 1..n_epochs
        lr=args.lr,
        seed=args.seed,
        base_keep_rate=args.base_keep_rate,
        drop_loc=drop_loc,
        shrink_start_epoch=args.shrink_start_epoch,
        shrink_epochs=args.shrink_epochs,
        optimizer="ast_adam",
        lrscheduler_start=args.lrscheduler_start,
        lrscheduler_step=args.lrscheduler_step,
        lrscheduler_decay=args.lrscheduler_decay,
        warmup=bool(args.warmup),
        keep_rate_iter_mode="per_epoch",
        epoch_base=1,
        num_hosts=world,
    )
    module = TrainModule(
        model=model,
        model_cfg=model_cfg,
        train_cfg=train_cfg,
        loss_type=data_cfg.loss_type,
        iters_per_epoch=len(loader_train),
        mesh=mesh,
        custom_rank=args.custom_rank,  # run.py:204-206 sets it model-wide
        preprocess=preprocess,
    )
    state = module.load(init_params(), seed=args.seed)
    scratch = os.path.join(args.ramdisk_dir or args.exp_dir, "models")
    # AST keeps the FIRST epoch on score ties (traintest.py:236-247 uses
    # strict '>'), unlike the AudioMAE driver's last-wins
    keeper = BestCheckpointKeeper(
        scratch, os.path.join(args.exp_dir, "models"), ties="first",
        async_save=args.async_checkpoint,
        snapshot_on_device=args.best_on_device,
    )

    import pickle
    import time as _time

    progress = []  # progress.pkl bookkeeping (traintest.py:72-76)
    start_time = _time.time()
    result = np.zeros([args.n_epochs, 4])
    for epoch in range(1, args.n_epochs + 1):
        loader_train.set_epoch(epoch)
        if args.base_keep_rate < 1.0 and epoch >= args.shrink_start_epoch:
            loader_train.dataset.freqm = 0
            loader_train.dataset.timem = 0
        state, tstats = module.train_epoch(
            state, ast_batches(loader_train), epoch, log_every=args.n_print_steps
        )
        batches = ast_batches(loader_val)
        if args.metrics == "acc":
            vstats = eval_lib.evaluate_classification(
                model, state.params, batches, args.batch_size, mesh,
                preprocess=preprocess,
            )
            score = vstats["acc1"] / 100.0
        else:
            vstats = eval_lib.evaluate_multilabel(
                model, state.params, batches, args.batch_size, mesh,
                preprocess=preprocess,
            )
            score = vstats["mAP"]
        print(f"epoch {epoch}: train_loss={tstats['loss']:.4f} score={score:.6f}")
        result[epoch - 1] = [epoch, score, tstats["loss"], 0.0]
        if is_main:
            np.savetxt(
                os.path.join(args.exp_dir, "result.csv"), result, delimiter=","
            )
        if epoch >= args.first_eval_epoch:
            if is_main:
                keeper.update(score, state, epoch)
            else:
                # the collective eval computed the same score on every
                # rank; track it so non-main progress rows and the
                # non-main return value carry the real best, not -inf
                keeper.track(score, epoch)
        progress.append(
            [epoch, epoch * len(loader_train), keeper.best_epoch,
             keeper.best_score, _time.time() - start_time]
        )
        if is_main:
            with open(os.path.join(args.exp_dir, "progress.pkl"), "wb") as f:
                pickle.dump(progress, f)

    if not is_main:
        return keeper.best_score
    keeper.finalize()
    best_dir = os.path.join(args.exp_dir, "models", "best_model")
    if os.path.exists(best_dir):
        os.rename(
            best_dir, os.path.join(args.exp_dir, "models", "best_audio_model")
        )
    np.savetxt(
        os.path.join(args.exp_dir, "best_result.csv"),
        [keeper.best_epoch, keeper.best_score],
        delimiter=",",
    )

    # speechcommands: evaluate the best-on-validation model on the held-out
    # test set and write eval_result.csv = [val_acc, val_auc, eval_acc,
    # eval_auc] (run.py:230-255)
    if args.dataset == "speechcommands" and args.data_eval:
        if world > 1:
            # only rank 0 reaches this point (non-main returned above) and
            # a global-mesh eval is a collective — running it here alone
            # would deadlock.  Run it single-process via --eval instead.
            print(
                "[run_ast] skipping the final SPC dual eval under "
                "multi-host; rerun single-process with --eval"
            )
            return keeper.best_score
        best = os.path.join(args.exp_dir, "models", "best_audio_model")
        params = restore_checkpoint(best)["params"]
        ds_eval = AudiosetDataset(
            args.data_eval, data_cfg, args.label_csv, train=False,
            return_waveform=wf,
        )
        loader_eval = DataLoader(
            ds_eval, args.batch_size, shuffle=False,
            num_workers=args.num_workers,
        )
        val_stats = eval_lib.evaluate_classification(
            model, params, ast_batches(loader_val), args.batch_size, mesh,
            preprocess=preprocess,
        )
        eval_stats = eval_lib.evaluate_classification(
            model, params, ast_batches(loader_eval), args.batch_size, mesh,
            preprocess=preprocess,
        )
        np.savetxt(
            os.path.join(args.exp_dir, "eval_result.csv"),
            [val_stats["acc1"] / 100.0, 0.0, eval_stats["acc1"] / 100.0, 0.0],
        )
        print(
            f"valid acc {val_stats['acc1'] / 100:.6f}, "
            f"test acc {eval_stats['acc1'] / 100:.6f}"
        )
    return keeper.best_score


def cli(argv=None):
    """Console-script entry point (``tpat-run-ast``)."""
    main(get_parser().parse_args(argv))


if __name__ == "__main__":
    cli()
