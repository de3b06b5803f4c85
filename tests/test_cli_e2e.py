"""End-to-end CLI smokes on the virtual CPU mesh: the full finetune
train→eval→extract→analyze loop and the AST driver, at tiny scale, through
the real argparse entry points."""

import json
import math
import os
import sys

import numpy as np
import pytest

from tpat_tpu.data.wav import save_wav


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    root = tmp_path_factory.mktemp("cli_corpus")
    sr = 16000
    rng = np.random.default_rng(0)
    entries = {"tr": [], "ev": []}
    for split, n in (("tr", 16), ("ev", 8)):
        for i in range(n):
            cls = i % 4
            t = np.arange(sr) / sr  # 1 s -> 98 frames
            wave = 0.4 * np.sin(2 * math.pi * (300 + 200 * cls) * t)
            wave += 0.02 * rng.normal(size=sr)
            path = str(root / f"{split}{i}.wav")
            save_wav(path, wave.astype(np.float32), sr)
            entries[split].append({"wav": path, "labels": f"/m/{cls:02d}"})
    json.dump({"data": entries["tr"]}, open(root / "train.json", "w"))
    json.dump({"data": entries["ev"]}, open(root / "eval.json", "w"))
    with open(root / "labels.csv", "w") as f:
        f.write("index,mid,display_name\n")
        for c in range(4):
            f.write(f'{c},/m/{c:02d},"tone {c}"\n')
    return root


def test_finetune_cli_full_loop(corpus, tmp_path):
    from tpat_tpu.cli.finetune import get_args_parser, main

    out = tmp_path / "out"
    argv = [
        "--dataset", "esc50", "--model", "audiomae_vit_tiny",
        "--target_length", "128",
        "--data_train", str(corpus / "train.json"),
        "--data_eval", str(corpus / "eval.json"),
        "--label_csv", str(corpus / "labels.csv"),
        "--nb_classes", "4", "--batch_size", "8", "--epochs", "3",
        "--blr", "2e-3", "--warmup_epochs", "1",
        "--base_keep_rate", "0.6", "--drop_loc", "(1, 3)",
        "--shrink_start_epoch", "1", "--shrink_epochs", "1",
        "--freqm", "4", "--timem", "8", "--drop_path", "0.1",
        "--output_dir", str(out),
        "--result_path", str(tmp_path / "result.txt"),
        "--num_workers", "2",
        # async best-checkpoint writes through the CLI (the sync path is
        # covered by test_finetune_cli_resume and the keeper unit tests)
        "--async_checkpoint", "True",
    ]
    main(get_args_parser().parse_args(argv))
    assert (out / "args.yaml").exists()
    assert (out / "log.txt").exists()
    logs = [json.loads(l) for l in open(out / "log.txt")]
    assert [l["train_phase"] for l in logs] == ["dense", "anneal", "static"]
    markers = [p for p in os.listdir(out) if p.startswith("best-")]
    assert len(markers) == 1
    assert (out / "best_model").exists()
    assert float(open(tmp_path / "result.txt").read()) >= 0

    # eval + extraction on the trained model
    feats = tmp_path / "feats"
    argv_eval = argv[: argv.index("--output_dir")] + [
        "--output_dir", str(out),
        "--eval", "--finetuned_model_path", str(out / "best_model"),
        "--flag_extract_features", "true",
        "--extract_features_path", str(feats),
        "--result_path", str(tmp_path / "eval_result.txt"),
    ]
    main(get_args_parser().parse_args(argv_eval))
    files = os.listdir(feats)
    assert any(f.startswith("mel.") for f in files)
    assert any(f.startswith("block-1.topk_idx.") for f in files)

    # analysis over the extraction
    from tpat_tpu.analysis.extract_stats import kendall_rank

    taus, info = kendall_rank(str(feats), None, "mean", num_blocks=12)
    assert len(taus) == 6 and all(-1 <= t <= 1 for t in taus)


def test_finetuned_pth_roundtrip_eval(corpus, tmp_path):
    """The full interchange loop on a TRAINED model: finetune ->
    tpat-convert (orbax -> reference-layout .pth) -> eval from the .pth
    reproduces the orbax best_model's accuracy exactly, and
    export_serving loads the same .pth.

    Regression: a finetuned checkpoint carries the MODEL-geometry pos
    embed — the reference loads it strict=True with NO crop surgery
    (main_finetune.py:424-426) — but the .pth leg used to route through
    the AudioSet-pretrain (8, 64) crop, crashing on any geometry with
    grid_t != 64 (every target_length != 1024)."""
    from tpat_tpu.cli.convert import get_parser as cvt_parser
    from tpat_tpu.cli.convert import main as cvt_main
    from tpat_tpu.cli.finetune import get_args_parser, main

    out = tmp_path / "out"
    argv = [
        "--dataset", "esc50", "--model", "audiomae_vit_tiny",
        "--target_length", "128",
        "--data_train", str(corpus / "train.json"),
        "--data_eval", str(corpus / "eval.json"),
        "--label_csv", str(corpus / "labels.csv"),
        "--nb_classes", "4", "--batch_size", "8", "--epochs", "2",
        "--blr", "2e-3", "--warmup_epochs", "1",
        "--base_keep_rate", "0.6", "--drop_loc", "(1, 3)",
        "--shrink_start_epoch", "1", "--shrink_epochs", "1",
        "--output_dir", str(out),
        "--result_path", str(tmp_path / "result.txt"),
        "--num_workers", "2",
    ]
    main(get_args_parser().parse_args(argv))

    def eval_from(path, tag):
        main(get_args_parser().parse_args(argv[: argv.index("--output_dir")] + [
            "--output_dir", str(out),
            "--eval", "--finetuned_model_path", str(path),
            "--result_path", str(tmp_path / f"{tag}.txt"),
        ]))
        return float(open(tmp_path / f"{tag}.txt").read())

    acc_orbax = eval_from(out / "best_model", "eval_orbax")

    pth = tmp_path / "best.pth"
    cvt_main(cvt_parser().parse_args([
        "--checkpoint", str(out / "best_model"), "--out", str(pth),
    ]))
    acc_pth = eval_from(pth, "eval_pth")
    assert acc_pth == acc_orbax

    # the second fixed call site: export_serving from the same .pth
    from tpat_tpu.cli.export_serving import get_parser as exp_parser
    from tpat_tpu.cli.export_serving import main as exp_main
    from tpat_tpu.utils import serving

    artifact = exp_main(exp_parser().parse_args([
        "--model", "audiomae_vit_tiny", "--dataset", "esc50",
        "--nb_classes", "4", "--target_length", "128",
        "--base_keep_rate", "0.6", "--drop_loc", "(1, 3)",
        "--finetuned_model_path", str(pth),
        "--batch_size", "2", "--out_dir", str(tmp_path / "artifact"),
    ]))
    fn, _meta = serving.load_forward(artifact)
    assert np.asarray(
        fn(np.zeros((2, 1, 128, 128), np.float32))
    ).shape == (2, 4)


def test_run_ast_cli(corpus, tmp_path):
    from tpat_tpu.cli.run_ast import get_parser, main

    exp = tmp_path / "exp"
    argv = [
        "--dataset", "esc50", "--model_size", "tiny_debug",
        "--data-train", str(corpus / "train.json"),
        "--data-val", str(corpus / "eval.json"),
        "--label-csv", str(corpus / "labels.csv"),
        "--n_class", "4", "-b", "8", "--n-epochs", "2",
        "--audio_length", "128", "--metrics", "acc", "--loss", "CE",
        "--lr", "1e-4", "--warmup", "True",
        "--lrscheduler_start", "5", "--drop_loc", "(1, 3)",
        "--base_keep_rate", "0.6",
        "--imagenet_pretrain", "False",  # from-scratch branch
        "--exp-dir", str(exp), "-w", "2",
    ]
    score = main(get_parser().parse_args(argv))
    assert 0.0 <= score <= 1.0
    assert (exp / "args.yaml").exists()  # provenance dump (run.py:223-224)
    assert (exp / "result.csv").exists()
    assert (exp / "best_result.csv").exists()
    assert (exp / "progress.pkl").exists()
    assert (exp / "models" / "best_audio_model").exists()

    # eval path reads the saved best model, with feature extraction
    # (the reference's AST extraction branch is broken upstream —
    # ast_models.py:140 syntax error; it works here)
    feats = tmp_path / "ast_feats"
    argv_eval = argv + [
        "--eval", "--flag_extract_features", "true",
        "--extract_features_path", str(feats),
    ]
    score2 = main(get_parser().parse_args(argv_eval))
    assert abs(score2 - score) < 1e-6
    assert (exp / "eval_result.csv").exists()
    files = os.listdir(feats)
    assert any(f.startswith("mel.") for f in files)
    assert any(f.startswith("block-1.topk_idx.") for f in files)


def test_run_ast_cli_device_frontend(corpus, tmp_path):
    """--device_frontend on the AST driver: raw waveforms from the
    loader, on-device fbank + normalization, THEN the AST (B,1,F,T)
    transpose (ast_models.py:434-436) inside the compiled step."""
    from tpat_tpu.cli.run_ast import get_parser, main

    exp = tmp_path / "exp_wf"
    argv = [
        "--dataset", "esc50", "--model_size", "tiny_debug",
        "--device_frontend", "true",
        "--data-train", str(corpus / "train.json"),
        "--data-val", str(corpus / "eval.json"),
        "--label-csv", str(corpus / "labels.csv"),
        "--n_class", "4", "-b", "8", "--n-epochs", "2",
        "--audio_length", "128", "--metrics", "acc", "--loss", "CE",
        "--lr", "1e-4", "--warmup", "False",
        "--lrscheduler_start", "5", "--drop_loc", "(1, 3)",
        "--base_keep_rate", "0.6",
        "--freqm", "4", "--timem", "8",
        "--imagenet_pretrain", "False",
        "--exp-dir", str(exp), "-w", "2",
    ]
    score = main(get_parser().parse_args(argv))
    assert 0.0 <= score <= 1.0
    assert (exp / "models" / "best_audio_model").exists()
    # eval reloads through the same on-device frontend
    score2 = main(get_parser().parse_args(argv + ["--eval"]))
    assert abs(score2 - score) < 1e-6


def test_finetune_cli_device_frontend(corpus, tmp_path):
    """--device_frontend: raw waveforms from the loader, fbank + SpecAug +
    normalization fused into the compiled step on-device."""
    from tpat_tpu.cli.finetune import get_args_parser, main

    out = tmp_path / "out_wf"
    argv = [
        "--dataset", "esc50", "--model", "audiomae_vit_tiny",
        "--target_length", "96", "--device_frontend", "true",
        "--data_train", str(corpus / "train.json"),
        "--data_eval", str(corpus / "eval.json"),
        "--label_csv", str(corpus / "labels.csv"),
        "--nb_classes", "4", "--batch_size", "8", "--epochs", "2",
        "--blr", "2e-3", "--warmup_epochs", "1",
        "--base_keep_rate", "0.6", "--drop_loc", "(1, 3)",
        "--shrink_start_epoch", "1", "--shrink_epochs", "1",
        "--freqm", "4", "--timem", "8",
        "--output_dir", str(out),
        "--result_path", str(tmp_path / "wf_result.txt"),
        "--num_workers", "2",
    ]
    main(get_args_parser().parse_args(argv))
    assert (out / "best_model").exists()
    # eval through the device frontend as well
    argv_eval = argv[: argv.index("--output_dir")] + [
        "--output_dir", str(out),
        "--eval", "--finetuned_model_path", str(out / "best_model"),
        "--result_path", str(tmp_path / "wf_eval.txt"),
    ]
    main(get_args_parser().parse_args(argv_eval))
    assert float(open(tmp_path / "wf_eval.txt").read()) >= 0


def test_finetune_cli_resume(corpus, tmp_path):
    """--save_every_epochs + --resume: crash-resume continues from the
    saved epoch and completes."""
    import jax.numpy as jnp

    from tpat_tpu.cli.finetune import get_args_parser, main

    out = tmp_path / "out_resume"
    base = [
        "--dataset", "esc50", "--model", "audiomae_vit_tiny",
        "--target_length", "96",
        "--data_train", str(corpus / "train.json"),
        "--data_eval", str(corpus / "eval.json"),
        "--label_csv", str(corpus / "labels.csv"),
        "--nb_classes", "4", "--batch_size", "8",
        "--blr", "1e-3", "--warmup_epochs", "1", "--drop_loc", "(1, 3)",
        "--output_dir", str(out), "--num_workers", "2",
        "--save_every_epochs", "1",
    ]
    main(get_args_parser().parse_args(base + ["--epochs", "2"]))
    assert (out / "last_checkpoint").exists()
    logs_before = open(out / "log.txt").read().count("\n")
    assert logs_before == 2

    # resume for 2 more epochs (total 4); start_epoch comes from the ckpt
    main(
        get_args_parser().parse_args(
            base + ["--epochs", "4", "--resume", str(out / "last_checkpoint")]
        )
    )
    logs = [l for l in open(out / "log.txt").read().splitlines() if l]
    import json as _json

    epochs = [_json.loads(l)["epoch"] for l in logs]
    assert epochs == [0, 1, 2, 3]  # resumed at 2, no repeats


def test_pretrain_cli_smoke_resume_and_export(corpus, tmp_path):
    """The MAE pretraining driver (the workflow the reference references
    but does not ship, run_pretrain.sh:18): trains, checkpoints, resumes
    from the orbax dir, and exports a reference-layout mae_pretrained.pth
    that re-imports losslessly."""
    from tpat_tpu.cli.pretrain import get_args_parser, main

    out = tmp_path / "pre"
    base = [
        "--dataset", "esc50", "--model", "mae_vit_tiny",
        "--target_length", "128",
        "--data_train", str(corpus / "train.json"),
        "--label_csv", str(corpus / "labels.csv"),
        "--batch_size", "8", "--warmup_epochs", "1",
        "--save_every_epochs", "1", "--num_workers", "2",
        "--output_dir", str(out),
    ]
    main(get_args_parser().parse_args(base + ["--epochs", "2"]))
    logs = [json.loads(l) for l in open(out / "log.txt") if l.strip()]
    assert [e["epoch"] for e in logs] == [0, 1]
    assert all(np.isfinite(e["loss"]) for e in logs)
    assert (out / "checkpoint-001").exists()
    assert (out / "mae_pretrained.pth").exists()

    # resume continues at epoch 2, no repeats
    main(
        get_args_parser().parse_args(
            base
            + ["--epochs", "3", "--resume", str(out / "checkpoint-001")]
        )
    )
    logs = [json.loads(l) for l in open(out / "log.txt") if l.strip()]
    assert [e["epoch"] for e in logs] == [0, 1, 2]

    # the exported .pth is the reference pretraining layout
    from tpat_tpu.utils.torch_import import (
        load_torch_state_dict,
        mae_params_from_state_dict,
    )

    sd = load_torch_state_dict(str(out / "mae_pretrained.pth"))
    params = mae_params_from_state_dict(sd)
    assert "decoder_blocks_0" in params
    assert "logit_scale" in params["decoder_blocks_0"]["attn"]

    # --resume also accepts a reference-layout .pth (continue pretraining
    # from the reference's released checkpoint: weights only, fresh
    # optimizer, epoch 0)
    out2 = tmp_path / "pre_from_pth"
    main(
        get_args_parser().parse_args(
            base[:-2]
            + ["--output_dir", str(out2), "--epochs", "1",
               "--resume", str(out / "mae_pretrained.pth")]
        )
    )
    logs2 = [json.loads(l) for l in open(out2 / "log.txt") if l.strip()]
    assert [e["epoch"] for e in logs2] == [0]
    assert np.isfinite(logs2[0]["loss"])


def test_pretrain_to_finetune_chain(corpus, tmp_path):
    """The complete AudioMAE workflow the reference documents but cannot
    run (run_pretrain.sh -> ft_*.sh): pretrain an MAE, export the
    reference-layout .pth, then finetune FROM it at a shorter
    target_length — exercising the pos-embed time-crop surgery
    (main_finetune.py:384-426) on our own pretraining artifact."""
    from tpat_tpu.cli import finetune as ft
    from tpat_tpu.cli import pretrain as pt

    pre = tmp_path / "pre"
    pt.main(pt.get_args_parser().parse_args([
        "--dataset", "esc50", "--model", "mae_vit_tiny",
        "--target_length", "128",
        "--data_train", str(corpus / "train.json"),
        "--label_csv", str(corpus / "labels.csv"),
        "--batch_size", "8", "--epochs", "1", "--warmup_epochs", "1",
        "--save_every_epochs", "1", "--num_workers", "2",
        "--output_dir", str(pre),
    ]))
    pth = pre / "mae_pretrained.pth"
    assert pth.exists()

    out = tmp_path / "ft"
    ft.main(ft.get_args_parser().parse_args([
        "--dataset", "esc50", "--model", "audiomae_vit_tiny",
        "--target_length", "64",  # pretrained at 128: grid (8,8)->(8,4) crop
        "--audioset_pretrained_model_path", str(pth),
        "--data_train", str(corpus / "train.json"),
        "--data_eval", str(corpus / "eval.json"),
        "--label_csv", str(corpus / "labels.csv"),
        "--nb_classes", "4", "--batch_size", "8", "--epochs", "1",
        "--blr", "2e-3", "--warmup_epochs", "1",
        "--base_keep_rate", "0.6", "--drop_loc", "(1, 3)",
        "--shrink_start_epoch", "2", "--shrink_epochs", "1",
        "--output_dir", str(out),
        "--result_path", str(tmp_path / "chain_result.txt"),
        "--num_workers", "2",
    ]))
    logs = [json.loads(l) for l in open(out / "log.txt")]
    assert len(logs) == 1 and np.isfinite(logs[0]["train_loss"])

    # the pretrained encoder actually landed: the finetuned best_model's
    # patch-embed conv started from (and for frozen pos-embed, equals) the
    # exported one after the crop surgery
    import jax

    from tpat_tpu.utils import checkpoint as ckpt_lib
    from tpat_tpu.utils.torch_import import load_torch_state_dict

    from tpat_tpu.models import pos_embed as pe

    sd = load_torch_state_dict(str(pth))
    restored = ckpt_lib.restore_checkpoint(str(out / "best_model"))
    pos = np.asarray(restored["params"]["pos_embed"])
    # frozen pos embed: the finetuned model still carries the pretrain
    # table after the (8,8)->(8,4) time-crop surgery (crop arithmetic
    # itself is parity-tested against the real reference function in
    # test_reference_layout.py)
    want = pe.crop_time_audio_pos_embed(
        np.asarray(sd["pos_embed"]), (8, 8), (8, 4), num_extra_tokens=1
    )
    assert want.shape == pos.shape == (1, 33, 192)
    np.testing.assert_array_equal(pos, want)


def test_keeper_tie_semantics(tmp_path):
    """AudioMAE keeps the LAST epoch on ties (main_finetune.py:548 '<='),
    AST keeps the FIRST (traintest.py:236-247 strict '>')."""
    from tpat_tpu.utils.checkpoint import BestCheckpointKeeper

    class S:
        params = {"w": np.zeros(2)}
        opt_state = {}
        step = 0

    last = BestCheckpointKeeper(str(tmp_path / "a"), str(tmp_path / "b"))
    for ep, sc in [(1, 0.5), (2, 0.5), (3, 0.4)]:
        last.update(sc, S(), ep)
    assert last.best_epoch == 2

    first = BestCheckpointKeeper(
        str(tmp_path / "c"), str(tmp_path / "d"), ties="first"
    )
    for ep, sc in [(1, 0.5), (2, 0.5), (3, 0.4)]:
        first.update(sc, S(), ep)
    assert first.best_epoch == 1

    # non-main ranks track the (identical, collective) score without
    # writing: best_score must match the writing keeper, scratch stays
    # empty — otherwise run_ast's non-main return value reads -inf
    tracker = BestCheckpointKeeper(str(tmp_path / "e"), str(tmp_path / "f"))
    for ep, sc in [(1, 0.5), (2, 0.5), (3, 0.4)]:
        tracker.track(sc, ep)
    assert (tracker.best_score, tracker.best_epoch) == (
        last.best_score, last.best_epoch)
    assert os.listdir(tmp_path / "e") == []

    # a NaN score never becomes (or dethrones) the best — the reference's
    # `max_score <= score` comparison is False for NaN (main_finetune:548)
    nankeeper = BestCheckpointKeeper(str(tmp_path / "g"), str(tmp_path / "h"))
    for ep, sc in [(1, 0.9), (2, float("nan")), (3, 0.3)]:
        nankeeper.update(sc, S(), ep)
    assert (nankeeper.best_score, nankeeper.best_epoch) == (0.9, 1)
    # and the surviving scratch checkpoint is the real best's
    assert os.listdir(tmp_path / "g") == ["checkpoint-001"]


def test_run_ast_eval_requires_checkpoint(corpus, tmp_path):
    """--eval on a missing best checkpoint fails loudly (run.py:258), not
    silently scoring fresh weights."""
    from tpat_tpu.cli.run_ast import get_parser, main

    argv = [
        "--dataset", "esc50", "--model_size", "tiny_debug",
        "--data-val", str(corpus / "eval.json"),
        "--label-csv", str(corpus / "labels.csv"),
        "--n_class", "4", "-b", "8", "--audio_length", "128",
        "--metrics", "acc", "--loss", "CE", "--drop_loc", "(1, 3)",
        "--imagenet_pretrain", "False",
        "--exp-dir", str(tmp_path / "nope"), "--eval",
    ]
    with pytest.raises(FileNotFoundError, match="best checkpoint"):
        main(get_parser().parse_args(argv))


def test_finetune_args_checker_mask_probs():
    from tpat_tpu.cli.finetune import args_checker, get_args_parser

    args = get_args_parser().parse_args(
        ["--data_train", "x", "--data_eval", "y", "--label_csv", "z",
         "--dataset", "esc50", "--nb_classes", "4",
         "--batch_size", "8", "--epochs", "1",
         "--mask_t_prob", "0.7", "--mask_f_prob", "0.3"]
    )
    with pytest.raises(AssertionError, match="mask_t_prob"):
        args_checker(args)


def test_pretrained_head_kernel_reinitialized(corpus, tmp_path):
    """After a pretrained load the head KERNEL is freshly initialized
    (trunc_normal 2e-5, main_finetune.py:424) even when the checkpoint
    carries a matching-width head; the bias may overlay."""
    import jax
    import jax.numpy as jnp

    from tpat_tpu.cli import finetune as ft
    from tpat_tpu.config import audiomae_vit_tiny
    from tpat_tpu.models.vit import AudioViT
    from tpat_tpu.utils.torch_export import save_pth

    cfg = audiomae_vit_tiny(
        compute_dtype="float32",
        target_length=64, num_classes=4, drop_loc=(1,), base_keep_rate=0.6,
        drop_path_rate=0.0,
    )
    model = AudioViT(cfg)
    x0 = jnp.zeros((1, 1, 64, 128))
    donor = model.init({"params": jax.random.PRNGKey(9)}, x0)["params"]
    donor["head"]["kernel"] = np.full_like(
        np.asarray(donor["head"]["kernel"]), 7.0
    )
    donor["head"]["bias"] = np.full_like(
        np.asarray(donor["head"]["bias"]), 3.0
    )
    pth = tmp_path / "donor.pth"
    save_pth(str(pth), donor, flavor="audiomae", epoch=0)

    args = ft.get_args_parser().parse_args([
        "--dataset", "esc50", "--model", "audiomae_vit_tiny",
        "--target_length", "64", "--nb_classes", "4",
        "--data_train", str(corpus / "train.json"),
        "--data_eval", str(corpus / "eval.json"),
        "--label_csv", str(corpus / "labels.csv"),
        "--base_keep_rate", "0.6", "--drop_loc", "(1,)",
        "--batch_size", "8", "--epochs", "1",
        "--audioset_pretrained_model_path", str(pth),
    ])
    params = ft.load_params(args, model, cfg)
    k = np.asarray(params["head"]["kernel"])
    assert np.abs(k).max() < 1e-3  # fresh trunc_normal(2e-5), not 7.0
    np.testing.assert_array_equal(np.asarray(params["head"]["bias"]), 3.0)
    # trunk weights DID come from the checkpoint
    np.testing.assert_array_equal(
        np.asarray(params["cls_token"]), np.asarray(donor["cls_token"])
    )


def test_run_ast_cli_imagenet_pretrain_branch(corpus, tmp_path):
    """--imagenet_pretrain True consumes a local DeiT checkpoint through
    the real CLI: the trunk starts from the RGB-summed patch embed and
    the surgically adapted pos-embed (ast_models.py:273-325)."""
    import torch

    from tpat_tpu.cli.run_ast import get_parser, main
    from tpat_tpu.utils.checkpoint import restore_checkpoint

    # synthetic DeiT state dict at tiny_debug scale (d=192, depth=6)
    rng = np.random.default_rng(21)
    d, depth, hw = 192, 6, 24
    sd = {}

    def put(k, shape, scale=0.05):
        sd[k] = torch.from_numpy(
            (rng.normal(size=shape) * scale).astype(np.float32)
        )

    put("cls_token", (1, 1, d))
    put("dist_token", (1, 1, d))
    put("pos_embed", (1, 2 + hw * hw, d))
    put("patch_embed.proj.weight", (d, 3, 16, 16))
    put("patch_embed.proj.bias", (d,))
    for i in range(depth):
        b = f"blocks.{i}"
        put(f"{b}.norm1.weight", (d,), 1.0)
        put(f"{b}.norm1.bias", (d,))
        put(f"{b}.attn.qkv.weight", (3 * d, d), 0.2)
        put(f"{b}.attn.qkv.bias", (3 * d,))
        put(f"{b}.attn.proj.weight", (d, d))
        put(f"{b}.attn.proj.bias", (d,))
        put(f"{b}.norm2.weight", (d,), 1.0)
        put(f"{b}.norm2.bias", (d,))
        put(f"{b}.mlp.fc1.weight", (4 * d, d))
        put(f"{b}.mlp.fc1.bias", (4 * d,))
        put(f"{b}.mlp.fc2.weight", (d, 4 * d))
        put(f"{b}.mlp.fc2.bias", (d,))
    put("norm.weight", (d,), 1.0)
    put("norm.bias", (d,))
    put("head.weight", (1000, d))  # importer must ignore DeiT heads
    put("head.bias", (1000,))
    pth = tmp_path / "deit_tiny.pth"
    torch.save(sd, str(pth))

    exp = tmp_path / "exp_deit"
    argv = [
        "--dataset", "esc50", "--model_size", "tiny_debug",
        "--data-train", str(corpus / "train.json"),
        "--data-val", str(corpus / "eval.json"),
        "--label-csv", str(corpus / "labels.csv"),
        "--n_class", "4", "-b", "8", "--n-epochs", "1",
        "--audio_length", "128", "--metrics", "acc", "--loss", "CE",
        "--lr", "1e-4", "--drop_loc", "(1, 3)", "--base_keep_rate", "0.6",
        "--imagenet_pretrain", "True",
        "--imagenet_pretrained_model_path", str(pth),
        "--exp-dir", str(exp), "-w", "2",
    ]
    score = main(get_parser().parse_args(argv))
    assert 0.0 <= score <= 1.0
    assert (exp / "models" / "best_audio_model").exists()

    # missing checkpoint fails loudly (reference downloads via timm;
    # zero-egress here requires the local path)
    argv_bad = [a for a in argv if a != str(pth)]
    argv_bad[argv_bad.index("--imagenet_pretrained_model_path")] = (
        "--imagenet_pretrained_model_path"
    )
    argv_bad.insert(
        argv_bad.index("--imagenet_pretrained_model_path") + 1, "/nope.pth"
    )
    with pytest.raises(FileNotFoundError, match="DeiT"):
        main(get_parser().parse_args(argv_bad))


def test_run_ast_checkpoint_path_requires_flag(corpus, tmp_path):
    """A supplied --audioset_pretrained_model_path without
    --audioset_pretrain True fails loudly instead of silently training
    from scratch (the reference consults the path only inside the
    audioset_pretrain branch, ast_models.py:343-349)."""
    from tpat_tpu.cli.run_ast import get_parser, main

    argv = [
        "--dataset", "esc50", "--model_size", "tiny_debug",
        "--data-train", str(corpus / "train.json"),
        "--data-val", str(corpus / "eval.json"),
        "--label-csv", str(corpus / "labels.csv"),
        "--n_class", "4", "-b", "8", "--n-epochs", "1",
        "--audio_length", "128", "--metrics", "acc", "--loss", "CE",
        "--drop_loc", "(1, 3)",
        "--imagenet_pretrain", "False",
        "--audioset_pretrained_model_path", str(tmp_path / "ckpt.pth"),
        "--exp-dir", str(tmp_path / "exp_guard"), "-w", "2",
    ]
    with pytest.raises(ValueError, match="audioset_pretrain"):
        main(get_parser().parse_args(argv))


def test_run_ast_audioset_requires_imagenet(corpus, tmp_path):
    """--audioset_pretrain True with --imagenet_pretrain False fails
    loudly: the reference's AudioSet checkpoints are built on ImageNet
    pretraining and its constructor hard-asserts the combination
    (ast_models.py:344-345).  Pins the invariant the twin-AST harness
    (scripts/convergence_check_tpu.py) must satisfy via flag override."""
    from tpat_tpu.cli.run_ast import get_parser, main

    pth = tmp_path / "donor.pth"
    pth.write_bytes(b"not-a-real-checkpoint")  # never reached
    argv = [
        "--dataset", "esc50", "--model_size", "tiny_debug",
        "--data-train", str(corpus / "train.json"),
        "--data-val", str(corpus / "eval.json"),
        "--label-csv", str(corpus / "labels.csv"),
        "--n_class", "4", "-b", "8", "--n-epochs", "1",
        "--audio_length", "128", "--metrics", "acc", "--loss", "CE",
        "--drop_loc", "(1, 3)",
        "--imagenet_pretrain", "False", "--audioset_pretrain", "True",
        "--audioset_pretrained_model_path", str(pth),
        "--exp-dir", str(tmp_path / "exp_guard2"), "-w", "2",
    ]
    with pytest.raises(ValueError, match="imagenet_pretrain"):
        main(get_parser().parse_args(argv))


def test_dist_eval_batches_shard_semantics(monkeypatch):
    """The multi-host eval generator: rank-strided unpadded shards, every
    host padded to the SAME dispatch count with valid=0 filler batches,
    partial batches trimmed via the valid count — covering the
    collective-alignment logic no multi-process test can step through."""
    import jax

    from tpat_tpu.cli.finetune import dist_eval_batches

    ds = [(np.full((2, 2), i, np.float32), np.float32(i), f"id{i}")
          for i in range(5)]

    def batches_for(rank, world):
        monkeypatch.setattr(jax, "process_index", lambda: rank)
        monkeypatch.setattr(jax, "process_count", lambda: world)
        return list(dist_eval_batches(ds, batch_size=2))

    r0 = batches_for(0, 2)  # shard [0, 2, 4]
    r1 = batches_for(1, 2)  # shard [1, 3] + one filler batch
    # both ranks dispatch the same number of batches (SPMD alignment)
    assert len(r0) == len(r1) == 2
    assert [v for _, _, v in r0] == [2, 1]
    assert [v for _, _, v in r1] == [2, 0]
    # y is trimmed to the valid rows; x rows beyond valid are filler
    assert r0[1][1].shape == (1,)
    assert r1[1][1].shape == (0,)
    # every sample appears exactly once across ranks (unpadded, exact)
    seen = sorted(
        float(y) for batches in (r0, r1) for _, ys, _ in batches for y in ys
    )
    assert seen == [0.0, 1.0, 2.0, 3.0, 4.0]
    # single process degenerates to a plain full pass
    full = batches_for(0, 1)
    assert [v for _, _, v in full] == [2, 2, 1]


def test_prefetch_iter_propagates_and_stops():
    """prefetch_iter yields in order, re-raises producer exceptions, and
    an abandoned consumer stops the producer thread."""
    import threading
    import time as _t

    from tpat_tpu.data.loader import prefetch_iter

    assert list(prefetch_iter(iter(range(7)), prefetch=2)) == list(range(7))

    def boom():
        yield 1
        raise RuntimeError("producer died")

    it = prefetch_iter(boom())
    assert next(it) == 1
    with pytest.raises(RuntimeError, match="producer died"):
        next(it)

    # abandonment: producer must unpark from a full queue and exit
    n_started = threading.active_count()
    gen = prefetch_iter(iter(range(10_000)), prefetch=1)
    assert next(gen) == 0
    gen.close()
    deadline = _t.time() + 5.0
    while threading.active_count() > n_started and _t.time() < deadline:
        _t.sleep(0.05)
    assert threading.active_count() <= n_started
