"""Base-scale end-to-end chain on the real TPU (VERDICT r2 #9).

Runs the full production pipeline at ViT-B ESC-50 geometry on a synthetic
corpus, through the REAL CLIs:

  1. MAE pretrain (cli/pretrain, ViT-B encoder, swin decoder, 2 epochs)
  2. finetune (cli/finetune, 3 phases dense -> hybrid anneal -> static)
  3. eval + feature extraction (cli/finetune --eval --flag_extract_features)
  4. kendall_rank analysis (analysis/extract_stats)
  5. result reducers (analysis/reducers on the experiment tree)

Wall/step times per stage are printed for docs/BENCH_NOTES.md.  Guards the
VMEM/grouping/bucketing paths that tiny-model runs miss.

Usage: PYTHONPATH=. python scripts/e2e_chain_tpu.py [--workdir DIR]
"""

import argparse
import json
import math
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import numpy as np

from tpat_tpu.data.wav import save_wav


def write_corpus(root, n_classes, splits, sr=16000):
    """Single source of truth for the synthetic-corpus layout every TPU
    script shares: wav files + train/eval manifest JSONs in the dataset
    schema AudiosetDataset consumes (SURVEY §2.2 #14: {"data": [{"wav",
    "labels": "/m/NNN"}]}) + the index,mid,display_name labels.csv.

    ``splits``: {"train": iterable of (wave_f32, cls), "eval": ...} — the
    caller supplies only the waveform synthesis.
    """
    os.makedirs(root, exist_ok=True)
    for split, clips in splits.items():
        rows = []
        for i, (wave, cls) in enumerate(clips):
            path = os.path.join(root, f"{split}{i:05d}.wav")
            save_wav(path, wave.astype(np.float32), sr)
            rows.append({"wav": path, "labels": f"/m/{cls:03d}"})
        json.dump({"data": rows},
                  open(os.path.join(root, f"{split}.json"), "w"))
    with open(os.path.join(root, "labels.csv"), "w") as f:
        f.write("index,mid,display_name\n")
        for c in range(n_classes):
            f.write(f'{c},/m/{c:03d},"tone {c}"\n')


def make_corpus(root, n_train=256, n_eval=64, n_classes=50, seconds=5.0):
    sr = 16000
    rng = np.random.default_rng(0)

    def clips(n):
        for i in range(n):
            cls = i % n_classes
            t = np.arange(int(sr * seconds)) / sr
            f0 = 120 + 35 * cls
            wave = 0.35 * np.sin(2 * math.pi * f0 * t)
            wave += 0.15 * np.sin(2 * math.pi * (2.5 * f0) * t)
            wave += 0.03 * rng.normal(size=t.shape)
            yield wave, cls

    write_corpus(root, n_classes,
                 {"train": clips(n_train), "eval": clips(n_eval)}, sr=sr)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", default="/tmp/tpat_e2e_chain")
    ap.add_argument("--target_length", type=int, default=512,
                    help="512 = ESC-50 geometry (round-3 validated); "
                         "1024 = AudioSet geometry (N=513 tokens, banded "
                         "window-order decoder kernel) — VERDICT r4 "
                         "stretch #8")
    ap.add_argument("--device_frontend", default="false",
                    help="run the finetune stage with the on-device fbank "
                         "(cli/pretrain has no waveform mode)")
    args = ap.parse_args()
    wd = args.workdir
    corpus = os.path.join(wd, "corpus")
    times = {}
    tl = args.target_length
    wf = ["--device_frontend", args.device_frontend]

    t0 = time.time()
    if not os.path.exists(os.path.join(corpus, "train.json")):
        # clips long enough to fill target_length frames (10 ms shift)
        make_corpus(corpus, seconds=tl * 0.010 + 0.2)
    times["corpus"] = time.time() - t0
    print(f"[chain] corpus ready in {times['corpus']:.1f}s", flush=True)

    # 1. MAE pretrain, ViT-B geometry ------------------------------------
    from tpat_tpu.cli import pretrain as pt

    pre_dir = os.path.join(wd, "pretrain")
    t0 = time.time()
    if os.path.exists(os.path.join(pre_dir, "mae_pretrained.pth")):
        print("[chain] pretrain export exists, skipping stage 1", flush=True)
    else:
        pt.main(pt.get_args_parser().parse_args([
        "--dataset", "esc50", "--model", "mae_vit_base",
        "--target_length", str(tl),
        "--data_train", os.path.join(corpus, "train.json"),
        "--label_csv", os.path.join(corpus, "labels.csv"),
        "--batch_size", "32", "--epochs", "2", "--warmup_epochs", "1",
            "--save_every_epochs", "2", "--num_workers", "8",
            "--output_dir", pre_dir,
        ]))
    times["pretrain_2ep"] = time.time() - t0
    ckpt = os.path.join(pre_dir, "mae_pretrained.pth")
    assert os.path.exists(ckpt), "pretrain export missing"
    print(f"[chain] pretrain 2 epochs: {times['pretrain_2ep']:.1f}s", flush=True)

    # 2. finetune, 3 phases ----------------------------------------------
    from tpat_tpu.cli import finetune as ft

    ft_dir = os.path.join(wd, "finetune")
    t0 = time.time()
    if os.path.exists(os.path.join(ft_dir, "best_model")):
        print("[chain] finetuned best_model exists, skipping stage 2",
              flush=True)
    else:
        ft.main(ft.get_args_parser().parse_args([
        "--dataset", "esc50", "--model", "audiomae_vit_base",
        "--target_length", str(tl),
        "--data_train", os.path.join(corpus, "train.json"),
        "--data_eval", os.path.join(corpus, "eval.json"),
        "--label_csv", os.path.join(corpus, "labels.csv"),
        "--nb_classes", "50", "--batch_size", "64", "--epochs", "6",
        "--blr", "1e-3", "--warmup_epochs", "1",
        "--base_keep_rate", "0.7", "--drop_loc", "(3, 6, 9)",
        "--shrink_start_epoch", "2", "--shrink_epochs", "2",
        "--audioset_pretrained_model_path", ckpt,
            "--output_dir", ft_dir,
            "--result_path", os.path.join(ft_dir, "result.txt"),
            "--num_workers", "8",
        ] + wf))
    times["finetune_6ep"] = time.time() - t0
    print(f"[chain] finetune 6 epochs (3 phases): {times['finetune_6ep']:.1f}s",
          flush=True)

    # 3. eval + feature extraction ---------------------------------------
    feats = os.path.join(wd, "features")
    t0 = time.time()
    ft.main(ft.get_args_parser().parse_args([
        "--dataset", "esc50", "--model", "audiomae_vit_base",
        "--target_length", str(tl),
        "--data_eval", os.path.join(corpus, "eval.json"),
        "--label_csv", os.path.join(corpus, "labels.csv"),
        "--nb_classes", "50", "--batch_size", "64", "--epochs", "1",
        "--base_keep_rate", "0.7", "--drop_loc", "(3, 6, 9)",
        "--eval", "--flag_extract_features", "True",
        "--extract_features_path", feats,
        "--finetuned_model_path", os.path.join(ft_dir, "best_model"),
        "--result_path", os.path.join(wd, "eval_result.txt"),
        "--num_workers", "8",
    ]))
    times["eval_extract"] = time.time() - t0
    print(f"[chain] eval+extract: {times['eval_extract']:.1f}s", flush=True)

    # 4. kendall analysis -------------------------------------------------
    from tpat_tpu.analysis.extract_stats import kendall_rank

    t0 = time.time()
    taus, info = kendall_rank(feats, None, "mean", num_blocks=12)
    times["kendall"] = time.time() - t0
    print(f"[chain] kendall taus ({times['kendall']:.1f}s): "
          f"{[round(t, 3) for t in taus]}", flush=True)

    # 5. reducers ----------------------------------------------------------
    from tpat_tpu.analysis import reducers

    t0 = time.time()
    summary = reducers.average_scores(ft_dir)
    times["reducers"] = time.time() - t0
    print(f"[chain] reducer summary: {summary}", flush=True)

    print("[chain] DONE", json.dumps({k: round(v, 1) for k, v in times.items()}))


if __name__ == "__main__":
    main()
