"""Run the full analysis suite over a TRAINED twin checkpoint (VERDICT
r4 next-round #5): feature extraction through the real ``cli.finetune``
eval path, then every ``extract_stats`` subcommand — the closest
achievable approach to the reference's published-stats golden
(``/root/reference/audiomae/stats/kendall_rank_mean_mae.json``, where
tau rises with depth) now that a well-trained base-scale model exists.

Usage (after a twin/grid run left checkpoints under WORKDIR):
  PYTHONPATH=.:$PYTHONPATH python scripts/analyze_twin_tpu.py \
      WORKDIR/keep0.7_seed0 --corpus WORKDIR/corpus
Prints the 12-block Kendall-tau table (mean + std flavors) and writes
the mask/histogram figures beside the features.
"""

import argparse
import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def extract_features(arm_dir, corpus, out, keep=0.7, drop_loc="(3, 6, 9)",
                     nb_classes=50):
    from tpat_tpu.cli import finetune as ft

    feats = os.path.join(out, "features")
    if os.path.exists(os.path.join(feats, "mel.0000.pth")):
        print(f"[analyze] features already at {feats}", flush=True)
        return feats
    os.makedirs(feats, exist_ok=True)
    eval_dir = os.path.join(out, "eval")
    os.makedirs(eval_dir, exist_ok=True)
    t0 = time.time()
    ft.main(ft.get_args_parser().parse_args([
        "--dataset", "esc50", "--model", "audiomae_vit_base",
        "--data_train", os.path.join(corpus, "train.json"),
        "--data_eval", os.path.join(corpus, "eval.json"),
        "--label_csv", os.path.join(corpus, "labels.csv"),
        "--nb_classes", str(nb_classes), "--batch_size", "64",
        "--num_workers", "4",
        "--base_keep_rate", str(keep), "--drop_loc", drop_loc,
        "--epochs", "1", "--shrink_start_epoch", "0", "--shrink_epochs", "0",
        "--eval", "--finetuned_model_path",
        os.path.join(arm_dir, "best_model"),
        "--flag_extract_features", "true",
        "--extract_features_path", feats,
        "--output_dir", eval_dir,
        "--result_path", os.path.join(eval_dir, "result.txt"),
    ]))
    acc = open(os.path.join(eval_dir, "result.txt")).read().strip()
    print(f"[analyze] extraction eval acc1 {acc} in {time.time() - t0:.0f}s",
          flush=True)
    return feats


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("arm_dir", help="twin arm dir containing best_model")
    ap.add_argument("--corpus", required=True)
    ap.add_argument("--keep", type=float, default=0.7)
    ap.add_argument("--drop_loc", default="(3, 6, 9)")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    out = args.out or os.path.join(args.arm_dir, "analysis")
    os.makedirs(out, exist_ok=True)
    feats = extract_features(args.arm_dir, args.corpus, out,
                             keep=args.keep, drop_loc=args.drop_loc)

    from tpat_tpu.analysis import extract_stats as es

    taus = {}
    for stat in ("mean", "std"):
        print(f"[analyze] kendall_rank_{stat}", flush=True)
        blk_taus, _info = es.kendall_rank(feats, out, stat)
        taus[stat] = [float(t) for t in blk_taus]
        print(f"[analyze] tau_{stat} per block: "
              + " ".join(f"{t:.3f}" for t in taus[stat]), flush=True)
    with open(os.path.join(out, "kendall_taus.json"), "w") as f:
        json.dump(taus, f, indent=1)

    print("[analyze] visualize_mask", flush=True)
    es.visualize_mask(feats, os.path.join(out, "masks"))
    print("[analyze] retained_token_visualize", flush=True)
    es.retained_token_visualize(feats, out, "retained (trained twin)")
    print("[analyze] retained_token_analyze", flush=True)
    es.retained_token_analyze(feats)
    print(f"[analyze] done; artifacts in {out}", flush=True)


if __name__ == "__main__":
    main()
