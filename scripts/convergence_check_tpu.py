"""Hardware convergence check through the real finetune CLI (tiny model).

Round-2 protocol (docs/BENCH_NOTES.md "Hardware convergence check"),
re-run whenever compute-path numerics change (round 3: polynomial bf16
GELU + one-hot MXU gathers): 10-tone corpus, audiomae_vit_tiny, all
three phases (dense -> hybrid anneal -> static pruned), per-epoch eval,
then `--eval` reload of best_model must reproduce the best accuracy
exactly.

Usage: PYTHONPATH=.:$PYTHONPATH python scripts/convergence_check_tpu.py
"""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from e2e_chain_tpu import make_corpus  # noqa: E402  (scripts/ sibling)


def main():
    wd = sys.argv[1] if len(sys.argv) > 1 else "/tmp/tpat_conv_r3"
    corpus = os.path.join(wd, "corpus")
    if not os.path.exists(os.path.join(corpus, "train.json")):
        make_corpus(corpus, n_train=80, n_eval=40, n_classes=10, seconds=5.0)

    from tpat_tpu.cli import finetune as ft

    out = os.path.join(wd, "finetune")
    common = [
        "--dataset", "esc50", "--model", "audiomae_vit_tiny",
        "--data_train", os.path.join(corpus, "train.json"),
        "--data_eval", os.path.join(corpus, "eval.json"),
        "--label_csv", os.path.join(corpus, "labels.csv"),
        "--nb_classes", "10", "--batch_size", "40",
        "--base_keep_rate", "0.6", "--drop_loc", "(1, 3)",
        "--num_workers", "4",
    ]
    t0 = time.time()
    ft.main(ft.get_args_parser().parse_args(common + [
        "--epochs", "20", "--blr", "2e-3", "--warmup_epochs", "2",
        "--shrink_start_epoch", "6", "--shrink_epochs", "4",
        "--output_dir", out,
        "--result_path", os.path.join(out, "result.txt"),
    ]))
    train_s = time.time() - t0
    best = float(open(os.path.join(out, "result.txt")).read().strip())
    print(f"[conv] trained 20 epochs in {train_s:.0f}s, best acc1 {best}",
          flush=True)

    eval_dir = os.path.join(wd, "eval")
    os.makedirs(eval_dir, exist_ok=True)
    ft.main(ft.get_args_parser().parse_args(common + [
        "--epochs", "20",
        "--shrink_start_epoch", "6", "--shrink_epochs", "4",
        "--eval", "--finetuned_model_path", os.path.join(out, "best_model"),
        "--output_dir", eval_dir,
        "--result_path", os.path.join(eval_dir, "result.txt"),
    ]))
    reload_acc = float(open(os.path.join(eval_dir, "result.txt")).read().strip())
    print(f"[conv] reload acc1 {reload_acc} (best {best})", flush=True)
    assert abs(reload_acc - best) < 1e-6, (reload_acc, best)
    assert best >= 70.0, f"convergence regressed: best acc1 {best}"
    print("[conv] OK")


if __name__ == "__main__":
    main()
