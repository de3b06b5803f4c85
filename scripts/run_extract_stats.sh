#!/bin/bash
# Feature extraction + analysis — mirrors /root/reference/audiomae/run_extract_stats.sh.
# Usage: ./scripts/run_extract_stats.sh <best_model_dir> <eval.json> <labels.csv> <out_dir>
set -euo pipefail
model=${1:?model}; eval_json=${2:?eval json}; labels=${3:?labels}; out=${4:?out}

python -m tpat_tpu.cli.finetune \
  --dataset esc50 --nb_classes 50 --batch_size 16 --epochs 1 \
  --data_eval ${eval_json} --label_csv ${labels} \
  --eval --finetuned_model_path ${model} \
  --flag_extract_features true --extract_features_path ${out}/features

for mode in kendall_rank_mean kendall_rank_std retained_token_visualize retained_token_analyze visualize_mask; do
  python -m tpat_tpu.analysis.extract_stats \
    --feature_dict_path ${out}/features --output_dir ${out} --${mode} || true
done
