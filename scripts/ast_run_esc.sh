#!/bin/bash
# AST ESC-50 5-fold protocol — mirrors /root/reference/ast/egs/esc50/run_esc.sh.
# Usage: ./scripts/ast_run_esc.sh <base_keep_rate>
set -euo pipefail
base_keep_rate=${1:?usage: ast_run_esc.sh <base_keep_rate>}
lr=1e-5; epoch=30; batch_size=48
freqm=24; timem=96
data_root=${ESC50_DATA:-data/esc50}
pretrained=${AST_PRETRAINED:-pretrained_models/audioset_16_16_0.4422.pth}
exp=./exp-ast/esc50-kr${base_keep_rate}

for fold in 1 2 3 4 5; do
  python -m tpat_tpu.cli.run_ast \
    --dataset esc50 --n_class 50 --audio_length 512 \
    --data-train ${data_root}/esc_train_data_${fold}.json \
    --data-val ${data_root}/esc_eval_data_${fold}.json \
    --label-csv ${data_root}/esc_class_labels_indices.csv \
    --lr ${lr} --n-epochs ${epoch} -b ${batch_size} \
    --freqm ${freqm} --timem ${timem} --mixup 0 \
    --dataset_mean -6.6268077 --dataset_std 5.358466 \
    --metrics acc --loss CE --warmup False \
    --lrscheduler_start 5 --lrscheduler_step 1 --lrscheduler_decay 0.85 \
    --base_keep_rate ${base_keep_rate} --drop_loc "(3, 6, 9)" \
    --shrink_start_epoch 5 --shrink_epochs 10 \
    --imagenet_pretrain True --audioset_pretrain True \
    --audioset_pretrained_model_path ${pretrained} \
    --exp-dir ${exp}/fold-${fold}
done
python -m tpat_tpu.analysis.reducers ${exp} --csv
