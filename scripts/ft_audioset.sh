#!/bin/bash
# AS-20K finetune (mAP eval) — mirrors /root/reference/audiomae/ft_audioset.sh.
set -euo pipefail
base_keep_rate=${1:?usage: ft_audioset.sh <base_keep_rate>}
data_root=${AUDIOSET_DATA:-data/audioset}
python -m tpat_tpu.cli.finetune \
  --dataset audioset --nb_classes 527 \
  --data_train ${data_root}/as20k_16k.json \
  --data_eval ${data_root}/audioset_eval.json \
  --label_csv ${data_root}/class_labels_indices.csv \
  --batch_size 32 --epochs 60 --blr 1e-3 --warmup_epochs 4 \
  --base_keep_rate ${base_keep_rate} --drop_loc "(3, 6, 9)" \
  --shrink_start_epoch 10 --shrink_epochs 20 \
  --freqm 48 --timem 192 --mixup 0.5 --roll_mag_aug true \
  --audioset_pretrained_model_path ${PRETRAINED:-pretrained_models/pretrained.pth} \
  --output_dir ./exp-vit_b/as20k-kr${base_keep_rate} \
  --result_path ./exp-vit_b/as20k-kr${base_keep_rate}/train_result.txt
