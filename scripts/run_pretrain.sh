#!/bin/bash
# MAE pretraining (the reference's run_pretrain.sh points at a missing
# main_pretrain.py; this one works).
set -euo pipefail
data_root=${AUDIOSET_DATA:-data/audioset}
python -m tpat_tpu.cli.pretrain \
  --data_train ${data_root}/as20k_16k.json \
  --label_csv ${data_root}/class_labels_indices.csv \
  --dataset audioset --batch_size 256 --epochs 32 --blr 2e-4 \
  --mask_2d --mask_t_prob 0.7 --mask_f_prob 0.3 --decoder_mode 1 \
  --norm_pix_loss --output_dir ./exp-pretrain
