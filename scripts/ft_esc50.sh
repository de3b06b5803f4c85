#!/bin/bash
# ESC-50 finetune protocol — mirrors /root/reference/audiomae/ft_esc50.sh:
# 5 folds x 5 seeds at the reference hyperparameters, then score averaging.
# Usage: ./scripts/ft_esc50.sh <base_keep_rate>
set -euo pipefail

base_keep_rate=${1:?usage: ft_esc50.sh <base_keep_rate>}
blr=1e-3; min_lr=1e-5
epochs=120; shrink_start_epoch=20; shrink_epochs=40; first_eval_ep=60
batch_size=128   # reference: 64 x 2 DDP ranks -> one SPMD global batch
warmup_epochs=4; mask_prob=0.3; timem=96; freqm=24
seeds=(12 34 56 78 90)

# set your own dataset and pretrained model paths
pretrained=${PRETRAINED:-pretrained_models/pretrained.pth}
data_root=${ESC50_DATA:-data/esc50}
scratch=${RAMDISK_DIR:-/dev/shm/tpat/esc50}
exp_dir=./exp-vit_b/esc50-kr${base_keep_rate}-bs${batch_size}-ep${epochs}

for fold in 1 2 3 4 5; do
  for seed in "${seeds[@]}"; do
    out=${exp_dir}/fold-${fold}/seed-${seed}
    python -m tpat_tpu.cli.finetune \
      --dataset esc50 --nb_classes 50 \
      --data_train ${data_root}/esc_train_data_${fold}.json \
      --data_eval ${data_root}/esc_eval_data_${fold}.json \
      --label_csv ${data_root}/esc_class_labels_indices.csv \
      --batch_size ${batch_size} --epochs ${epochs} \
      --blr ${blr} --min_lr ${min_lr} --warmup_epochs ${warmup_epochs} \
      --base_keep_rate ${base_keep_rate} --drop_loc "(3, 6, 9)" \
      --shrink_start_epoch ${shrink_start_epoch} --shrink_epochs ${shrink_epochs} \
      --first_eval_ep ${first_eval_ep} \
      --mask_t_prob ${mask_prob} --mask_f_prob ${mask_prob} \
      --freqm ${freqm} --timem ${timem} --roll_mag_aug true \
      --audioset_pretrained_model_path ${pretrained} \
      --seed ${seed} --output_dir ${out} --ramdisk_dir ${scratch} \
      --result_path ${out}/train_result.txt
  done
done

python -m tpat_tpu.analysis.reducers ${exp_dir} --pattern train_result
