#!/bin/bash
# ER-[700-800] gaussian v2 training (VERDICT r2 item 2): warm-start from the
# r2 checkpoint, train on the 5x-grown ILS-labeled set (scripts/
# grow_er700800_train.sh + merge_er700800_train.py), cosine-decay over
# --num_epochs epochs, top-k checkpoints by val metric.
set -e
cd /root/repo

python scripts/merge_er700800_train.py

exec python -m difusco_tpu.cli --task mis --do_train --do_test \
  --storage_path . --logger_name mis_er700800_gaussian_v2 \
  --training_split 'data/mis_er700800_train/*.gpickle' \
  --training_split_label_dir data/mis_er700800_train_labels \
  --validation_split 'data/mis_er700800_val/*.gpickle*' \
  --test_split 'data/mis_er700800_test/*.gpickle*' \
  --diffusion_type gaussian --diffusion_schedule linear --inference_trick ddim \
  --inference_diffusion_steps 50 --inference_schedule cosine \
  --n_layers 12 --hidden_dim 256 --batch_size 4 --num_epochs "${1:-12}" \
  --learning_rate 2e-4 --weight_decay 1e-4 --lr_scheduler cosine-decay \
  --use_activation_checkpoint --parallel_sampling 4 --bf16 --log_every 100 \
  --ckpt_path checkpoints/mis_er700800_gaussian --resume_weight_only
