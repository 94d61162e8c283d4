#!/bin/bash
# ER-[700-800] gaussian v3 training (VERDICT r3 item 1): warm-start from the
# r3 checkpoint and train on the ~6x-grown ILS-labeled set (old 5120 +
# train3a/b, ~30k graphs) through the packed memory-mapped dataset.
#
#   leg 1 (default): constant LR 2e-4 on whatever chunks are packed so far
#   leg 2 (LEG=2):   cosine-decay anneal on the full set, warm-started from
#                    the leg-1 best checkpoint
#
# Batch/remat from scripts/perf_r4_probe.py on the real chip: B=4 without
# activation checkpointing is 8.72 graphs/s vs 6.05 with it (1.44x; remat
# was a GPU-memory workaround the 16 GB HBM chip does not need), and B>=8
# gains nothing (the XLA sparse path is gather-bound, not MXU-bound).
# Repack before each leg so newly labeled chunks join the set.
set -e
cd /root/repo

LEG=${LEG:-1}
BATCH=${BATCH:-4}
EPOCHS=${EPOCHS:-4}

python scripts/pack_er700800.py

PACKS=
for d in data/packs/er700800_train data/packs/er700800_train3a \
         data/packs/er700800_train3b data/packs/er700800_train4a \
         data/packs/er700800_train4b; do
  if [ -d "$d" ] && ls "$d"/stats_*.json >/dev/null 2>&1; then
    PACKS="${PACKS:+$PACKS,}$d"
  fi
done
[ -n "$PACKS" ] || { echo "no packed chunks found"; exit 1; }

if [ "$LEG" = "1" ]; then
  SCHED=constant
  NAME=mis_er700800_gaussian_v3_leg1
  CKPT=checkpoints/mis_er700800_gaussian
else
  SCHED=cosine-decay
  NAME=mis_er700800_gaussian_v3
  CKPT=${CKPT:-models/mis_er700800_gaussian_v3_leg1/run/checkpoints}
fi

exec python -m difusco_tpu.cli --task mis --do_train \
  --storage_path . --logger_name "$NAME" \
  --packed_dirs "$PACKS" --packed_max_nodes 800 --packed_max_degree 180 \
  --packed_refresh \
  --training_split 'data/mis_er700800_train/*.gpickle' \
  --validation_split 'data/mis_er700800_val/*.gpickle*' \
  --test_split 'data/mis_er700800_test/*.gpickle*' \
  --diffusion_type gaussian --diffusion_schedule linear --inference_trick ddim \
  --inference_diffusion_steps 50 --inference_schedule cosine \
  --n_layers 12 --hidden_dim 256 --batch_size "$BATCH" --num_epochs "$EPOCHS" \
  --learning_rate "${LR:-2e-4}" --weight_decay 1e-4 --lr_scheduler "$SCHED" \
  --parallel_sampling 4 --bf16 --log_every 50 \
  --validation_examples "${VALN:-8}" --eval_every_steps "${EVAL_EVERY:-2500}" \
  --ckpt_path "$CKPT" --resume_weight_only
