#!/bin/bash
# ER-[700-800] gaussian v5 training (VERDICT r4 item 2: greedy >= 0.92).
#
# Round-4 ended at greedy 0.869 with val still climbing at step 10000 and
# ~18.4k ILS labels (~11% of the paper's 163,840 training graphs,
# /root/reference/reproducing_scripts.md:340-368). Round 5 grows labels in
# the background (gen_label_fused --num 65536) while this trains:
#
#   leg 1 (default): constant LR warm-started from the round-4 best; the
#                    packed dataset refreshes at every epoch boundary so
#                    newly labeled chunks join the set mid-run. Killable
#                    at any point - best checkpoint is kept by val metric.
#   leg 2 (LEG=2):   short cosine-decay anneal on the final full set,
#                    warm-started from the leg-1 best.
#
# B=4 no-remat per scripts/perf_r4_probe.py (8.72 graphs/s vs 6.05 remat;
# B>=8 gains nothing - the sparse path is gather-bound).
set -e
cd /root/repo

LEG=${LEG:-1}
BATCH=${BATCH:-4}

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
  NAME=${NAME:-mis_er700800_gaussian_v5_leg1}
  CKPT=${CKPT:-models/mis_er700800_gaussian_v3/run/checkpoints}
  EPOCHS=${EPOCHS:-6}
else
  SCHED=cosine-decay
  NAME=${NAME:-mis_er700800_gaussian_v5}
  CKPT=${CKPT:-models/mis_er700800_gaussian_v5_leg1/run/checkpoints}
  EPOCHS=${EPOCHS:-1}
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
  --ckpt_path "$CKPT" --resume_weight_only \
  --max_steps "${MAXSTEPS:-0}"
