#!/bin/bash
set -e
cd /root/repo
export JAX_PLATFORMS=cpu
python -m difusco_tpu.data.generate_mis gendata --model er --num_graphs 1024 \
  --min_n 700 --max_n 800 --er_p 0.15 --output_dir data/mis_er700800_train --seed 0
python -m difusco_tpu.data.generate_mis gendata --model er --num_graphs 128 \
  --min_n 700 --max_n 800 --er_p 0.15 --output_dir data/mis_er700800_test --seed 7001
python -m difusco_tpu.data.generate_mis gendata --model er --num_graphs 16 \
  --min_n 700 --max_n 800 --er_p 0.15 --output_dir data/mis_er700800_val --seed 7002
for split in train test val; do
  python -m difusco_tpu.data.mis_solvers solve \
    --input "data/mis_er700800_${split}/*.gpickle" \
    --output data/mis_er700800_${split}_labels --solver ils --time_limit 2 --workers 2
done
echo ALL_DONE
