#!/bin/bash
# Grow the ER-[700-800] training set toward reference scale (VERDICT r2 item 2:
# close the greedy-decode gap by TRAINING, not decoding — the r2 model saw
# ~0.6% of the paper's 163840 training graphs).
#
# Waits for any running compute_hk_bounds job to release the CPUs, then
# generates --num_graphs extra ER graphs (fresh seed range, disjoint from the
# seed-0 originals) and ILS-labels them with the same 2s budget as the
# existing labels. Idempotent: already-labeled graphs are skipped by the
# solver driver.
set -e
cd /root/repo
export JAX_PLATFORMS=cpu
export PALLAS_AXON_POOL_IPS=

N=${1:-4096}

# wait for the HK bound job to finish (it owns both cores)
while pgrep -f "compute_hk_bounds" > /dev/null 2>&1; do sleep 60; done

python -m difusco_tpu.data.generate_mis gendata --model er --num_graphs "$N" \
  --min_n 700 --max_n 800 --er_p 0.15 --output_dir data/mis_er700800_train2 \
  --seed 100000

python -m difusco_tpu.data.mis_solvers solve \
  --input 'data/mis_er700800_train2/*.gpickle' \
  --output data/mis_er700800_train2_labels --solver ils --time_limit 2 \
  --workers 2

echo GROW_DONE
