#!/bin/bash
# Round-4 ER-[700-800] training-set growth (VERDICT r3 item 1: >=25k new
# ILS-labeled graphs). Two parallel gen->label pipelines, one per core.
#
# Label budget: ILS --time_limit 0.25 — measured identical set sizes to the
# 2s budget on 16/16 test graphs (and r3's convergence certificate showed
# 2s ~= 60s); 0.25s makes 25k labels fit the round's CPU budget.
set -e
cd /root/repo
export JAX_PLATFORMS=cpu
export PALLAS_AXON_POOL_IPS=

N=${1:-12500}
TL=${2:-0.25}

run_pipeline() {
  local name=$1 seed=$2
  python -m difusco_tpu.data.generate_mis gendata --model er --num_graphs "$N" \
    --min_n 700 --max_n 800 --er_p 0.15 \
    --output_dir "data/mis_er700800_${name}" --seed "$seed" \
    > "/tmp/gen_${name}.log" 2>&1
  python -m difusco_tpu.data.mis_solvers solve \
    --input "data/mis_er700800_${name}/*.gpickle" \
    --output "data/mis_er700800_${name}_labels" --solver ils \
    --time_limit "$TL" --workers 1 \
    > "/tmp/label_${name}.log" 2>&1
  echo "PIPELINE_${name}_DONE"
}

run_pipeline train3a 200000 &
A=$!
run_pipeline train3b 300000 &
B=$!
wait $A $B
echo GROW3_DONE
