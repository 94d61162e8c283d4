from difusco_tpu.decode.mcts import sparsify_heatmap, write_heatmap_txt, run_mcts  # noqa: F401
