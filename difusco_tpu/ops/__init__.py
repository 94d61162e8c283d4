from difusco_tpu.ops.two_opt import batched_two_opt, tour_cost  # noqa: F401
from difusco_tpu.ops.merge import (  # noqa: F401
    merge_heatmap_numpy,
    merge_heatmap_device,
    symmetrize_fixed_degree,
    tour_from_adjacency,
)
from difusco_tpu.ops.mis_decode import (  # noqa: F401
    mis_decode_numpy,
    mis_decode_device,
    mis_decode_batch,
)
from difusco_tpu.ops.knn import knn_graph, knn_graph_numpy  # noqa: F401
