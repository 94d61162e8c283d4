from difusco_tpu.parallel.mesh import (  # noqa: F401
    make_mesh,
    replicated,
    sharded,
    shard_batch,
)
from difusco_tpu.parallel.sampling import make_sharded_sampler, best_of_sharded  # noqa: F401
