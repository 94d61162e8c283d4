from difusco_tpu.tasks.tsp import TSPTask  # noqa: F401
from difusco_tpu.tasks.mis import MISTask  # noqa: F401
