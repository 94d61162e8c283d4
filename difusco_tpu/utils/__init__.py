from difusco_tpu.utils.logging import MetricLogger  # noqa: F401
from difusco_tpu.utils.profiling import profile_trace  # noqa: F401
