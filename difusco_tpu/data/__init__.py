from difusco_tpu.data.tsp import TSPDataset, parse_tsp_line, write_tsp_file  # noqa: F401
from difusco_tpu.data.mis import MISDataset  # noqa: F401
