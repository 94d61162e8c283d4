from difusco_tpu.models.gnn import GNNDenoiser  # noqa: F401
