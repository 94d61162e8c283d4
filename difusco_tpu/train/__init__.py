from difusco_tpu.train.trainer import Trainer, make_optimizer  # noqa: F401
from difusco_tpu.train.lr import make_lr_schedule  # noqa: F401
