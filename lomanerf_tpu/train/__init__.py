"""Training layer: optimizers, steps, drivers, checkpointing, logging."""

from lomanerf_tpu.train import checkpoint, optim  # noqa: F401
from lomanerf_tpu.train.optim import loma_adam, loma_sgd  # noqa: F401
from lomanerf_tpu.train.steps import (  # noqa: F401
    make_image_fit_step,
    make_single_chip_train_step,
)
