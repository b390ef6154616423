from .steps import (  # noqa: F401
    make_cotrain_epoch,
    make_eval_patient_step,
    make_supervised_epoch,
)
from .trainer import Trainer  # noqa: F401
from .cotrainer import CoTrainer  # noqa: F401
