from tsr_tpu.train import common, loops  # noqa: F401
from tsr_tpu.train.common import (  # noqa: F401
    TrainState,
    make_judge_train_step,
    make_restoration_train_step,
    make_unified_train_step,
)
