"""Training: jitted/shard_map steps, optimizers, state, checkpointing, loops."""

from .optim import (  # noqa: F401
    adam_factor,
    backbone_optimizer,
    factor_schedule,
    get_ema_params,
    sgd_wd,
    with_param_ema,
)
from .state import TrainState, create_train_state  # noqa: F401
from .steps import (  # noqa: F401
    make_backbone_train_step,
    make_backbone_eval_step,
    make_head_train_step,
    make_head_eval_step,
    make_scanned_step,
    shard_map_scanned_step,
    shard_map_scanned_step_2d,
    shard_map_step,
    shard_map_step_2d,
    infer_class_parallel_specs,
    BACKBONE_METRIC_KEYS,
    HEAD_METRIC_KEYS,
)
from .checkpoint import Checkpointer  # noqa: F401
from .loops import (  # noqa: F401
    train_loop, resume_if_available, EpochStats, NonFiniteLossError,
    PreemptionGuard,
)
