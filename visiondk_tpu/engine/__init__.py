from visiondk_tpu.engine.trainer import CenterProcessor
from visiondk_tpu.engine.state import TrainState, create_train_state, place_state
from visiondk_tpu.engine.steps import (
    StepConfig,
    OHEMConfig,
    make_train_step,
    make_eval_step,
    make_embed_step,
    device_preprocess,
)
from visiondk_tpu.engine.schedules import SCHEDULER, create_scheduler, momentum_schedule
from visiondk_tpu.engine.optim import OPTIMIZER, SAMConfig, create_optimizer
from visiondk_tpu.engine.checkpoint import CheckpointManager
from visiondk_tpu.engine.distill import (
    DistillCenterProcessor,
    make_distill_step,
    make_embed_distill_step,
)

__all__ = [
    "CenterProcessor",
    "DistillCenterProcessor",
    "make_distill_step",
    "make_embed_distill_step",
    "TrainState",
    "create_train_state",
    "place_state",
    "StepConfig",
    "OHEMConfig",
    "make_train_step",
    "make_eval_step",
    "make_embed_step",
    "device_preprocess",
    "SCHEDULER",
    "create_scheduler",
    "momentum_schedule",
    "OPTIMIZER",
    "SAMConfig",
    "create_optimizer",
    "CheckpointManager",
]
