from witw_tpu.train.pipeline import (
    TrainState,
    FovPipeline,
    BaselinePipeline,
    make_pipeline,
)
from witw_tpu.train.checkpoint import Checkpointer
from witw_tpu.train.metrics import MetricWriter

__all__ = [
    "TrainState",
    "FovPipeline",
    "BaselinePipeline",
    "make_pipeline",
    "Checkpointer",
    "MetricWriter",
]
