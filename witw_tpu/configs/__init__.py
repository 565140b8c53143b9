from witw_tpu.configs.base import (
    DatasetConfig,
    DataConfig,
    BaselineModelConfig,
    FovDsmModelConfig,
    MatchConfig,
    OptimConfig,
    TrainConfig,
    EvalConfig,
    MeshConfig,
    ExperimentConfig,
)
from witw_tpu.configs.registry import (
    DATASETS,
    dataset_config,
    baseline_experiment,
    fov_experiment,
    semantic_experiment,
)

__all__ = [
    "DatasetConfig",
    "DataConfig",
    "BaselineModelConfig",
    "FovDsmModelConfig",
    "MatchConfig",
    "OptimConfig",
    "TrainConfig",
    "EvalConfig",
    "MeshConfig",
    "ExperimentConfig",
    "DATASETS",
    "dataset_config",
    "baseline_experiment",
    "fov_experiment",
    "semantic_experiment",
]
