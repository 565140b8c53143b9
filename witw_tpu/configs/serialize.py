"""Experiment-config YAML serialization.

One typed config tree replaces the reference's three config mechanisms
(SURVEY.md §5.6); this module round-trips it through YAML so experiments are
reproducible artifacts (the reference's only YAML covers the scraper,
tools/download/flickr/config.yaml).
"""

from __future__ import annotations

import dataclasses
from typing import Any

from witw_tpu.configs.base import (
    BaselineModelConfig,
    SafaModelConfig,
    DataConfig,
    DatasetConfig,
    EvalConfig,
    ExperimentConfig,
    FovDsmModelConfig,
    MatchConfig,
    MeshConfig,
    OptimConfig,
    TrainConfig,
)

_MODEL_KINDS = {"baseline": BaselineModelConfig, "fov_dsm": FovDsmModelConfig, "vgg_safa": SafaModelConfig}


def _to_plain(obj: Any) -> Any:
    if dataclasses.is_dataclass(obj):
        return {f.name: _to_plain(getattr(obj, f.name)) for f in dataclasses.fields(obj)}
    if isinstance(obj, tuple):
        return [_to_plain(v) for v in obj]
    return obj


def config_to_dict(cfg: ExperimentConfig) -> dict:
    return _to_plain(cfg)


def config_from_dict(data: dict) -> ExperimentConfig:
    def tup(x):
        return tuple(x) if isinstance(x, list) else x

    ds_d = dict(data["data"]["dataset"])
    for k in ("path_columns", "path_names"):
        ds_d[k] = tup(ds_d.get(k))
    dataset = DatasetConfig(**ds_d)

    data_d = dict(data["data"], dataset=dataset)
    for k in ("img_mean", "img_std"):
        data_d[k] = tup(data_d.get(k))
    data_cfg = DataConfig(**data_d)

    model_d = dict(data["model"])
    model_cls = _MODEL_KINDS[model_d.get("kind", "fov_dsm")]
    for k in ("head_channels",):
        if k in model_d:
            model_d[k] = tup(model_d[k])
    model_cfg = model_cls(**model_d)

    train_d = dict(data["train"])
    train_d["optim"] = OptimConfig(**train_d["optim"])
    train_cfg = TrainConfig(**train_d)

    eval_d = dict(data["eval"])
    eval_d["topk"] = tup(eval_d.get("topk"))
    return ExperimentConfig(
        data=data_cfg,
        model=model_cfg,
        match=MatchConfig(**data["match"]),
        train=train_cfg,
        eval=EvalConfig(**eval_d),
        mesh=MeshConfig(**data["mesh"]),
    )


def save_config(cfg: ExperimentConfig, path: str) -> None:
    import yaml

    with open(path, "w") as f:
        yaml.safe_dump(config_to_dict(cfg), f, sort_keys=False)


def load_config(path: str) -> ExperimentConfig:
    import yaml

    with open(path) as f:
        return config_from_dict(yaml.safe_load(f))
