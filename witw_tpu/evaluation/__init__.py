from witw_tpu.evaluation.gallery import (
    FovGalleryEvaluator,
    euclidean_ranks,
    metrics_from_ranks,
)

__all__ = ["FovGalleryEvaluator", "euclidean_ranks", "metrics_from_ranks"]
