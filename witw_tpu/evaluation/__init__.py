from witw_tpu.evaluation.gallery import (
    FovGalleryEvaluator,
    euclidean_ranks,
    metrics_from_ranks,
)
from witw_tpu.evaluation.index import GalleryIndex

__all__ = ["FovGalleryEvaluator", "euclidean_ranks", "metrics_from_ranks", "GalleryIndex"]
