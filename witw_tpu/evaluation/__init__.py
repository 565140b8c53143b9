from witw_tpu.evaluation.gallery import (
    FovGalleryEvaluator,
    euclidean_ranks,
    metrics_from_ranks,
)
from witw_tpu.evaluation.index import GalleryIndex
from witw_tpu.evaluation.vector_index import VectorIndex

__all__ = [
    "FovGalleryEvaluator",
    "euclidean_ranks",
    "metrics_from_ranks",
    "GalleryIndex",
    "VectorIndex",
]
