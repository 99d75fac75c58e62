"""faiss_tpu — a TPU-native vector index-and-query engine.

A from-scratch reimplementation of the capabilities of Faiss
(facebookresearch/faiss) designed for TPUs: distance kernels are MXU GEMMs
fused with XLA k-select, PQ ADC runs as one-hot matmuls with VMEM-resident
LUTs, k-means is assign-GEMM + segment-sum, and multi-chip scaling is mesh
sharding with allgather + k-select merges (replacing IndexShards/Replicas).

Public API mirrors the reference Python API (``import faiss_tpu as faiss``):
index classes, ``index_factory``, ``write_index``/``read_index``, ``knn``,
``Kmeans``, metric constants.
"""

from .metric import (  # noqa: F401
    METRIC_ABS_INNER_PRODUCT,
    METRIC_BrayCurtis,
    METRIC_Canberra,
    METRIC_GOWER,
    METRIC_INNER_PRODUCT,
    METRIC_Jaccard,
    METRIC_JensenShannon,
    METRIC_L1,
    METRIC_L2,
    METRIC_Linf,
    METRIC_Lp,
    METRIC_NaNEuclidean,
    MetricType,
    is_similarity_metric,
)

from .base import (  # noqa: F401
    IDSelector,
    IDSelectorAll,
    IDSelectorAnd,
    IDSelectorArray,
    IDSelectorBatch,
    IDSelectorBitmap,
    IDSelectorNot,
    IDSelectorOr,
    IDSelectorRange,
    IDSelectorXOr,
    Index,
    RangeSearchResult,
    SearchParameters,
)

from .models.flat import (  # noqa: F401
    IndexFlat,
    IndexFlat1D,
    IndexFlatIP,
    IndexFlatL2,
)

__version__ = "0.1.0"
