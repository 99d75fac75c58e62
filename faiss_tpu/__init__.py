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
    IndexFlatSQ8,
)

from .models.ivf import (  # noqa: F401
    IndexIVF,
    IndexIVFFlat,
    IndexIVFStats,
    SearchParametersIVF,
    indexIVF_stats,
)
from .models.pq import IndexPQ, IndexPQFastScan  # noqa: F401
from .models.ivf_pq import (  # noqa: F401
    IndexIVFPQ,
    IndexIVFPQFastScan,
    IndexIVFPQR,
    IVFFastScanStats,
    ivf_fast_scan_stats,
)
from .models.sq import IndexIVFScalarQuantizer, IndexScalarQuantizer  # noqa: F401
from .models.hnsw import (  # noqa: F401
    HNSWStats,
    hnsw_stats,
    IndexHNSW,
    IndexHNSW2Level,
    IndexHNSWFlat,
    IndexHNSWFlatPanorama,
    IndexHNSWPQ,
    IndexHNSWSQ,
    SearchParametersHNSW,
)
from .models.lsh import IndexLSH  # noqa: F401
from .models.binary import (  # noqa: F401
    IndexBinaryFlat,
    IndexBinaryFromFloat,
    IndexBinaryHash,
    IndexBinaryIVF,
    IndexBinaryMultiHash,
)
from .models.meta import (  # noqa: F401
    IndexIDMap,
    IndexIDMap2,
    IndexPreTransform,
    IndexRefine,
    IndexRefineFlat,
    IndexReplicas,
    IndexShards,
    IndexSplitVectors,
)
from .codecs.pq import ProductQuantizer  # noqa: F401
from .codecs.sq import QuantizerType, RangeStat, ScalarQuantizer  # noqa: F401
from .clustering import (  # noqa: F401
    Clustering,
    ClusteringParameters,
    Kmeans,
    SuperKMeans,
    SuperKMeansParameters,
    kmeans_clustering,
)
from .transforms import (  # noqa: F401
    CenteringTransform,
    HadamardRotation,
    ITQMatrix,
    ITQTransform,
    LinearTransform,
    NormalizationTransform,
    OPQMatrix,
    PCAMatrix,
    RandomRotationMatrix,
    RemapDimensionsTransform,
    VectorTransform,
)
from .factory import index_factory  # noqa: F401
from .io import (  # noqa: F401
    deserialize_index,
    IO_FLAG_MMAP,
    IO_FLAG_READ_ONLY,
    read_index,
    read_index_binary,
    serialize_index,
    write_index,
    write_index_binary,
)
from .io_ref import read_ref_index, write_ref_index  # noqa: F401

# ScalarQuantizer type aliases at module level (faiss-style)
for _qt in QuantizerType:
    globals()[f"ScalarQuantizer_{_qt.name}"] = _qt

__version__ = "0.1.0"

from .extra import (  # noqa: F401
    ResultHeap,
    bucket_sort,
    diversity_search,
    diversity_select,
    kmax,
    kmin,
    knn,
    knn_gpu,
    knn_hamming,
    merge_knn_results,
    pack_bitstrings,
    pairwise_distances,
    rand,
    randint,
    randn,
    unpack_bitstrings,
)
from .ops.partitioning import (  # noqa: F401
    histogram_shifted,
    partition_fuzzy,
)
from .autotune import (  # noqa: F401
    AutoTuneCriterion,
    IntersectionCriterion,
    OneRecallAtRCriterion,
    OperatingPoint,
    OperatingPoints,
    ParameterRange,
    ParameterSpace,
)
from .ivflib import (  # noqa: F401
    add_preassigned,
    clone_index,
    extract_index_ivf,
    merge_into,
    replace_ivf_quantizer,
    search_preassigned,
    shard_ivf_index_centroids,
    try_extract_index_ivf,
)

from .models.aq import (  # noqa: F401
    IndexAdditiveQuantizer,
    IndexAdditiveQuantizerFastScan,
    IndexIVFAdditiveQuantizer,
    IndexIVFAdditiveQuantizerFastScan,
    IndexIVFLocalSearchQuantizer,
    IndexIVFLocalSearchQuantizerFastScan,
    IndexIVFProductLocalSearchQuantizer,
    IndexIVFProductLocalSearchQuantizerFastScan,
    IndexIVFProductResidualQuantizer,
    IndexIVFProductResidualQuantizerFastScan,
    IndexIVFResidualQuantizer,
    IndexIVFResidualQuantizerFastScan,
    IndexLocalSearchQuantizer,
    IndexLocalSearchQuantizerFastScan,
    IndexProductLocalSearchQuantizer,
    IndexProductLocalSearchQuantizerFastScan,
    IndexProductResidualQuantizer,
    IndexProductResidualQuantizerFastScan,
    IndexResidualQuantizer,
    IndexResidualQuantizerFastScan,
)
from .codecs.aq import (  # noqa: F401
    AdditiveQuantizer,
    LocalSearchQuantizer,
    ProductLocalSearchQuantizer,
    ProductResidualQuantizer,
    ResidualQuantizer,
)
from .models.extra_indexes import (  # noqa: F401
    Index2Layer,
    IndexIVFFlatDedup,
    IndexRowwiseMinMax,
    IndexRowwiseMinMaxFP16,
)
from .factory_tools import reverse_index_factory  # noqa: F401
from .stats import MatrixStats  # noqa: F401
from .bench_fw import (  # noqa: F401
    Benchmark,
    DatasetDescriptor,
    IndexDescriptor,
    run_benchmark,
)

from .models.rabitq import (  # noqa: F401
    IndexIVFRaBitQ,
    IndexIVFRaBitQFastScan,
    IndexRaBitQ,
    IndexRaBitQFastScan,
)
from .codecs.rabitq import RaBitQuantizer  # noqa: F401
from .models.eden import IndexEDEN, IndexIVFEDEN  # noqa: F401
from .codecs.eden import EDENQuantizer, EDENScaleType  # noqa: F401
from .models.lattice import IndexLattice  # noqa: F401
from .codecs.lattice import (  # noqa: F401
    ZnSphereCodec,
    ZnSphereCodecAlt,
    ZnSphereSearch,
)
from .codecs.rabitq import MultiBitRaBitQ  # noqa: F401
from .invlists import (  # noqa: F401
    ArrayInvertedLists,
    HStackInvertedLists,
    InvertedLists,
    InvertedListsIOHook,
    SliceInvertedLists,
    VStackInvertedLists,
    replace_invlists,
)
from .ivflib import SlidingIndexWindow  # noqa: F401
from .callbacks import (  # noqa: F401
    InterruptCallback,
    InterruptedException,
    PythonInterruptCallback,
    TimeoutCallback,
)
from .models.extra_indexes import IndexIVFIndependentQuantizer  # noqa: F401

from .models.nsg import (  # noqa: F401
    IndexNNDescentFlat,
    IndexNSGFlat,
    IndexNSGPQ,
    IndexNSGSQ,
    NSGStats,
    nsg_stats,
)

from .codecs.polysemous import PolysemousTraining  # noqa: F401

from .models.binary import IndexBinaryHNSW  # noqa: F401
from .models.extra_indexes import IndexIVFSpectralHash  # noqa: F401

from .clustering import (  # noqa: F401
    ProgressiveDimClustering,
    ProgressiveDimClusteringParameters,
    kmeans1d,
)

from .models.neuralnet_codec import IndexNeuralNetCodec, IndexQINCo  # noqa: F401

from .models.meta import IndexShardsIVF  # noqa: F401

from .models.imi import (  # noqa: F401
    MultiIndexQuantizer,
    MultiIndexQuantizer2,
)

from .models.panorama import (  # noqa: F401
    IndexFlatPanorama,
    IndexIVFFlatPanorama,
)
