"""reverse_index_factory — reconstruct a factory string from an index
(reference: faiss/factory_tools.h:19)."""

from __future__ import annotations


def reverse_index_factory(index) -> str:
    from .codecs.sq import QuantizerType
    from .models.flat import IndexFlat
    from .models.hnsw import IndexHNSW, IndexHNSWFlat
    from .models.ivf import IndexIVFFlat
    from .models.ivf_pq import IndexIVFPQ, IndexIVFPQFastScan
    from .models.lsh import IndexLSH
    from .models.meta import (
        IndexIDMap,
        IndexIDMap2,
        IndexPreTransform,
        IndexRefineFlat,
    )
    from .models.pq import IndexPQ, IndexPQFastScan
    from .models.sq import IndexIVFScalarQuantizer, IndexScalarQuantizer
    from . import transforms as T

    sq_names = {
        QuantizerType.QT_8bit: "SQ8",
        QuantizerType.QT_4bit: "SQ4",
        QuantizerType.QT_6bit: "SQ6",
        QuantizerType.QT_fp16: "SQfp16",
        QuantizerType.QT_bf16: "SQbf16",
    }

    if isinstance(index, IndexPreTransform):
        parts = []
        for vt in index.chain:
            if isinstance(vt, T.OPQMatrix):
                parts.append(f"OPQ{vt.M}_{vt.d_out}")
            elif isinstance(vt, T.PCAMatrix):
                opt = ("W" if vt.eigen_power != 0 else "") + (
                    "R" if vt.random_rotation else ""
                )
                parts.append(f"PCA{opt}{vt.d_out}")
            elif isinstance(vt, T.RandomRotationMatrix):
                parts.append(f"RR{vt.d_out}")
            elif isinstance(vt, T.NormalizationTransform):
                parts.append("L2norm")
            elif isinstance(vt, T.ITQTransform):
                parts.append(f"ITQ{vt.d_out}")
            else:
                parts.append(type(vt).__name__)
        return ",".join(parts + [reverse_index_factory(index.index)])
    if isinstance(index, (IndexIDMap2,)):
        return "IDMap2," + reverse_index_factory(index.index)
    if isinstance(index, IndexIDMap):
        return "IDMap," + reverse_index_factory(index.index)
    if isinstance(index, IndexRefineFlat):
        return reverse_index_factory(index.base_index) + ",RFlat"
    if isinstance(index, IndexIVFPQFastScan):
        return f"IVF{index.nlist},PQ{index.pq.M}x4fs"
    if isinstance(index, IndexIVFPQ):
        return f"IVF{index.nlist},PQ{index.pq.M}x{index.pq.nbits}"
    if isinstance(index, IndexIVFScalarQuantizer):
        return f"IVF{index.nlist},{sq_names.get(index.sq.qtype, 'SQ8')}"
    if isinstance(index, IndexIVFFlat):
        return f"IVF{index.nlist},Flat"
    if isinstance(index, IndexHNSWFlat) or isinstance(index, IndexHNSW):
        return f"HNSW{index.hnsw.M}"
    if isinstance(index, IndexPQFastScan):
        return f"PQ{index.pq.M}x4fs"
    if isinstance(index, IndexPQ):
        return f"PQ{index.pq.M}x{index.pq.nbits}"
    if isinstance(index, IndexScalarQuantizer):
        return sq_names.get(index.sq.qtype, "SQ8")
    if isinstance(index, IndexLSH):
        return "LSH" + ("r" if index.rotate_data else "") + (
            "t" if index.train_thresholds else ""
        )
    if isinstance(index, IndexFlat):
        return "Flat"
    raise TypeError(f"cannot reverse {type(index).__name__}")
