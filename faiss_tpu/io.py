"""Index serialization — analogue of faiss/index_io.h + impl/index_{read,write}.cpp.

Format: a single .npz container holding
  - ``__meta__``: JSON tree of class tags + scalar fields (the analogue of
    the reference's fourcc-tagged headers, index_write.cpp:78-108),
  - arrays stored under hierarchical keys (``<path>/<name>``).

Round-trips every index family recursively. ``serialize_index`` /
``deserialize_index`` mirror the python-API byte-array variants
(python/class_wrappers.py serialize_index).
"""

from __future__ import annotations

import io as _io
import json
import os
from typing import Dict

import numpy as np

from .base import Index
from .codecs.sq import QuantizerType
from .metric import MetricType


# ---------------------------------------------------------------------------
# per-class state extraction
# ---------------------------------------------------------------------------


def _pq_meta(pq):
    return {"d": pq.d, "M": pq.M, "nbits": pq.nbits}


def _dump_aq_norm(aq, meta, arrays, path):
    """AQ norm-quantizer state (search_type + qint range / cqint table)."""
    meta["search_type"] = int(aq.search_type)
    if aq.norm_min == aq.norm_min:  # not NaN
        meta["norm_min"], meta["norm_max"] = aq.norm_min, aq.norm_max
    if aq.qnorm is not None:
        arrays[f"{path}/aq_qnorm"] = aq.qnorm
    if aq.norm_tabs is not None:
        arrays[f"{path}/aq_norm_tabs"] = aq.norm_tabs


def _load_aq_norm(aq, meta, arrays, path):
    if "search_type" in meta:
        aq.set_search_type(int(meta["search_type"]))
    if "norm_min" in meta:
        aq.norm_min = float(meta["norm_min"])
        aq.norm_max = float(meta["norm_max"])
    if f"{path}/aq_qnorm" in arrays:
        aq.qnorm = arrays[f"{path}/aq_qnorm"]
    if f"{path}/aq_norm_tabs" in arrays:
        aq.norm_tabs = arrays[f"{path}/aq_norm_tabs"]


def _dump(index, arrays: Dict[str, np.ndarray], path: str):
    """Recursively extract (meta_tree, arrays)."""
    from .models import binary as B
    from .models.flat import IndexFlat, IndexFlat1D
    from .models.hnsw import IndexHNSW
    from .models.ivf import IndexIVF, IndexIVFFlat
    from .models.ivf_pq import IndexIVFPQ, IndexIVFPQFastScan, IndexIVFPQR
    from .models.lsh import IndexLSH
    from .models.meta import (
        IndexIDMap,
        IndexIDMap2,
        IndexPreTransform,
        IndexRefine,
        IndexRefineFlat,
    )
    from .models.pq import IndexPQ, IndexPQFastScan
    from .models.sq import IndexIVFScalarQuantizer, IndexScalarQuantizer
    from . import transforms as T

    meta = {
        "class": type(index).__name__,
    }

    if isinstance(index, IndexPreTransform):
        meta["d"] = index.d
        meta["metric"] = int(index.metric_type)
        meta["chain"] = []
        for ci, vt in enumerate(index.chain):
            vmeta = {"class": type(vt).__name__, "d_in": vt.d_in, "d_out": vt.d_out}
            if isinstance(vt, T.LinearTransform):
                vmeta["have_bias"] = vt.have_bias
                if vt.A is not None:
                    arrays[f"{path}/vt{ci}/A"] = vt.A
                if vt.b is not None:
                    arrays[f"{path}/vt{ci}/b"] = vt.b
                if isinstance(vt, T.PCAMatrix):
                    vmeta["eigen_power"] = vt.eigen_power
                    vmeta["random_rotation"] = vt.random_rotation
                    if vt.mean is not None:
                        arrays[f"{path}/vt{ci}/mean"] = np.asarray(vt.mean, np.float32)
                if isinstance(vt, T.OPQMatrix):
                    vmeta["M"] = vt.M
            elif isinstance(vt, T.NormalizationTransform):
                vmeta["norm"] = vt.norm
            elif isinstance(vt, T.CenteringTransform):
                arrays[f"{path}/vt{ci}/mean"] = vt.mean
            elif isinstance(vt, T.RemapDimensionsTransform):
                arrays[f"{path}/vt{ci}/map"] = vt.map
            elif isinstance(vt, T.ITQTransform):
                arrays[f"{path}/vt{ci}/mean"] = vt.mean
                arrays[f"{path}/vt{ci}/A"] = vt.pca_then_itq.A
            meta["chain"].append(vmeta)
        meta["sub"] = _dump(index.index, arrays, f"{path}/sub")
        return meta

    if isinstance(index, (IndexIDMap, IndexIDMap2)):
        arrays[f"{path}/id_map"] = index.id_map
        meta["sub"] = _dump(index.index, arrays, f"{path}/sub")
        return meta

    if isinstance(index, (IndexRefine, IndexRefineFlat)):
        meta["k_factor"] = index.k_factor
        meta["base"] = _dump(index.base_index, arrays, f"{path}/base")
        meta["refine"] = _dump(index.refine_index, arrays, f"{path}/refine")
        return meta

    if isinstance(index, IndexHNSW):
        meta["d"] = index.d
        meta["M"] = index.hnsw.M
        state = index.graph_state()
        meta["has_graph"] = state is not None
        if hasattr(index, "num_panorama_levels"):
            # top-level too: a graphless (empty) Panorama index must keep a
            # non-default level count through a round-trip
            meta["pano_levels"] = int(index.num_panorama_levels)
        if state is not None:
            for key in ("vecs", "levels", "neighbors"):
                arrays[f"{path}/hnsw/{key}"] = state[key]
            meta["hnsw"] = {
                k: state[k]
                for k in ("entry_point", "max_level", "M", "efConstruction", "efSearch")
            }
            if "pano_levels" in state:  # IndexHNSWFlatPanorama
                meta["hnsw"]["pano_levels"] = state["pano_levels"]
        meta["storage"] = _dump(index.storage, arrays, f"{path}/storage")
        return meta

    if isinstance(index, IndexLSH):
        meta.update(
            d=index.d,
            nbits=index.nbits,
            rotate_data=index.rotate_data,
            train_thresholds=index.train_thresholds,
            is_trained=index.is_trained,
        )
        arrays[f"{path}/codes"] = index._codes
        if index.rrot is not None:
            arrays[f"{path}/rrot_A"] = index.rrot.A
        if index.thresholds is not None:
            arrays[f"{path}/thresholds"] = index.thresholds
        return meta

    if isinstance(index, IndexIVF):
        meta.update(
            d=index.d,
            metric=int(index.metric_type),
            nlist=index.nlist,
            nprobe=index.nprobe,
            by_residual=index.by_residual,
            is_trained=index.is_trained,
        )
        meta["quantizer"] = _dump(index.quantizer, arrays, f"{path}/quantizer")
        if index._codes_host is not None:
            arrays[f"{path}/codes"] = index._codes_host
        arrays[f"{path}/listnos"] = index._listnos_host
        arrays[f"{path}/ids"] = index._ids_host
        if isinstance(index, IndexIVFPQ):
            meta["pq"] = _pq_meta(index.pq)
            if index.pq.centroids is not None:
                arrays[f"{path}/pq_centroids"] = index.pq.centroids
            if isinstance(index, IndexIVFPQR):
                meta["refine_pq"] = _pq_meta(index.refine_pq)
                meta["k_factor"] = index.k_factor
                if index.refine_pq.centroids is not None:
                    arrays[f"{path}/refine_pq_centroids"] = (
                        index.refine_pq.centroids
                    )
                if index._refine_codes is not None:
                    arrays[f"{path}/refine_codes"] = index._refine_codes
            if isinstance(index, IndexIVFPQFastScan):
                meta["bbs"] = index.bbs
        if isinstance(index, IndexIVFScalarQuantizer):
            meta["qtype"] = int(index.sq.qtype)
            meta["sq_by_residual"] = bool(index.by_residual)
            meta["tq_seed"] = int(index.sq.tq_seed)
            if index.sq.trained is not None:
                arrays[f"{path}/sq_trained"] = index.sq.trained
        from .models.eden import IndexIVFEDEN
        from .models.rabitq import IndexIVFRaBitQ

        if isinstance(index, IndexIVFEDEN):
            meta["nb_bits"] = index.eden.nb_bits
            meta["scale_type"] = int(index.eden.scale_type)
        if isinstance(index, IndexIVFRaBitQ):
            meta["nb_bits"] = index.nb_bits
            meta["qb"] = index.qb
            from .models.rabitq import IndexIVFRaBitQFastScan

            if isinstance(index, IndexIVFRaBitQFastScan):
                meta["bbs"] = index.bbs
        from .models.panorama import IndexIVFFlatPanorama

        if isinstance(index, IndexIVFFlatPanorama):
            meta["n_levels"] = index.n_levels
            meta["prune_factor"] = index.prune_factor
        from .models.aq import (
            IndexIVFAdditiveQuantizer as _IVFAQ,
        )

        if isinstance(index, _IVFAQ):
            meta["aq"] = {
                "class": type(index.aq).__name__,
                "M": index.aq.M,
                "nbits": index.aq.nbits,
            }
            if hasattr(index.aq, "nsplits"):  # product AQ codecs
                meta["aq"]["nsplits"] = index.aq.nsplits
            if index.aq.codebooks is not None:
                arrays[f"{path}/aq_codebooks"] = index.aq.codebooks
            _dump_aq_norm(index.aq, meta["aq"], arrays, path)
            if hasattr(index, "bbs"):
                meta["bbs"] = index.bbs
        return meta

    if isinstance(index, IndexScalarQuantizer):
        meta.update(
            d=index.d,
            metric=int(index.metric_type),
            qtype=int(index.sq.qtype),
            is_trained=index.is_trained,
            tq_seed=int(index.sq.tq_seed),
        )
        if index.sq.trained is not None:
            arrays[f"{path}/sq_trained"] = index.sq.trained
        if index._codes is not None:
            arrays[f"{path}/codes"] = index._codes
        return meta

    if isinstance(index, IndexPQ):
        meta.update(
            d=index.d,
            metric=int(index.metric_type),
            is_trained=index.is_trained,
            pq=_pq_meta(index.pq),
        )
        if isinstance(index, IndexPQFastScan):
            meta["bbs"] = index.bbs
        if index.pq.centroids is not None:
            arrays[f"{path}/pq_centroids"] = index.pq.centroids
        if index._codes_host is not None:
            arrays[f"{path}/codes"] = index._codes_host
        return meta

    from .models.flat import IndexFlatSQ8

    if isinstance(index, IndexFlatSQ8):
        meta.update(d=index.d, metric=int(index.metric_type),
                    trained=index.is_trained)
        if index.is_trained:
            arrays[f"{path}/sq_trained"] = np.asarray(
                index.sq.trained, np.float32
            )
        codes = index._consolidate()
        if codes is not None:
            arrays[f"{path}/codes"] = np.asarray(codes)
        return meta

    if isinstance(index, IndexFlat):
        meta.update(
            d=index.d,
            metric=int(index.metric_type),
            metric_arg=index.metric_arg,
            storage_dtype=np.dtype(index.storage_dtype).name,
        )
        if isinstance(index, IndexFlat1D):
            meta["continuous_update"] = index.continuous_update
        from .models.panorama import IndexFlatPanorama

        if isinstance(index, IndexFlatPanorama):
            meta["num_levels"] = index.num_levels
            meta["prune_factor"] = index.prune_factor
        arrays[f"{path}/xb"] = index.vectors()
        return meta

    from .models.imi import MultiIndexQuantizer, MultiIndexQuantizer2

    if isinstance(index, MultiIndexQuantizer):
        if isinstance(index, MultiIndexQuantizer2):
            meta["assign"] = [
                _dump(sub, arrays, f"{path}/assign{m}")
                for m, sub in enumerate(index.assign_indexes)
            ]
        meta["pq"] = _pq_meta(index.pq)
        meta["is_trained"] = index.is_trained
        if index.pq.centroids is not None:
            arrays[f"{path}/pq_centroids"] = index.pq.centroids
        return meta

    if isinstance(index, B.IndexBinaryFlat):
        meta.update(d=index.d)
        arrays[f"{path}/xb"] = index.xb
        return meta

    if isinstance(index, B.IndexBinaryIVF):
        meta.update(d=index.d, nlist=index.nlist, nprobe=index.nprobe,
                    is_trained=index.is_trained)
        meta["quantizer"] = _dump(index.quantizer, arrays, f"{path}/quantizer")
        arrays[f"{path}/codes"] = index._codes
        arrays[f"{path}/listnos"] = index._listnos
        arrays[f"{path}/ids"] = index._ids
        return meta

    from .models.aq import IndexAdditiveQuantizer, IndexIVFAdditiveQuantizer
    from .models.eden import IndexEDEN, IndexIVFEDEN
    from .models.nsg import IndexNSGFlat
    from .models.rabitq import IndexIVFRaBitQ, IndexRaBitQ

    if isinstance(index, IndexEDEN):
        meta.update(
            d=index.d,
            metric=int(index.metric_type),
            nb_bits=index.eden.nb_bits,
            scale_type=int(index.eden.scale_type),
            is_trained=index.is_trained,
        )
        arrays[f"{path}/center"] = index.center
        if index._codes is not None:
            arrays[f"{path}/codes"] = index._codes
            arrays[f"{path}/factors"] = index._factors
        return meta

    if isinstance(index, IndexAdditiveQuantizer):
        meta.update(
            d=index.d, metric=int(index.metric_type),
            M=index.aq.M, nbits=index.aq.nbits,
            aq_class=type(index.aq).__name__,
            is_trained=index.is_trained,
        )
        if hasattr(index.aq, "nsplits"):
            meta["nsplits"] = index.aq.nsplits
        if hasattr(index, "bbs"):
            meta["bbs"] = index.bbs
        if index.aq.codebooks is not None:
            arrays[f"{path}/codebooks"] = index.aq.codebooks
        _dump_aq_norm(index.aq, meta, arrays, path)
        if index._codes_int is not None:
            arrays[f"{path}/codes"] = index._codes_int
            arrays[f"{path}/norms"] = index._norms
        return meta

    if isinstance(index, IndexRaBitQ):
        meta.update(
            d=index.d, is_trained=index.is_trained, nb_bits=index.nb_bits,
            qb=index.qb,
        )
        from .models.rabitq import IndexRaBitQFastScan

        if isinstance(index, IndexRaBitQFastScan):
            meta["bbs"] = index.bbs
        arrays[f"{path}/P"] = index.rabitq.P
        if index.rabitq.center is not None:
            arrays[f"{path}/center"] = index.rabitq.center
        if index._bits is not None:
            arrays[f"{path}/bits"] = index._bits
            arrays[f"{path}/factors"] = index._factors
        return meta

    from .models.lattice import IndexLattice

    if isinstance(index, IndexLattice):
        meta.update(
            d=index.d, nsq=index.nsq, scale_nbit=index.scale_nbit,
            r2=index.zn_sphere_codec.r2, metric=int(index.metric_type),
            is_trained=index.is_trained,
        )
        if index.trained is not None:
            arrays[f"{path}/trained"] = index.trained
        if index._codes is not None:
            arrays[f"{path}/codes"] = index._codes
        return meta

    if isinstance(index, IndexNSGFlat):
        meta.update(d=index.d, R=index.R, GK=index.GK)
        state = index.graph_state()
        meta["has_graph"] = state is not None
        if state is not None:
            arrays[f"{path}/graph"] = state["graph"]
            meta["nsg"] = {
                "enterpoint": state["enterpoint"],
                "R": state["R"],
                "search_L": state["search_L"],
            }
        storage = getattr(index, "storage", None)
        if storage is not None:  # IndexNSGPQ / IndexNSGSQ: codes + graph
            meta["storage"] = _dump(storage, arrays, f"{path}/storage")
        elif state is not None:  # flat: the graph vectors ARE the storage
            arrays[f"{path}/xb"] = index._xb
        return meta

    raise TypeError(f"don't know how to serialize {type(index).__name__}")


def _load(meta, arrays, path: str):
    from .models import binary as B
    from .models.flat import IndexFlat, IndexFlat1D, IndexFlatIP, IndexFlatL2
    from .models.hnsw import IndexHNSW, IndexHNSWFlat, IndexHNSWPQ, IndexHNSWSQ
    from .models.ivf import IndexIVFFlat
    from .models.ivf_pq import IndexIVFPQ, IndexIVFPQFastScan, IndexIVFPQR
    from .models.lsh import IndexLSH
    from .models.meta import (
        IndexIDMap,
        IndexIDMap2,
        IndexPreTransform,
        IndexRefine,
        IndexRefineFlat,
    )
    from .models.pq import IndexPQ, IndexPQFastScan
    from .models.sq import IndexIVFScalarQuantizer, IndexScalarQuantizer
    from . import transforms as T

    cls = meta["class"]

    if cls == "IndexPreTransform":
        sub = _load(meta["sub"], arrays, f"{path}/sub")
        index = IndexPreTransform(sub)
        for ci, vmeta in reversed(list(enumerate(meta["chain"]))):
            vcls = vmeta["class"]
            d_in, d_out = vmeta["d_in"], vmeta["d_out"]
            if vcls == "NormalizationTransform":
                vt = T.NormalizationTransform(d_in, vmeta["norm"])
            elif vcls == "CenteringTransform":
                vt = T.CenteringTransform(d_in)
                vt.mean = arrays[f"{path}/vt{ci}/mean"]
                vt.is_trained = True
            elif vcls == "RemapDimensionsTransform":
                vt = T.RemapDimensionsTransform(
                    d_in, d_out, arrays[f"{path}/vt{ci}/map"]
                )
            elif vcls == "ITQTransform":
                vt = T.ITQTransform(d_in, d_out)
                vt.mean = arrays[f"{path}/vt{ci}/mean"]
                lt = T.LinearTransform(d_in, d_out, False)
                lt.A = arrays[f"{path}/vt{ci}/A"]
                vt.pca_then_itq = lt
                vt.is_trained = True
            else:  # linear family
                if vcls == "PCAMatrix":
                    vt = T.PCAMatrix(
                        d_in, d_out, vmeta["eigen_power"], vmeta["random_rotation"]
                    )
                    if f"{path}/vt{ci}/mean" in arrays:
                        vt.mean = arrays[f"{path}/vt{ci}/mean"]
                elif vcls == "OPQMatrix":
                    vt = T.OPQMatrix(d_in, vmeta["M"], d_out)
                elif vcls == "RandomRotationMatrix":
                    vt = T.RandomRotationMatrix(d_in, d_out)
                elif vcls == "HadamardRotation":
                    vt = T.HadamardRotation(d_in)
                else:
                    vt = T.LinearTransform(d_in, d_out, vmeta.get("have_bias", False))
                if f"{path}/vt{ci}/A" in arrays:
                    vt.A = arrays[f"{path}/vt{ci}/A"]
                if f"{path}/vt{ci}/b" in arrays:
                    vt.b = arrays[f"{path}/vt{ci}/b"]
                    vt.have_bias = True
                vt.is_trained = True
                vt.set_is_orthonormal()
            index.prepend_transform(vt)
        index.is_trained = True
        index.ntotal = sub.ntotal
        return index

    if cls in ("IndexIDMap", "IndexIDMap2"):
        sub = _load(meta["sub"], arrays, f"{path}/sub")
        index = (IndexIDMap2 if cls == "IndexIDMap2" else IndexIDMap)(sub)
        index.id_map = arrays[f"{path}/id_map"]
        index.ntotal = sub.ntotal
        return index

    if cls in ("IndexRefine", "IndexRefineFlat"):
        base = _load(meta["base"], arrays, f"{path}/base")
        refine = _load(meta["refine"], arrays, f"{path}/refine")
        index = IndexRefine(base, refine)
        if cls == "IndexRefineFlat":
            from .models.flat import IndexFlatSQ8

            index.__class__ = IndexRefineFlat
            index.store_float16 = (
                getattr(refine, "storage_dtype", np.float32) == np.float16
            )
            index.store = (
                "sq8" if isinstance(refine, IndexFlatSQ8)
                else ("f16" if index.store_float16 else "f32")
            )
        index.k_factor = meta["k_factor"]
        index.ntotal = base.ntotal
        return index

    if cls in ("IndexHNSW", "IndexHNSWFlat", "IndexHNSWPQ", "IndexHNSWSQ",
               "IndexHNSW2Level", "IndexHNSWFlatPanorama"):
        from .models.hnsw import IndexHNSW2Level, IndexHNSWFlatPanorama

        storage = _load(meta["storage"], arrays, f"{path}/storage")
        index = IndexHNSW(storage, meta["M"])
        index.__class__ = {
            "IndexHNSW": IndexHNSW,
            "IndexHNSWFlat": IndexHNSWFlat,
            "IndexHNSWPQ": IndexHNSWPQ,
            "IndexHNSWSQ": IndexHNSWSQ,
            "IndexHNSW2Level": IndexHNSW2Level,
            "IndexHNSWFlatPanorama": IndexHNSWFlatPanorama,
        }[cls]
        if cls == "IndexHNSWFlatPanorama":
            index.num_panorama_levels = int(
                meta.get(
                    "pano_levels",
                    meta.get("hnsw", {}).get("pano_levels", 8),
                )
            )
        if meta["has_graph"]:
            state = dict(meta["hnsw"])
            state["levels"] = arrays[f"{path}/hnsw/levels"]
            state["neighbors"] = arrays[f"{path}/hnsw/neighbors"]
            index.restore_graph(state, arrays[f"{path}/hnsw/vecs"])
        index.ntotal = storage.ntotal
        index.is_trained = True
        return index

    if cls == "IndexLSH":
        index = IndexLSH(
            meta["d"], meta["nbits"], meta["rotate_data"], meta["train_thresholds"]
        )
        index._codes = arrays[f"{path}/codes"]
        index.ntotal = len(index._codes)
        if f"{path}/rrot_A" in arrays and index.rrot is not None:
            index.rrot.A = arrays[f"{path}/rrot_A"]
        if f"{path}/thresholds" in arrays:
            index.thresholds = arrays[f"{path}/thresholds"]
        index.is_trained = meta["is_trained"]
        return index

    if cls in (
        "IndexIVFFlat",
        "IndexIVFPQ",
        "IndexIVFPQFastScan",
        "IndexIVFPQR",
        "IndexIVFScalarQuantizer",
        "IndexIVFEDEN",
        "IndexIVFRaBitQ",
        "IndexIVFRaBitQFastScan",
        "IndexIVFFlatPanorama",
        "IndexIVFAdditiveQuantizer",
        "IndexIVFResidualQuantizer",
        "IndexIVFLocalSearchQuantizer",
        "IndexIVFAdditiveQuantizerFastScan",
        "IndexIVFResidualQuantizerFastScan",
        "IndexIVFLocalSearchQuantizerFastScan",
        "IndexIVFProductResidualQuantizer",
        "IndexIVFProductLocalSearchQuantizer",
        "IndexIVFProductResidualQuantizerFastScan",
        "IndexIVFProductLocalSearchQuantizerFastScan",
    ):
        quantizer = _load(meta["quantizer"], arrays, f"{path}/quantizer")
        d, nlist, metric = meta["d"], meta["nlist"], MetricType(meta["metric"])
        if cls == "IndexIVFFlat":
            index = IndexIVFFlat(quantizer, d, nlist, metric)
        elif cls == "IndexIVFFlatPanorama":
            from .models.panorama import IndexIVFFlatPanorama

            index = IndexIVFFlatPanorama(
                quantizer, d, nlist, meta["n_levels"], metric
            )
            index.prune_factor = meta["prune_factor"]
        elif cls in ("IndexIVFRaBitQ", "IndexIVFRaBitQFastScan"):
            from .models.rabitq import IndexIVFRaBitQ, IndexIVFRaBitQFastScan

            if cls == "IndexIVFRaBitQFastScan":
                index = IndexIVFRaBitQFastScan(
                    quantizer, d, nlist, metric, meta.get("bbs", 32),
                    meta.get("nb_bits", 1),
                )
            else:
                index = IndexIVFRaBitQ(
                    quantizer, d, nlist, metric, meta.get("nb_bits", 1)
                )
            index.qb = meta.get("qb", index.qb)
            index.rabitq.center = np.zeros(d, np.float32)
        elif cls == "IndexIVFEDEN":
            from .codecs.eden import EDENScaleType
            from .models.eden import IndexIVFEDEN

            index = IndexIVFEDEN(
                quantizer, d, nlist, metric, meta["nb_bits"],
                EDENScaleType(meta["scale_type"]),
            )
        elif cls == "IndexIVFScalarQuantizer":
            index = IndexIVFScalarQuantizer(
                quantizer, d, nlist, QuantizerType(meta["qtype"]), metric,
                by_residual=bool(meta.get("sq_by_residual", False)),
            )
            index.sq.tq_seed = int(meta.get("tq_seed", 123))
            if f"{path}/sq_trained" in arrays:
                index.sq.trained = arrays[f"{path}/sq_trained"]
        elif "Quantizer" in cls and "Scalar" not in cls:  # IVF AQ family
            from .models import aq as aqm

            aqmeta = meta["aq"]
            Ma, nba = aqmeta["M"], aqmeta["nbits"]
            bbs = meta.get("bbs", 32)

            def _aq_codec():
                from .codecs import aq as aqc

                ns = aqmeta.get("nsplits")
                if ns:  # product codec signature: (d, nsplits, Msub, nbits)
                    return getattr(aqc, aqmeta["class"])(d, ns, Ma // ns, nba)
                return getattr(aqc, aqmeta["class"])(d, Ma, nba)

            ctor = {
                "IndexIVFAdditiveQuantizer":
                    lambda: aqm.IndexIVFAdditiveQuantizer(
                        quantizer, d, nlist, _aq_codec(), metric),
                "IndexIVFAdditiveQuantizerFastScan":
                    lambda: aqm.IndexIVFAdditiveQuantizerFastScan(
                        quantizer, d, nlist, _aq_codec(), metric, bbs),
                "IndexIVFResidualQuantizer":
                    lambda: aqm.IndexIVFResidualQuantizer(
                        quantizer, d, nlist, Ma, nba, metric),
                "IndexIVFLocalSearchQuantizer":
                    lambda: aqm.IndexIVFLocalSearchQuantizer(
                        quantizer, d, nlist, Ma, nba, metric),
                "IndexIVFResidualQuantizerFastScan":
                    lambda: aqm.IndexIVFResidualQuantizerFastScan(
                        quantizer, d, nlist, Ma, nba, metric, bbs),
                "IndexIVFLocalSearchQuantizerFastScan":
                    lambda: aqm.IndexIVFLocalSearchQuantizerFastScan(
                        quantizer, d, nlist, Ma, nba, metric, bbs),
                "IndexIVFProductResidualQuantizer":
                    lambda: aqm.IndexIVFProductResidualQuantizer(
                        quantizer, d, nlist, aqmeta["nsplits"],
                        Ma // aqmeta["nsplits"], nba, metric),
                "IndexIVFProductLocalSearchQuantizer":
                    lambda: aqm.IndexIVFProductLocalSearchQuantizer(
                        quantizer, d, nlist, aqmeta["nsplits"],
                        Ma // aqmeta["nsplits"], nba, metric),
                "IndexIVFProductResidualQuantizerFastScan":
                    lambda: aqm.IndexIVFProductResidualQuantizerFastScan(
                        quantizer, d, nlist, aqmeta["nsplits"],
                        Ma // aqmeta["nsplits"], nba, metric, bbs),
                "IndexIVFProductLocalSearchQuantizerFastScan":
                    lambda: aqm.IndexIVFProductLocalSearchQuantizerFastScan(
                        quantizer, d, nlist, aqmeta["nsplits"],
                        Ma // aqmeta["nsplits"], nba, metric, bbs),
            }[cls]
            index = ctor()
            _load_aq_norm(index.aq, aqmeta, arrays, path)
            if f"{path}/aq_codebooks" in arrays:
                index.aq.codebooks = arrays[f"{path}/aq_codebooks"]
                if hasattr(index.aq, "nsplits"):
                    # rebuild sub-codec codebooks from the block-diagonal
                    # merged layout (mirrors the flat product AQ branch)
                    ns = index.aq.nsplits
                    Msub = index.aq.M // ns
                    dsub = index.aq.dsub
                    for s, sub in enumerate(index.aq.subs):
                        sub.codebooks = np.ascontiguousarray(
                            index.aq.codebooks[
                                s * Msub : (s + 1) * Msub,
                                :,
                                s * dsub : (s + 1) * dsub,
                            ]
                        )
        else:
            pq = meta["pq"]
            if cls == "IndexIVFPQFastScan":
                index = IndexIVFPQFastScan(
                    quantizer, d, nlist, pq["M"], pq["nbits"], metric, meta["bbs"]
                )
            elif cls == "IndexIVFPQR":
                rpq = meta["refine_pq"]
                index = IndexIVFPQR(
                    quantizer, d, nlist, pq["M"], pq["nbits"], rpq["M"], rpq["nbits"], metric
                )
                index.k_factor = meta["k_factor"]
                index.refine_pq.centroids = arrays.get(
                    f"{path}/refine_pq_centroids"
                )
                index._refine_codes = arrays.get(f"{path}/refine_codes")
            else:
                index = IndexIVFPQ(quantizer, d, nlist, pq["M"], pq["nbits"], metric)
            index.pq.centroids = arrays.get(f"{path}/pq_centroids")
        index.by_residual = meta["by_residual"]
        index.nprobe = meta["nprobe"]
        index.is_trained = meta["is_trained"]
        if f"{path}/codes" in arrays:
            index._codes_host = arrays[f"{path}/codes"]
        index._listnos_host = arrays[f"{path}/listnos"]
        index._ids_host = arrays[f"{path}/ids"]
        index.ntotal = len(index._ids_host)
        return index

    if cls == "IndexScalarQuantizer":
        index = IndexScalarQuantizer(
            meta["d"], QuantizerType(meta["qtype"]), MetricType(meta["metric"])
        )
        index.sq.tq_seed = int(meta.get("tq_seed", 123))
        if f"{path}/sq_trained" in arrays:
            index.sq.trained = arrays[f"{path}/sq_trained"]
        index.is_trained = meta["is_trained"]
        if f"{path}/codes" in arrays:
            codes = arrays[f"{path}/codes"]
            index._codes = codes
            IndexFlat.add(index, index.sq.decode(codes))
        return index

    if cls in ("IndexPQ", "IndexPQFastScan"):
        pq = meta["pq"]
        if cls == "IndexPQFastScan":
            index = IndexPQFastScan(
                meta["d"], pq["M"], pq["nbits"], MetricType(meta["metric"]), meta["bbs"]
            )
        else:
            index = IndexPQ(meta["d"], pq["M"], pq["nbits"], MetricType(meta["metric"]))
        index.pq.centroids = arrays.get(f"{path}/pq_centroids")
        index.is_trained = meta["is_trained"]
        if f"{path}/codes" in arrays:
            index._codes_host = arrays[f"{path}/codes"]
            index.ntotal = len(index._codes_host)
        return index

    if cls == "IndexFlatSQ8":
        from .models.flat import IndexFlatSQ8

        index = IndexFlatSQ8(meta["d"], MetricType(meta["metric"]))
        if meta.get("trained"):
            index.sq.trained = arrays[f"{path}/sq_trained"]
            index.is_trained = True
        if f"{path}/codes" in arrays:
            index.add_codes(arrays[f"{path}/codes"])
        return index

    if cls in (
        "IndexFlat",
        "IndexFlatL2",
        "IndexFlatIP",
        "IndexFlat1D",
        "IndexFlatPanorama",
    ):
        metric = MetricType(meta["metric"])
        if cls == "IndexFlatL2":
            index = IndexFlatL2(meta["d"])
        elif cls == "IndexFlatIP":
            index = IndexFlatIP(meta["d"])
        elif cls == "IndexFlat1D":
            index = IndexFlat1D(meta.get("continuous_update", True))
        elif cls == "IndexFlatPanorama":
            from .models.panorama import IndexFlatPanorama

            index = IndexFlatPanorama(meta["d"], meta["num_levels"])
            index.prune_factor = meta["prune_factor"]
        else:
            index = IndexFlat(meta["d"], metric, meta.get("metric_arg", 0.0))
        index.storage_dtype = np.dtype(
            meta.get("storage_dtype", "float32")
        ).type
        xb = arrays[f"{path}/xb"]
        if len(xb):
            index.add(xb)
        return index

    if cls in ("MultiIndexQuantizer", "MultiIndexQuantizer2"):
        from .models.imi import MultiIndexQuantizer, MultiIndexQuantizer2

        pq = meta["pq"]
        if cls == "MultiIndexQuantizer2":
            subs = [
                _load(m, arrays, f"{path}/assign{i}")
                for i, m in enumerate(meta["assign"])
            ]
            index = MultiIndexQuantizer2(pq["d"], pq["nbits"], *subs)
        else:
            index = MultiIndexQuantizer(pq["d"], pq["M"], pq["nbits"])
        index.pq.centroids = arrays.get(f"{path}/pq_centroids")
        index.is_trained = meta["is_trained"]
        if index.is_trained:
            index.ntotal = index.pq.ksub ** index.pq.M
        return index

    if cls == "IndexBinaryFlat":
        index = B.IndexBinaryFlat(meta["d"])
        index.add(arrays[f"{path}/xb"])
        return index

    if cls == "IndexBinaryIVF":
        quantizer = _load(meta["quantizer"], arrays, f"{path}/quantizer")
        index = B.IndexBinaryIVF(quantizer, meta["d"], meta["nlist"])
        index.nprobe = meta["nprobe"]
        index.is_trained = meta["is_trained"]
        index._codes = arrays[f"{path}/codes"]
        index._listnos = arrays[f"{path}/listnos"]
        index._ids = arrays[f"{path}/ids"]
        index.ntotal = len(index._ids)
        return index

    if cls in (
        "IndexAdditiveQuantizer",
        "IndexResidualQuantizer",
        "IndexLocalSearchQuantizer",
        "IndexProductResidualQuantizer",
        "IndexProductLocalSearchQuantizer",
        "IndexResidualQuantizerFastScan",
        "IndexLocalSearchQuantizerFastScan",
        "IndexProductResidualQuantizerFastScan",
        "IndexProductLocalSearchQuantizerFastScan",
    ):
        from .models import aq as aqm

        metric = MetricType(meta["metric"])
        d, M, nbits = meta["d"], meta["M"], meta["nbits"]
        bbs = meta.get("bbs", 32)
        if cls == "IndexResidualQuantizer":
            index = aqm.IndexResidualQuantizer(d, M, nbits, metric)
        elif cls == "IndexLocalSearchQuantizer":
            index = aqm.IndexLocalSearchQuantizer(d, M, nbits, metric)
        elif cls == "IndexResidualQuantizerFastScan":
            index = aqm.IndexResidualQuantizerFastScan(
                d, M, nbits, metric, bbs
            )
        elif cls == "IndexLocalSearchQuantizerFastScan":
            index = aqm.IndexLocalSearchQuantizerFastScan(
                d, M, nbits, metric, bbs
            )
        else:  # product variants: M = nsplits * Msub
            ns = meta["nsplits"]
            ctor = {
                "IndexProductResidualQuantizer":
                    lambda: aqm.IndexProductResidualQuantizer(
                        d, ns, M // ns, nbits, metric),
                "IndexProductLocalSearchQuantizer":
                    lambda: aqm.IndexProductLocalSearchQuantizer(
                        d, ns, M // ns, nbits, metric),
                "IndexProductResidualQuantizerFastScan":
                    lambda: aqm.IndexProductResidualQuantizerFastScan(
                        d, ns, M // ns, nbits, metric, bbs),
                "IndexProductLocalSearchQuantizerFastScan":
                    lambda: aqm.IndexProductLocalSearchQuantizerFastScan(
                        d, ns, M // ns, nbits, metric, bbs),
            }[cls]
            index = ctor()
        _load_aq_norm(index.aq, meta, arrays, path)
        if f"{path}/codebooks" in arrays:
            index.aq.codebooks = arrays[f"{path}/codebooks"]
            if hasattr(index.aq, "nsplits"):
                # rebuild sub-codec codebooks from the block-diagonal
                # merged layout (ProductAdditiveQuantizer.train)
                ns = index.aq.nsplits
                Msub = index.aq.M // ns
                dsub = index.aq.dsub
                for s, sub in enumerate(index.aq.subs):
                    sub.codebooks = np.ascontiguousarray(
                        index.aq.codebooks[
                            s * Msub : (s + 1) * Msub,
                            :,
                            s * dsub : (s + 1) * dsub,
                        ]
                    )
        index.is_trained = meta["is_trained"]
        if f"{path}/codes" in arrays:
            index._codes_int = arrays[f"{path}/codes"]
            index._norms = arrays[f"{path}/norms"]
            index.ntotal = len(index._codes_int)
        return index

    if cls == "IndexEDEN":
        from .codecs.eden import EDENScaleType
        from .models.eden import IndexEDEN

        index = IndexEDEN(
            meta["d"], MetricType(meta["metric"]), meta["nb_bits"],
            EDENScaleType(meta["scale_type"]),
        )
        index.center = arrays[f"{path}/center"]
        index.is_trained = meta["is_trained"]
        if f"{path}/codes" in arrays:
            index._codes = arrays[f"{path}/codes"]
            index._factors = arrays[f"{path}/factors"]
            index.ntotal = len(index._codes)
        return index

    if cls in ("IndexRaBitQ", "IndexRaBitQFastScan"):
        from .models.rabitq import IndexRaBitQ, IndexRaBitQFastScan

        if cls == "IndexRaBitQFastScan":
            index = IndexRaBitQFastScan(
                meta["d"], bbs=meta.get("bbs", 32),
                nb_bits=meta.get("nb_bits", 1),
            )
        else:
            index = IndexRaBitQ(meta["d"], nb_bits=meta.get("nb_bits", 1))
        index.qb = meta.get("qb", index.qb)
        index.rabitq.P = arrays[f"{path}/P"]
        if f"{path}/center" in arrays:
            index.rabitq.center = arrays[f"{path}/center"]
        index.is_trained = meta["is_trained"]
        if f"{path}/bits" in arrays:
            index._bits = arrays[f"{path}/bits"]
            index._factors = arrays[f"{path}/factors"]
            index.ntotal = len(index._bits)
        return index

    if cls == "IndexLattice":
        from .models.lattice import IndexLattice

        index = IndexLattice(
            meta["d"], meta["nsq"], meta["scale_nbit"], meta["r2"],
            MetricType(meta["metric"]),
        )
        if f"{path}/trained" in arrays:
            index.trained = arrays[f"{path}/trained"]
        index.is_trained = meta["is_trained"]
        if f"{path}/codes" in arrays:
            index._codes = arrays[f"{path}/codes"]
            index._flat.add(index._decode_fields(index._codes))
            index.ntotal = len(index._codes)
        return index

    if cls in ("IndexNSGFlat", "IndexNNDescentFlat", "IndexNSGPQ", "IndexNSGSQ"):
        from .models.nsg import (
            IndexNNDescentFlat,
            IndexNSGFlat,
            IndexNSGPQ,
            IndexNSGSQ,
        )

        if cls in ("IndexNSGPQ", "IndexNSGSQ"):
            storage = _load(meta["storage"], arrays, f"{path}/storage")
            kls = IndexNSGPQ if cls == "IndexNSGPQ" else IndexNSGSQ
            index = kls.__new__(kls)
            IndexNSGFlat.__init__(
                index, meta["d"], meta["R"], MetricType(storage.metric_type)
            )
            index.storage = storage
            index.is_trained = storage.is_trained
            index.GK = meta["GK"]
            if meta["has_graph"]:
                state = dict(meta["nsg"])
                state["graph"] = arrays[f"{path}/graph"]
                xb = storage.reconstruct_n(0, storage.ntotal)
                index.restore_graph(
                    state, np.ascontiguousarray(xb, np.float32)
                )
            return index
        kls = IndexNNDescentFlat if cls == "IndexNNDescentFlat" else IndexNSGFlat
        index = kls(meta["d"], meta["R"])
        index.GK = meta["GK"]
        if meta["has_graph"]:
            state = dict(meta["nsg"])
            state["graph"] = arrays[f"{path}/graph"]
            index.restore_graph(state, arrays[f"{path}/xb"])
        return index

    raise TypeError(f"unknown serialized class {cls}")


# ---------------------------------------------------------------------------
# public API (reference: index_io.h write_index/read_index)
# ---------------------------------------------------------------------------


# io flags (reference: faiss/index_io.h:40-71)
IO_FLAG_MMAP = 0x646f0000  # memory-map array payloads (IO_FLAG_MMAP)
IO_FLAG_READ_ONLY = 2


def write_index(index: Index, fname_or_file) -> None:
    arrays: Dict[str, np.ndarray] = {}
    meta = _dump(index, arrays, "root")
    arrays["__meta__"] = np.frombuffer(
        json.dumps(meta).encode("utf-8"), dtype=np.uint8
    )
    if isinstance(fname_or_file, (str, bytes, os.PathLike)):
        # np.savez appends ".npz" to bare filenames; honor the exact name
        # the caller gave (reference write_index semantics, index_io.h:49)
        with open(fname_or_file, "wb") as f:
            np.savez(f, **arrays)
    else:
        np.savez(fname_or_file, **arrays)


def _mmap_npz(fname: str) -> Dict[str, np.ndarray]:
    """Memory-map every array payload of an (uncompressed) .npz in place.

    np.savez stores members uncompressed (ZIP STORED), so each .npy payload
    sits at a computable byte offset: parse the zip directory + npy headers
    and hand out np.memmap views — the analogue of the reference's mapped
    deserialization (impl/mapped_io.h:35, zero-copy impl/zerocopy_io.h:17).
    Nothing is read eagerly except headers; the OS pages data in on access.
    """
    import struct
    import zipfile

    from numpy.lib import format as npformat

    out: Dict[str, np.ndarray] = {}
    with zipfile.ZipFile(fname) as zf, open(fname, "rb") as f:
        for info in zf.infolist():
            name = info.filename[:-4]  # strip ".npy"
            if info.compress_type != zipfile.ZIP_STORED:
                raise ValueError(
                    "IO_FLAG_MMAP needs uncompressed payloads "
                    "(write_index uses np.savez, which stores them)"
                )
            # zip local header: 30 fixed bytes + name + extra (the extra
            # field LENGTH differs between local and central directory)
            f.seek(info.header_offset)
            lh = f.read(30)
            name_len, extra_len = struct.unpack("<HH", lh[26:30])
            payload = info.header_offset + 30 + name_len + extra_len
            f.seek(payload)
            version = npformat.read_magic(f)
            shape, fortran, dtype = npformat._read_array_header(f, version)
            if dtype.hasobject:
                raise ValueError("object arrays cannot be mmapped")
            out[name] = np.memmap(
                fname,
                dtype=dtype,
                mode="r",
                offset=f.tell(),
                shape=tuple(shape),
                order="F" if fortran else "C",
            )
    return out


def _sniff_ref_format(fname_or_file) -> bool:
    """True when the payload is a reference-format (.faissindex) file:
    it opens with a known fourcc, while our own container is an npz
    (zip, magic "PK\\x03\\x04")."""
    from .io_ref import REF_FOURCCS

    if isinstance(fname_or_file, (str, bytes, os.PathLike)) and not (
        isinstance(fname_or_file, bytes) and len(fname_or_file) > 4096
    ):
        try:
            with open(fname_or_file, "rb") as f:
                head = f.read(4)
        except (OSError, ValueError):
            return False
    elif hasattr(fname_or_file, "read") and hasattr(fname_or_file, "seek"):
        pos = fname_or_file.tell()
        head = fname_or_file.read(4)
        fname_or_file.seek(pos)
    else:
        return False
    return head in REF_FOURCCS


def read_index(fname_or_file, io_flags: int = 0) -> Index:
    if _sniff_ref_format(fname_or_file):
        # a file written by the REFERENCE library (fourcc container,
        # impl/index_read.cpp) — parsed by the interop reader
        from .io_ref import read_ref_index

        return read_ref_index(fname_or_file)
    if io_flags & IO_FLAG_MMAP:
        if not isinstance(fname_or_file, (str, bytes)):
            raise ValueError("IO_FLAG_MMAP requires a file path")
        arrays = _mmap_npz(fname_or_file)
    else:
        with np.load(fname_or_file, allow_pickle=False) as z:
            arrays = {k: z[k] for k in z.files}
    meta = json.loads(bytes(arrays.pop("__meta__")).decode("utf-8"))
    return _load(meta, arrays, "root")


def serialize_index(index: Index) -> np.ndarray:
    buf = _io.BytesIO()
    write_index(index, buf)
    return np.frombuffer(buf.getvalue(), dtype=np.uint8)


def deserialize_index(data: np.ndarray) -> Index:
    return read_index(_io.BytesIO(bytes(np.asarray(data, np.uint8))))


# binary-index entry points (reference: index_io.h write_index_binary)
write_index_binary = write_index
read_index_binary = read_index
