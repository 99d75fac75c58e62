"""index_factory — string-driven index construction.

Reimplements the grammar of faiss/index_factory.cpp:85-600 (tokenize on ','
-> [pretransforms] [IDMap] coarse/encoding [suffixes]) over the TPU-native
index classes. Unsupported components raise NotImplementedError naming the
token, so coverage gaps are explicit rather than silent.
"""

from __future__ import annotations

import re
from typing import Optional

from .base import Index
from .codecs.sq import QuantizerType
from .metric import MetricType
from .models.flat import IndexFlat, IndexFlat1D
from .models.ivf import IndexIVFFlat
from .models.ivf_pq import IndexIVFPQ, IndexIVFPQFastScan, IndexIVFPQR
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

_SQ_TYPES = {
    "SQ8": QuantizerType.QT_8bit,
    "SQ4": QuantizerType.QT_4bit,
    "SQ6": QuantizerType.QT_6bit,
    "SQfp16": QuantizerType.QT_fp16,
    "SQbf16": QuantizerType.QT_bf16,
    "SQ8_direct_signed": QuantizerType.QT_8bit_direct_signed,
    "SQ8_direct": QuantizerType.QT_8bit_direct,
    "SQ0": QuantizerType.QT_0bit,
    "SQtqmse1": QuantizerType.QT_1bit_tqmse,
    "SQtqmse2": QuantizerType.QT_2bit_tqmse,
    "SQtqmse3": QuantizerType.QT_3bit_tqmse,
    "SQtqmse4": QuantizerType.QT_4bit_tqmse,
    "SQtqmse8": QuantizerType.QT_8bit_tqmse,
    "SQtq2": QuantizerType.QT_2bit_tq,
    "SQtq3": QuantizerType.QT_3bit_tq,
    "SQtq4": QuantizerType.QT_4bit_tq,
    "SQtq5": QuantizerType.QT_5bit_tq,
}  # token table: index_factory.cpp:160-179 sq_types


def _strip_aq_norm_suffix(tok: str):
    """Split the AQ norm-storage suffix off an RQ/LSQ/PRQ/PLSQ token
    (reference grammar index_factory.cpp:193 aq_norm_pattern). Returns
    (base_token, search_type or None)."""
    from .codecs.aq import AdditiveQuantizer as AQ

    suffixes = {
        "_Nfloat": AQ.ST_norm_float,
        "_Nnone": AQ.ST_LUT_nonorm,
        "_Nqint8": AQ.ST_norm_qint8,
        "_Nqint4": AQ.ST_norm_qint4,
        "_Ncqint8": AQ.ST_norm_cqint8,
        "_Ncqint4": AQ.ST_norm_cqint4,
        "_Nlsq2x4": AQ.ST_norm_lsq2x4,
        "_Nrq2x4": AQ.ST_norm_rq2x4,
    }
    for s, st in suffixes.items():
        if tok.endswith(s):
            return tok[: -len(s)], st
    return tok, None


def _parse_transform(tok: str, d: int):
    """Pretransform tokens (index_factory.cpp:226 parse_VectorTransform)."""
    if m := re.fullmatch(r"PCA(R|W|WR)?(\d+)", tok):
        opt, d_out = m.group(1) or "", int(m.group(2))
        return T.PCAMatrix(
            d,
            d_out,
            eigen_power=-0.5 if "W" in opt else 0.0,
            random_rotation="R" in opt,
        )
    if m := re.fullmatch(r"OPQ(\d+)(?:_(\d+))?", tok):
        M, d_out = int(m.group(1)), m.group(2)
        return T.OPQMatrix(d, M, int(d_out) if d_out else -1)
    if m := re.fullmatch(r"RR(\d+)?", tok):
        d_out = int(m.group(1)) if m.group(1) else d
        rr = T.RandomRotationMatrix(d, d_out)
        rr.init()
        return rr
    if m := re.fullmatch(r"ITQ(\d+)?", tok):
        d_out = int(m.group(1)) if m.group(1) else d
        return T.ITQTransform(d, d_out, do_pca=m.group(1) is not None)
    if m := re.fullmatch(r"Pad(\d+)", tok):
        d_out = int(m.group(1))
        return T.RemapDimensionsTransform(d, max(d, d_out), False)
    if tok == "L2norm":
        return T.NormalizationTransform(d, 2.0)
    return None


def _parse_coarse(tok: str, d: int, metric):
    """Coarse-quantizer spec (index_factory.cpp:278 parse_coarse_quantizer).

    Returns (quantizer_or_None, nlist) or None if not a coarse spec.
    """
    if m := re.fullmatch(r"IVF(\d+)", tok):
        return None, int(m.group(1))  # default flat coarse quantizer
    if m := re.fullmatch(r"IVF(\d+)\((.+)\)", tok):
        nlist = int(m.group(1))
        q = index_factory(d, m.group(2), metric)
        return q, nlist
    if m := re.fullmatch(r"IVF(\d+)_HNSW(\d+)?", tok):
        from .models.hnsw import IndexHNSWFlat

        nlist = int(m.group(1))
        hm = int(m.group(2)) if m.group(2) else 32
        return IndexHNSWFlat(d, hm, metric), nlist
    if m := re.fullmatch(r"IMI2x(\d+)", tok):
        from .models.imi import MultiIndexQuantizer

        nbits = int(m.group(1))
        return MultiIndexQuantizer(d, 2, nbits), 1 << (2 * nbits)
    return None


def _parse_ivf_encoding(tok: str, quantizer, d: int, nlist: int, metric):
    """Encoding inside IVF (index_factory.cpp:367 parse_IndexIVF)."""
    base_tok, aq_st = _strip_aq_norm_suffix(tok)
    if aq_st is not None and re.fullmatch(
        r"(RQ|LSQ)\d+x\d+|(PRQ|PLSQ)\d+x\d+x\d+", base_tok
    ):
        idx = _parse_ivf_encoding(base_tok, quantizer, d, nlist, metric)
        idx.aq.set_search_type(aq_st)
        return idx
    from .models.aq import (
        IndexIVFLocalSearchQuantizer,
        IndexIVFResidualQuantizer,
    )

    if tok == "Flat":
        return IndexIVFFlat(quantizer, d, nlist, metric)
    if m := re.fullmatch(r"FlatPanorama(\d+)?(?:_\d+)?", tok):
        from .models.panorama import IndexIVFFlatPanorama

        return IndexIVFFlatPanorama(
            quantizer, d, nlist, int(m.group(1)) if m.group(1) else 4, metric
        )
    if m := re.fullmatch(r"RQ(\d+)x4fs(?:_(\d+))?", tok):
        from .models.aq import IndexIVFResidualQuantizerFastScan

        return IndexIVFResidualQuantizerFastScan(
            quantizer, d, nlist, int(m.group(1)), 4, metric,
            int(m.group(2)) if m.group(2) else 32,
        )
    if m := re.fullmatch(r"LSQ(\d+)x4fs(?:_(\d+))?", tok):
        from .models.aq import IndexIVFLocalSearchQuantizerFastScan

        return IndexIVFLocalSearchQuantizerFastScan(
            quantizer, d, nlist, int(m.group(1)), 4, metric,
            int(m.group(2)) if m.group(2) else 32,
        )
    if m := re.fullmatch(r"RQ(\d+)x(\d+)", tok):
        return IndexIVFResidualQuantizer(
            quantizer, d, nlist, int(m.group(1)), int(m.group(2)), metric
        )
    if m := re.fullmatch(r"LSQ(\d+)x(\d+)", tok):
        return IndexIVFLocalSearchQuantizer(
            quantizer, d, nlist, int(m.group(1)), int(m.group(2)), metric
        )
    if m := re.fullmatch(r"(PRQ|PLSQ)(\d+)x(\d+)x4fs(?:_(\d+))?", tok):
        from .models.aq import (
            IndexIVFProductLocalSearchQuantizerFastScan,
            IndexIVFProductResidualQuantizerFastScan,
        )

        cls = (
            IndexIVFProductResidualQuantizerFastScan
            if m.group(1) == "PRQ"
            else IndexIVFProductLocalSearchQuantizerFastScan
        )
        return cls(
            quantizer, d, nlist, int(m.group(2)), int(m.group(3)), 4, metric,
            int(m.group(4)) if m.group(4) else 32,
        )
    if m := re.fullmatch(r"(PRQ|PLSQ)(\d+)x(\d+)x(\d+)", tok):
        from .models.aq import (
            IndexIVFProductLocalSearchQuantizer,
            IndexIVFProductResidualQuantizer,
        )

        cls = (
            IndexIVFProductResidualQuantizer
            if m.group(1) == "PRQ"
            else IndexIVFProductLocalSearchQuantizer
        )
        return cls(
            quantizer, d, nlist, int(m.group(2)), int(m.group(3)),
            int(m.group(4)), metric,
        )
    if tok in _SQ_TYPES:
        return IndexIVFScalarQuantizer(quantizer, d, nlist, _SQ_TYPES[tok], metric)
    if m := re.fullmatch(r"PQ(\d+)x4fs(?:_(\d+))?", tok):
        bbs = int(m.group(2)) if m.group(2) else 32
        return IndexIVFPQFastScan(quantizer, d, nlist, int(m.group(1)), 4, metric, bbs)
    if m := re.fullmatch(r"PQ(\d+)x(\d+)", tok):
        return IndexIVFPQ(quantizer, d, nlist, int(m.group(1)), int(m.group(2)), metric)
    if m := re.fullmatch(r"PQ(\d+)\+(\d+)", tok):
        return IndexIVFPQR(
            quantizer, d, nlist, int(m.group(1)), 8, int(m.group(2)), 8, metric
        )
    if m := re.fullmatch(r"PQ(\d+)", tok):
        return IndexIVFPQ(quantizer, d, nlist, int(m.group(1)), 8, metric)
    if m := re.fullmatch(r"RaBitQfs([1-9])?(?:_(\d+))?", tok):
        # reference grammar: RaBitQfs{nb_bits}_{bbs} (index_factory.cpp:535)
        from .models.rabitq import IndexIVFRaBitQFastScan

        return IndexIVFRaBitQFastScan(
            quantizer, d, nlist, metric,
            int(m.group(2)) if m.group(2) else 32,
            int(m.group(1)) if m.group(1) else 1,
        )
    if m := re.fullmatch(r"RaBitQ([1-9])?", tok):
        from .models.rabitq import IndexIVFRaBitQ

        return IndexIVFRaBitQ(
            quantizer, d, nlist, metric,
            int(m.group(1)) if m.group(1) else 1,
        )
    if m := re.fullmatch(r"EDEN([1-8])?(BIASED|BIAS)?", tok):
        from .codecs.eden import EDENScaleType
        from .models.eden import IndexIVFEDEN

        st = (
            EDENScaleType.BIASED if m.group(2) else EDENScaleType.UNBIASED
        )
        return IndexIVFEDEN(
            quantizer, d, nlist, metric,
            int(m.group(1)) if m.group(1) else 1, st,
        )
    return None


def _parse_flat_encoding(tok: str, d: int, metric):
    """Standalone encodings (index_factory.cpp parse_other_indexes)."""
    base_tok, aq_st = _strip_aq_norm_suffix(tok)
    if aq_st is not None and re.fullmatch(
        r"(RQ|LSQ)\d+x\d+|(PRQ|PLSQ)\d+x\d+x\d+", base_tok
    ):
        idx = _parse_flat_encoding(base_tok, d, metric)
        idx.aq.set_search_type(aq_st)
        return idx
    from .models.aq import (
        IndexLocalSearchQuantizer,
        IndexProductLocalSearchQuantizer,
        IndexProductResidualQuantizer,
        IndexResidualQuantizer,
    )

    if tok == "Flat":
        return IndexFlat(d, metric)
    if m := re.fullmatch(r"RQ(\d+)x4fs(?:_(\d+))?", tok):
        from .models.aq import IndexResidualQuantizerFastScan

        return IndexResidualQuantizerFastScan(
            d, int(m.group(1)), 4, metric,
            int(m.group(2)) if m.group(2) else 32,
        )
    if m := re.fullmatch(r"LSQ(\d+)x4fs(?:_(\d+))?", tok):
        from .models.aq import IndexLocalSearchQuantizerFastScan

        return IndexLocalSearchQuantizerFastScan(
            d, int(m.group(1)), 4, metric,
            int(m.group(2)) if m.group(2) else 32,
        )
    if m := re.fullmatch(r"RQ(\d+)x(\d+)", tok):
        return IndexResidualQuantizer(d, int(m.group(1)), int(m.group(2)), metric)
    if m := re.fullmatch(r"LSQ(\d+)x(\d+)", tok):
        return IndexLocalSearchQuantizer(d, int(m.group(1)), int(m.group(2)), metric)
    if m := re.fullmatch(r"PRQ(\d+)x(\d+)x(\d+)", tok):
        return IndexProductResidualQuantizer(
            d, int(m.group(1)), int(m.group(2)), int(m.group(3)), metric
        )
    if m := re.fullmatch(r"PLSQ(\d+)x(\d+)x(\d+)", tok):
        return IndexProductLocalSearchQuantizer(
            d, int(m.group(1)), int(m.group(2)), int(m.group(3)), metric
        )
    if tok == "Flat1D":
        return IndexFlat1D()
    if m := re.fullmatch(r"FlatPanorama(\d+)?", tok):
        from .models.panorama import IndexFlatPanorama

        return IndexFlatPanorama(d, int(m.group(1)) if m.group(1) else 4, metric)
    if m := re.fullmatch(r"RaBitQfs([1-9])?(?:_(\d+))?", tok):
        from .models.rabitq import IndexRaBitQFastScan

        return IndexRaBitQFastScan(
            d, metric,
            int(m.group(2)) if m.group(2) else 32,
            int(m.group(1)) if m.group(1) else 1,
        )
    if m := re.fullmatch(r"RaBitQ([1-9])?", tok):
        from .models.rabitq import IndexRaBitQ

        return IndexRaBitQ(d, metric, int(m.group(1)) if m.group(1) else 1)
    if m := re.fullmatch(r"ZnLattice(\d+)x(\d+)_(\d+)", tok):
        from .models.lattice import IndexLattice

        return IndexLattice(
            d, int(m.group(1)), int(m.group(2)), int(m.group(3)), metric
        )
    if m := re.fullmatch(r"EDEN([1-8])?(BIASED|BIAS)?", tok):
        from .codecs.eden import EDENScaleType
        from .models.eden import IndexEDEN

        st = (
            EDENScaleType.BIASED if m.group(2) else EDENScaleType.UNBIASED
        )
        return IndexEDEN(
            d, metric, int(m.group(1)) if m.group(1) else 1, st
        )
    if tok in _SQ_TYPES:
        return IndexScalarQuantizer(d, _SQ_TYPES[tok], metric)
    if m := re.fullmatch(r"PQ(\d+)x4fs(?:_(\d+))?", tok):
        return IndexPQFastScan(d, int(m.group(1)), 4, metric, int(m.group(2) or 32))
    if m := re.fullmatch(r"PQ(\d+)x(\d+)", tok):
        return IndexPQ(d, int(m.group(1)), int(m.group(2)), metric)
    if m := re.fullmatch(r"PQ(\d+)", tok):
        return IndexPQ(d, int(m.group(1)), 8, metric)
    if m := re.fullmatch(r"HNSW(\d+)?", tok):
        from .models.hnsw import IndexHNSWFlat

        return IndexHNSWFlat(d, int(m.group(1)) if m.group(1) else 32, metric)
    if m := re.fullmatch(r"NSG(\d+)?", tok):
        from .models.nsg import IndexNSGFlat

        return IndexNSGFlat(d, int(m.group(1)) if m.group(1) else 32, metric)
    if m := re.fullmatch(r"NNDescent(\d+)?", tok):
        from .models.nsg import IndexNNDescentFlat

        return IndexNNDescentFlat(d, int(m.group(1)) if m.group(1) else 32, metric)
    if m := re.fullmatch(r"LSH(r?)(t?)", tok):
        from .models.lsh import IndexLSH

        return IndexLSH(d, d, rotate_data=bool(m.group(1)), train_thresholds=bool(m.group(2)))
    return None


def _parse_graph_index(kind: str, gM: int, suffix, d: int, metric):
    """Graph index + optional storage-codec suffix
    (reference: index_factory.cpp parse_IndexHNSW / parse_IndexNSG).
    Returns (index, suffix_consumed) or None."""
    from .models.hnsw import (
        IndexHNSW2Level,
        IndexHNSWFlat,
        IndexHNSWPQ,
        IndexHNSWSQ,
    )
    from .models.nsg import IndexNSGFlat, IndexNSGPQ, IndexNSGSQ

    hnsw = kind == "HNSW"
    if suffix is None or suffix in ("RFlat",) or suffix.startswith("Refine"):
        return (
            (IndexHNSWFlat if hnsw else IndexNSGFlat)(d, gM, metric),
            False,
        )
    if suffix == "Flat":
        return (
            (IndexHNSWFlat if hnsw else IndexNSGFlat)(d, gM, metric),
            True,
        )
    if hnsw and (m := re.fullmatch(r"FlatPanorama(\d+)?", suffix)):
        from .models.hnsw import IndexHNSWFlatPanorama

        nlevels = int(m.group(1)) if m.group(1) else 8
        return IndexHNSWFlatPanorama(d, gM, nlevels, metric), True
    if m := re.fullmatch(r"PQ(\d+)(?:x(\d+))?(?:np)?", suffix):
        pm = int(m.group(1))
        nbit = int(m.group(2)) if m.group(2) else 8
        if hnsw:
            return IndexHNSWPQ(d, gM, pm, nbit), True
        return IndexNSGPQ(d, pm, gM, nbit), True
    if suffix in _SQ_TYPES:
        if hnsw:
            return IndexHNSWSQ(d, _SQ_TYPES[suffix], gM, metric), True
        return IndexNSGSQ(d, _SQ_TYPES[suffix], gM, metric), True
    if hnsw and (m := re.fullmatch(r"(\d+)\+PQ(\d+)", suffix)):
        from .models.flat import IndexFlat

        return (
            IndexHNSW2Level(
                IndexFlat(d, metric), int(m.group(1)), int(m.group(2)), gM
            ),
            True,
        )
    if hnsw and (m := re.fullmatch(r"2x(\d+)\+PQ(\d+)", suffix)):
        from .models.imi import MultiIndexQuantizer

        nbit = int(m.group(1))
        quant = MultiIndexQuantizer(d, 2, nbit)
        idx = IndexHNSW2Level(quant, 1 << (2 * nbit), int(m.group(2)), gM)
        return idx, True
    # unknown suffix: bare graph index, let the main loop handle the token
    return (IndexHNSWFlat if hnsw else IndexNSGFlat)(d, gM, metric), False


def _split_toplevel(description: str):
    """Split on commas not inside parentheses."""
    toks, depth, cur = [], 0, []
    for c in description:
        if c == "(":
            depth += 1
        elif c == ")":
            depth -= 1
        if c == "," and depth == 0:
            toks.append("".join(cur))
            cur = []
        else:
            cur.append(c)
    if cur:
        toks.append("".join(cur))
    return [t.strip() for t in toks if t.strip()]


def index_factory(d: int, description: str, metric=MetricType.L2) -> Index:
    """Build an index from a factory string (reference: index_factory.h:17)."""
    metric = MetricType(metric)
    toks = _split_toplevel(description)

    transforms = []
    idmap: Optional[str] = None
    core: Optional[Index] = None
    refine: Optional[str] = None
    i = 0
    cur_d = d

    while i < len(toks):
        tok = toks[i]
        vt = _parse_transform(tok, cur_d)
        if vt is not None and core is None:
            transforms.append(vt)
            cur_d = vt.d_out
            i += 1
            continue
        if tok in ("IDMap", "IDMap2") and core is None:
            idmap = tok
            i += 1
            continue
        coarse = _parse_coarse(tok, cur_d, metric)
        if coarse is not None:
            quantizer, nlist = coarse
            if i + 1 >= len(toks):
                raise ValueError(f"IVF spec {tok!r} needs an encoding token")
            i += 1
            enc = _parse_ivf_encoding(toks[i], quantizer, cur_d, nlist, metric)
            if enc is None:
                raise ValueError(f"cannot parse IVF encoding {toks[i]!r}")
            from .models.imi import MultiIndexQuantizer

            if isinstance(quantizer, MultiIndexQuantizer):
                # IMI trains itself on the data (reference index_factory
                # sets quantizer_trains_alone for IMI coarse quantizers)
                enc.quantizer_trains_alone = 1
            core = enc
            i += 1
            continue
        if tok == "RFlat":
            refine = "Flat"
            i += 1
            continue
        if m := re.fullmatch(r"Refine\((.+)\)", tok):
            refine = m.group(1)
            i += 1
            continue
        if (m := re.fullmatch(r"(HNSW|NSG)(\d+)?", tok)) and core is None:
            # graph index with an optional storage-codec suffix token
            # (reference index_factory.cpp:560-630 parse_IndexHNSW/NSG:
            # "HNSW32,PQ8x8", "NSG32,SQ8", "HNSW32,100+PQ8", ...)
            nxt = toks[i + 1] if i + 1 < len(toks) else None
            built = _parse_graph_index(
                m.group(1), int(m.group(2)) if m.group(2) else 32,
                nxt, cur_d, metric,
            )
            if built is not None:
                core, used_suffix = built
                i += 2 if used_suffix else 1
                continue
        enc = _parse_flat_encoding(tok, cur_d, metric)
        if enc is not None:
            if core is not None:
                raise ValueError(f"unexpected token {tok!r} after index spec")
            core = enc
            i += 1
            continue
        raise ValueError(f"could not parse token {tok!r} in {description!r}")

    if core is None:
        raise ValueError(f"no index component in {description!r}")

    index = core
    if refine is not None:
        if refine == "Flat":
            index = IndexRefineFlat(index)
        elif refine == "SQ8":
            # fused-path SQ8 refine store (1 byte/dim; the reference
            # builds IndexRefine(IndexScalarQuantizer) here —
            # index_factory.cpp Refine(SQ8))
            index = IndexRefineFlat(index, store="sq8")
        else:
            index = IndexRefine(index, index_factory(cur_d, refine, metric))
    for vt in reversed(transforms):
        index = IndexPreTransform(vt, index)
    if idmap == "IDMap":
        index = IndexIDMap(index)
    elif idmap == "IDMap2":
        index = IndexIDMap2(index)
    return index
