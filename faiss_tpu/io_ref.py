"""Reference (.faissindex) binary-format interop.

Byte-level implementation of the fourcc container the reference library
serializes indexes with (impl/index_write.cpp:100 write_index_header,
impl/index_read.cpp:283 read_index_header, impl/io_macros.h WRITE1 /
WRITEVECTOR conventions), so that

  * indexes written by reference faiss load directly into faiss_tpu
    (:func:`read_ref_index`), and
  * indexes built here can be exported for reference consumers
    (:func:`write_ref_index`).

Pure numpy parsing — no bindings. Covered families (the mainstream
serving set): Flat (IxF2/IxFI/IxFl), PQ (IxPq), PQFastScan (IPfs),
ScalarQuantizer (IxSQ), IVFFlat (IwFl), IVFScalarQuantizer (IwSq),
IVFPQ (IwPQ), IVFPQFastScan (IwPf), PreTransform (IxPT) with the
LinearTransform family (LTra/rrot/Pcam) + RemapDimensions/Norm/Center,
Refine (IxRF), IDMap (IxMp/IxM2). Unknown fourccs raise with the code
so callers know exactly what is unsupported.

Layout notes (all little-endian, no alignment padding):
  WRITE1(x)       raw bytes of x (int=4, size_t/idx_t=8, bool/char=1,
                  float=4, enums=4)
  WRITEVECTOR(v)  u64 count then count raw elements
  WRITEXBVECTOR   u64 count-of-f32 then raw f32s (IndexFlat codes,
                  io_macros.h:112)
  fourcc          4 ASCII bytes, read as u32
"""

from __future__ import annotations

import struct
from typing import BinaryIO, List, Optional, Tuple, Union

import numpy as np

from .metric import MetricType

__all__ = ["read_ref_index", "write_ref_index", "REF_FOURCCS"]


# fourccs this module understands at top level (used by io.read_index to
# sniff the container format)
REF_FOURCCS = {
    b"IxF2", b"IxFI", b"IxFl", b"IxPq", b"IPfs", b"IxSQ",
    b"IwFl", b"IwSq", b"IwPQ", b"IwPf",
    b"IxPT", b"IxRF", b"IxMp", b"IxM2", b"null",
}


# ---------------------------------------------------------------------------
# low-level reader / writer over a byte stream
# ---------------------------------------------------------------------------


class _R:
    def __init__(self, buf: bytes):
        self.b = buf
        self.o = 0

    def raw(self, n: int) -> bytes:
        if self.o + n > len(self.b):
            raise EOFError("truncated reference index file")
        out = self.b[self.o : self.o + n]
        self.o += n
        return out

    def u32(self) -> int:
        return struct.unpack("<I", self.raw(4))[0]

    def i32(self) -> int:
        return struct.unpack("<i", self.raw(4))[0]

    def u64(self) -> int:
        return struct.unpack("<Q", self.raw(8))[0]

    def i64(self) -> int:
        return struct.unpack("<q", self.raw(8))[0]

    def f32(self) -> float:
        return struct.unpack("<f", self.raw(4))[0]

    def boolean(self) -> bool:
        return self.raw(1) != b"\x00"

    def fourcc(self) -> bytes:
        return self.raw(4)

    def vector(self, dtype) -> np.ndarray:
        n = self.u64()
        dt = np.dtype(dtype)
        return np.frombuffer(self.raw(n * dt.itemsize), dt).copy()

    def xbvector(self) -> np.ndarray:
        # READXBVECTOR (io_macros.h:120): count is the number of f32s
        n = self.u64()
        return np.frombuffer(self.raw(n * 4), np.float32).copy()


class _W:
    def __init__(self):
        self.parts: List[bytes] = []

    def raw(self, b: bytes):
        self.parts.append(b)

    def u32(self, x):
        self.raw(struct.pack("<I", x))

    def i32(self, x):
        self.raw(struct.pack("<i", x))

    def u64(self, x):
        self.raw(struct.pack("<Q", x))

    def i64(self, x):
        self.raw(struct.pack("<q", x))

    def f32(self, x):
        self.raw(struct.pack("<f", x))

    def boolean(self, x):
        self.raw(b"\x01" if x else b"\x00")

    def fourcc(self, c: bytes):
        assert len(c) == 4
        self.raw(c)

    def vector(self, arr: np.ndarray, dtype):
        arr = np.ascontiguousarray(arr, dtype)
        self.u64(arr.size)
        self.raw(arr.tobytes())

    def xbvector(self, arr: np.ndarray):
        arr = np.ascontiguousarray(arr, np.float32)
        self.u64(arr.size)
        self.raw(arr.tobytes())

    def getvalue(self) -> bytes:
        return b"".join(self.parts)


# ---------------------------------------------------------------------------
# pq4 fast-scan block packing (impl/fast_scan/fast_scan.cpp:48
# pq4_pack_codes) — vectorized numpy pack/unpack of the interleaved
# nibble layout: blocks of bbs vectors x M2 nibbles; sub-quantizers
# paired two-per-byte-plane, 32-vector groups permuted by perm0
# ---------------------------------------------------------------------------

_PERM0 = np.array(
    [0, 8, 1, 9, 2, 10, 3, 11, 4, 12, 5, 13, 6, 14, 7, 15], np.int64
)


def _pq4_pack(codes_int: np.ndarray, bbs: int, M2: int) -> np.ndarray:
    """codes_int [n, M] (values < 16) -> packed uint8 of
    ceil(n/bbs) * bbs * M2 / 2 bytes in the reference block layout."""
    n, M = codes_int.shape
    nb = -(-max(n, 1) // bbs) * bbs
    c = np.zeros((nb, M2), np.uint8)
    c[:n, :M] = codes_int
    # byte stream per (block, sq-pair, 32-group): 32 bytes
    # j in 0..15: out[j]   = lo[perm0[j]] | lo[perm0[j]+16] << 4
    #             out[j+16]= hi[perm0[j]] | hi[perm0[j]+16] << 4
    # where lo/hi are the nibbles of the BYTE holding sq-pair (2 codes)
    byte = (c[:, 0::2] | (c[:, 1::2] << 4)).astype(np.uint8)  # [nb, M2/2]
    lo = byte & 15
    hi = byte >> 4
    g = nb // 32
    lo = lo.reshape(g, 32, M2 // 2)
    hi = hi.reshape(g, 32, M2 // 2)
    out = np.empty((g, M2 // 2, 32), np.uint8)
    out[:, :, :16] = np.transpose(
        lo[:, _PERM0] | (lo[:, _PERM0 + 16] << 4), (0, 2, 1)
    )
    out[:, :, 16:] = np.transpose(
        hi[:, _PERM0] | (hi[:, _PERM0 + 16] << 4), (0, 2, 1)
    )
    # group blocks of bbs vectors: [nb/bbs, M2/2, bbs/32 groups of 32]
    nblk = nb // bbs
    out = out.reshape(nblk, bbs // 32, M2 // 2, 32)
    out = np.transpose(out, (0, 2, 1, 3))
    return np.ascontiguousarray(out).reshape(-1)


def _pq4_unpack(blocks: np.ndarray, n: int, M: int, bbs: int,
                M2: int) -> np.ndarray:
    """Inverse of _pq4_pack: packed bytes -> codes_int [n, M] uint8."""
    nb = -(-max(n, 1) // bbs) * bbs
    out = blocks[: nb * M2 // 2].reshape(nb // bbs, M2 // 2, bbs // 32, 32)
    out = np.transpose(out, (0, 2, 1, 3)).reshape(-1, M2 // 2, 32)
    lo16 = out[:, :, :16]
    hi16 = out[:, :, 16:]
    g = out.shape[0]
    lo = np.empty((g, 32, M2 // 2), np.uint8)
    hi = np.empty((g, 32, M2 // 2), np.uint8)
    lo[:, _PERM0] = np.transpose(lo16 & 15, (0, 2, 1))
    lo[:, _PERM0 + 16] = np.transpose(lo16 >> 4, (0, 2, 1))
    hi[:, _PERM0] = np.transpose(hi16 & 15, (0, 2, 1))
    hi[:, _PERM0 + 16] = np.transpose(hi16 >> 4, (0, 2, 1))
    byte = (lo | (hi << 4)).reshape(nb, M2 // 2)
    codes = np.empty((nb, M2), np.uint8)
    codes[:, 0::2] = byte & 15
    codes[:, 1::2] = byte >> 4
    return codes[:n, :M].copy()


# ---------------------------------------------------------------------------
# generic nbits bitstring packing (impl/ProductQuantizer encoders /
# BitstringWriter: LSB-first within the byte stream)
# ---------------------------------------------------------------------------


def _bits_unpack(buf: np.ndarray, n: int, M: int, nbits: int) -> np.ndarray:
    """[n, code_size] packed bytes -> [n, M] int codes (LSB-first)."""
    if nbits == 8:
        return buf.reshape(n, M).copy()
    if nbits == 16:
        return buf.reshape(n, -1).view("<u2").reshape(n, M).copy()
    bits = np.unpackbits(buf.reshape(n, -1), axis=1, bitorder="little")
    bits = bits[:, : M * nbits].reshape(n, M, nbits)
    return (bits.astype(np.uint32) << np.arange(nbits, dtype=np.uint32)).sum(
        -1
    )


def _bits_pack(codes: np.ndarray, nbits: int) -> np.ndarray:
    """[n, M] int codes -> [n, code_size] packed bytes (LSB-first)."""
    n, M = codes.shape
    if nbits == 8:
        return codes.astype(np.uint8)
    if nbits == 16:
        return codes.astype("<u2").view(np.uint8).reshape(n, -1)
    c = codes.astype(np.uint32)
    bits = (
        (c[..., None] >> np.arange(nbits, dtype=np.uint32)) & 1
    ).astype(np.uint8).reshape(n, M * nbits)
    return np.packbits(bits, axis=1, bitorder="little")


# ---------------------------------------------------------------------------
# shared records
# ---------------------------------------------------------------------------


def _read_header(r: _R):
    d = r.i32()
    ntotal = r.i64()
    r.i64()  # dummy (index_write.cpp:103)
    r.i64()
    is_trained = r.boolean()
    mt = r.i32()
    metric_arg = r.f32() if mt > 1 else 0.0
    return d, ntotal, is_trained, MetricType(mt), metric_arg


def _write_header(w: _W, index):
    w.i32(index.d)
    w.i64(index.ntotal)
    w.i64(1 << 20)
    w.i64(1 << 20)
    w.boolean(index.is_trained)
    mt = int(index.metric_type)
    w.i32(mt)
    if mt > 1:
        w.f32(getattr(index, "metric_arg", 0.0))


def _read_pq(r: _R):
    """write_ProductQuantizer (index_write.cpp:183): d, M, nbits size_t
    + centroids vector<float> in [M, ksub, dsub] order."""
    from .codecs.pq import ProductQuantizer

    d, M, nbits = r.u64(), r.u64(), r.u64()
    cent = r.vector(np.float32)
    pq = ProductQuantizer(d, M, nbits)
    ksub = 1 << nbits
    pq.centroids = cent.reshape(M, ksub, d // M)
    return pq


def _write_pq(w: _W, pq):
    w.u64(pq.d)
    w.u64(pq.M)
    w.u64(pq.nbits)
    w.vector(pq.centroids.reshape(-1), np.float32)


def _read_sq(r: _R):
    """write_ScalarQuantizer (index_write.cpp:262)."""
    from .codecs.sq import QuantizerType, ScalarQuantizer

    qtype = QuantizerType(r.i32())
    rangestat = r.i32()
    rangestat_arg = r.f32()
    d = r.u64()
    code_size = r.u64()
    trained = r.vector(np.float32)
    sq = ScalarQuantizer(d, qtype)
    del rangestat, rangestat_arg, code_size
    if trained.size == 2:
        sq.trained = trained.reshape(2, 1)
    elif trained.size == 2 * d:
        sq.trained = trained.reshape(2, d)
    elif trained.size:
        raise ValueError(
            f"unsupported ScalarQuantizer trained layout ({trained.size} "
            f"floats for d={d}) — TurboQuant tables are not interop-scoped"
        )
    return sq


def _write_sq(w: _W, sq, d: int):
    w.i32(int(sq.qtype))
    w.i32(0)  # RS_minmax
    w.f32(0.0)
    w.u64(d)
    w.u64(sq.code_size)
    tr = sq.trained
    w.vector(
        np.zeros(0, np.float32) if tr is None else np.asarray(tr).reshape(-1),
        np.float32,
    )


def _read_direct_map(r: _R):
    """write_direct_map (index_write.cpp:451)."""
    dm_type = r.raw(1)[0]
    arr = r.vector(np.int64)
    if dm_type == 2:  # hashtable: vector<pair<idx_t, idx_t>>
        npairs = r.u64()
        r.raw(npairs * 16)
    return arr


def _read_invlists_arrays(r: _R):
    """ArrayInvertedLists 'ilar' (index_write.cpp:271): returns
    (nlist, code_size, list of (listno, codes bytes [n, code_size],
    ids [n]))."""
    h = r.fourcc()
    if h == b"il00":
        return 0, 0, []
    if h == b"ilar":
        nlist = r.u64()
        code_size = r.u64()
        lt = r.fourcc()
        entries: List[Tuple[int, int]] = []
        if lt == b"full":
            sizes = r.vector(np.uint64)
            entries = [(i, int(sz)) for i, sz in enumerate(sizes) if sz]
        elif lt == b"sprs":
            pairs = r.vector(np.uint64).reshape(-1, 2)
            entries = [(int(i), int(nn)) for i, nn in pairs]
        else:
            raise ValueError(f"unknown invlists list_type {lt!r}")
        lists = []
        for listno, nn in entries:
            codes = np.frombuffer(
                r.raw(nn * code_size), np.uint8
            ).reshape(nn, code_size)
            ids = np.frombuffer(r.raw(nn * 8), np.int64).copy()
            lists.append((listno, codes, ids))
        return nlist, code_size, lists
    if h == b"ilbl":
        raise ValueError("use _read_invlists_block for 'ilbl'")
    raise ValueError(f"unsupported InvertedLists fourcc {h!r}")


def _write_invlists_arrays(w: _W, nlist: int, code_size: int, lists):
    """lists: sequence of (codes bytes [n, code_size], ids [n]) per
    list, empty allowed."""
    w.fourcc(b"ilar")
    w.u64(nlist)
    w.u64(code_size)
    n_non0 = sum(1 for c, _ in lists if len(c))
    if n_non0 > nlist // 2:
        w.fourcc(b"full")
        w.vector(
            np.array([len(c) for c, _ in lists], np.uint64), np.uint64
        )
    else:
        w.fourcc(b"sprs")
        pairs = []
        for i, (c, _) in enumerate(lists):
            if len(c):
                pairs.extend((i, len(c)))
        w.vector(np.array(pairs, np.uint64), np.uint64)
    for codes, ids in lists:
        if len(codes):
            w.raw(np.ascontiguousarray(codes, np.uint8).tobytes())
            w.raw(np.ascontiguousarray(ids, np.int64).tobytes())


def _gather_lists(index, to_bytes):
    """Group an IVF index's add-order host arrays into per-list
    (codes bytes, ids) using ``to_bytes(codes_rows) -> uint8 [n, cs]``."""
    nlist = index.nlist
    listnos = index._listnos_host
    order = np.argsort(listnos, kind="stable")
    lists = []
    bounds = np.searchsorted(listnos[order], np.arange(nlist + 1))
    for li in range(nlist):
        sel = order[bounds[li] : bounds[li + 1]]
        lists.append((to_bytes(index, sel), index._ids_host[sel]))
    return lists


# ---------------------------------------------------------------------------
# VectorTransform records (index_write.cpp:113)
# ---------------------------------------------------------------------------


def _read_vt(r: _R):
    from . import transforms as T

    h = r.fourcc()
    if h in (b"rrot", b"LTra", b"Pcam", b"Viqm"):
        if h == b"Pcam":
            eigen_power = r.f32()
            r.f32()  # epsilon
            random_rotation = r.boolean()
            r.boolean()  # balanced_bins
            mean = r.vector(np.float32)
            r.vector(np.float32)  # eigenvalues
            r.vector(np.float32)  # PCAMat (full-rank; A below is the crop)
        elif h == b"Viqm":
            r.i32()  # max_iter
            r.i32()  # seed
        have_bias = r.boolean()
        A = r.vector(np.float32)
        b = r.vector(np.float32)
        d_in, d_out = r.i32(), r.i32()
        is_trained = r.boolean()
        if h == b"Pcam":
            vt = T.PCAMatrix(d_in, d_out, eigen_power, random_rotation)
            if mean.size:
                vt.mean = mean
        elif h == b"rrot":
            vt = T.RandomRotationMatrix(d_in, d_out)
        else:
            vt = T.LinearTransform(d_in, d_out, have_bias)
        if A.size:
            vt.A = A.reshape(d_out, d_in)
        if b.size:
            vt.b = b
            vt.have_bias = True
        vt.is_trained = is_trained
        if hasattr(vt, "set_is_orthonormal"):
            vt.set_is_orthonormal()
        return vt
    if h == b"RmDT":
        m = r.vector(np.int32)
        d_in, d_out = r.i32(), r.i32()
        r.boolean()
        return T.RemapDimensionsTransform(d_in, d_out, m)
    if h == b"VNrm":
        norm = r.f32()
        d_in, _d_out = r.i32(), r.i32()
        r.boolean()
        return T.NormalizationTransform(d_in, norm)
    if h == b"VCnt":
        mean = r.vector(np.float32)
        d_in, _d_out = r.i32(), r.i32()
        r.boolean()
        vt = T.CenteringTransform(d_in)
        vt.mean = mean
        vt.is_trained = True
        return vt
    raise ValueError(f"unsupported VectorTransform fourcc {h!r}")


def _write_vt(w: _W, vt):
    from . import transforms as T

    if isinstance(vt, T.RemapDimensionsTransform):
        w.fourcc(b"RmDT")
        w.vector(np.asarray(vt.map, np.int32), np.int32)
    elif isinstance(vt, T.NormalizationTransform):
        w.fourcc(b"VNrm")
        w.f32(vt.norm)
    elif isinstance(vt, T.CenteringTransform):
        w.fourcc(b"VCnt")
        w.vector(vt.mean, np.float32)
    elif isinstance(vt, T.LinearTransform):
        # OPQ and friends export as the generic linear record, exactly as
        # the reference does (index_write.cpp:141 "includes OPQ")
        if isinstance(vt, T.RandomRotationMatrix):
            w.fourcc(b"rrot")
        else:
            w.fourcc(b"LTra")
        w.boolean(vt.have_bias and vt.b is not None)
        w.vector(
            np.zeros(0, np.float32) if vt.A is None else vt.A.reshape(-1),
            np.float32,
        )
        w.vector(
            vt.b if (vt.have_bias and vt.b is not None)
            else np.zeros(0, np.float32),
            np.float32,
        )
    else:
        raise ValueError(
            f"cannot export VectorTransform {type(vt).__name__} to the "
            "reference format"
        )
    w.i32(vt.d_in)
    w.i32(vt.d_out)
    w.boolean(vt.is_trained)


# ---------------------------------------------------------------------------
# index records — read
# ---------------------------------------------------------------------------


def _read_any(r: _R):
    from .models.flat import IndexFlat
    from .models.ivf import IndexIVFFlat
    from .models.ivf_pq import IndexIVFPQ, IndexIVFPQFastScan
    from .models.meta import (
        IndexIDMap,
        IndexIDMap2,
        IndexPreTransform,
        IndexRefine,
        IndexRefineFlat,
    )
    from .models.pq import IndexPQ, IndexPQFastScan
    from .models.sq import IndexIVFScalarQuantizer, IndexScalarQuantizer

    h = r.fourcc()

    if h == b"null":
        return None

    if h in (b"IxF2", b"IxFI", b"IxFl"):
        d, ntotal, is_trained, mt, marg = _read_header(r)
        if h == b"IxF2":
            mt = MetricType.L2
        elif h == b"IxFI":
            mt = MetricType.INNER_PRODUCT
        xb = r.xbvector().reshape(ntotal, d) if ntotal else None
        index = IndexFlat(d, mt, marg)
        if xb is not None:
            index.add(xb)
        index.is_trained = is_trained
        return index

    if h == b"IxSQ":
        d, ntotal, is_trained, mt, _ = _read_header(r)
        sq = _read_sq(r)
        codes = r.vector(np.uint8)
        index = IndexScalarQuantizer(d, sq.qtype, mt)
        index.sq = sq
        index.is_trained = is_trained
        if ntotal:
            c = codes.reshape(ntotal, sq.code_size)
            index._codes = c
            # the scan path searches DECODED vectors held in the flat
            # store (IndexScalarQuantizer.add) — repopulate it, don't
            # just park the codes
            IndexFlat.add(index, sq.decode(c))
        return index

    if h == b"IxPq":
        d, ntotal, is_trained, mt, _ = _read_header(r)
        pq = _read_pq(r)
        codes = r.vector(np.uint8)
        r.i32()  # search_type
        r.boolean()  # encode_signs
        r.i32()  # polysemous_ht
        index = IndexPQ(d, pq.M, pq.nbits, mt)
        index.pq = pq
        if ntotal:
            index._codes_host = _bits_unpack(
                codes.reshape(ntotal, -1), ntotal, pq.M, pq.nbits
            ).astype(np.uint8 if pq.nbits <= 8 else np.uint16)
        index.ntotal = ntotal
        index.is_trained = is_trained
        return index

    if h == b"IPfs":
        d, ntotal, is_trained, mt, _ = _read_header(r)
        pq = _read_pq(r)
        r.i32()  # implem
        bbs = r.i32()
        r.i32()  # qbs
        r.u64()  # ntotal2
        M2 = r.u64()
        codes = r.vector(np.uint8)
        index = IndexPQFastScan(d, pq.M, pq.nbits, mt, bbs)
        index.pq = pq
        if ntotal:
            index._codes_host = _pq4_unpack(codes, ntotal, pq.M, bbs, M2)
        index.ntotal = ntotal
        index.is_trained = is_trained
        return index

    if h in (b"IwFl", b"IwSq", b"IwPQ", b"IwPf"):
        d, ntotal, is_trained, mt, _ = _read_header(r)
        nlist = r.u64()
        nprobe = r.u64()
        quantizer = _read_any(r)
        _read_direct_map(r)
        if h == b"IwFl":
            index = IndexIVFFlat(quantizer, d, nlist, mt)
            _nl, cs, lists = _read_invlists_arrays(r)
            conv = lambda c: np.ascontiguousarray(c).view(  # noqa: E731
                np.float32
            ).reshape(len(c), d)
        elif h == b"IwSq":
            sq = _read_sq(r)
            r.u64()  # code_size
            by_residual = r.boolean()
            index = IndexIVFScalarQuantizer(
                quantizer, d, nlist, sq.qtype, mt, by_residual=by_residual
            )
            index.sq = sq
            _nl, cs, lists = _read_invlists_arrays(r)
            conv = lambda c: c  # noqa: E731  (packed SQ bytes, our layout)
        elif h == b"IwPQ":
            by_residual = r.boolean()
            r.u64()  # code_size
            pq = _read_pq(r)
            index = IndexIVFPQ(quantizer, d, nlist, pq.M, pq.nbits, mt)
            index.pq = pq
            index.by_residual = by_residual
            _nl, cs, lists = _read_invlists_arrays(r)
            conv = lambda c: _bits_unpack(  # noqa: E731
                c, len(c), pq.M, pq.nbits
            ).astype(np.uint8 if pq.nbits <= 8 else np.uint16)
        else:  # IwPf
            by_residual = r.boolean()
            r.u64()  # code_size
            bbs = r.i32()
            M2 = r.u64()
            r.i32()  # implem
            r.u64()  # qbs2
            pq = _read_pq(r)
            index = IndexIVFPQFastScan(
                quantizer, d, nlist, pq.M, pq.nbits, mt, bbs
            )
            index.pq = pq
            index.by_residual = by_residual
            ilh = r.fourcc()
            if ilh != b"ilbl":
                raise ValueError(
                    f"IwPf expects BlockInvertedLists, got {ilh!r}"
                )
            _nl = r.u64()
            r.u64()  # code_size
            r.u64()  # n_per_block
            r.u64()  # block_size
            lists = []
            for li in range(nlist):
                ids = r.vector(np.int64)
                blocks = r.vector(np.uint8)
                if len(ids):
                    lists.append(
                        (li, _pq4_unpack(blocks, len(ids), pq.M, bbs, M2),
                         ids)
                    )
            conv = lambda c: c  # noqa: E731  (already unpacked)
        listnos = np.concatenate(
            [np.full(len(ids), li, np.int32) for li, _c, ids in lists]
        ) if lists else np.zeros(0, np.int32)
        all_ids = np.concatenate([ids for _li, _c, ids in lists]) if lists \
            else np.zeros(0, np.int64)
        all_codes = (
            np.concatenate([conv(c) for _li, c, _ids in lists])
            if lists else None
        )
        index._listnos_host = listnos
        index._ids_host = all_ids
        if all_codes is not None:
            index._codes_host = all_codes
        index.ntotal = int(ntotal)
        index.nprobe = max(1, int(nprobe))
        index.is_trained = is_trained
        return index

    if h == b"IxPT":
        d, ntotal, is_trained, mt, _ = _read_header(r)
        from .models.meta import IndexPreTransform

        nt = r.i32()
        chain = [_read_vt(r) for _ in range(nt)]
        sub = _read_any(r)
        index = IndexPreTransform(sub)
        for vt in reversed(chain):
            index.prepend_transform(vt)
        index.is_trained = is_trained
        index.ntotal = sub.ntotal
        return index

    if h == b"IxRF":
        d, ntotal, is_trained, mt, _ = _read_header(r)
        base = _read_any(r)
        refine = _read_any(r)
        k_factor = r.f32()
        from .models.flat import IndexFlat as _Flat

        cls = IndexRefineFlat if isinstance(refine, _Flat) else IndexRefine
        index = IndexRefine(base, refine)
        index.__class__ = cls
        if cls is IndexRefineFlat:
            index.store_float16 = False
        index.k_factor = k_factor
        index.ntotal = base.ntotal
        return index

    if h in (b"IxMp", b"IxM2"):
        d, ntotal, is_trained, mt, _ = _read_header(r)
        sub = _read_any(r)
        index = (IndexIDMap2 if h == b"IxM2" else IndexIDMap)(sub)
        index.id_map = r.vector(np.int64)
        index.ntotal = sub.ntotal
        return index

    raise ValueError(
        f"unsupported reference index fourcc {h!r} — supported: "
        f"{sorted(c.decode() for c in REF_FOURCCS)}"
    )


# ---------------------------------------------------------------------------
# index records — write
# ---------------------------------------------------------------------------


def _write_any(w: _W, index):
    from .models.flat import IndexFlat
    from .models.ivf import IndexIVFFlat
    from .models.ivf_pq import IndexIVFPQ, IndexIVFPQFastScan
    from .models.meta import (
        IndexIDMap,
        IndexIDMap2,
        IndexPreTransform,
        IndexRefine,
    )
    from .models.pq import IndexPQ, IndexPQFastScan
    from .models.sq import IndexIVFScalarQuantizer, IndexScalarQuantizer

    if index is None:
        w.fourcc(b"null")
        return

    if isinstance(index, IndexPreTransform):
        w.fourcc(b"IxPT")
        _write_header(w, index)
        w.i32(len(index.chain))
        for vt in index.chain:
            _write_vt(w, vt)
        _write_any(w, index.index)
        return

    if isinstance(index, (IndexIDMap, IndexIDMap2)):
        w.fourcc(b"IxM2" if isinstance(index, IndexIDMap2) else b"IxMp")
        _write_header(w, index)
        _write_any(w, index.index)
        w.vector(np.asarray(index.id_map, np.int64), np.int64)
        return

    if isinstance(index, IndexRefine):
        w.fourcc(b"IxRF")
        _write_header(w, index)
        _write_any(w, index.base_index)
        _write_any(w, index.refine_index)
        w.f32(float(index.k_factor))
        return

    if isinstance(index, IndexIVFPQFastScan):
        w.fourcc(b"IwPf")
        _write_ivf_header(w, index)
        M2 = -(-index.pq.M // 2) * 2
        w.boolean(index.by_residual)
        w.u64(index.pq.M * index.pq.nbits // 8 or 1)
        w.i32(index.bbs)
        w.u64(M2)
        w.i32(0)  # implem: auto
        w.u64(0)  # qbs2
        _write_pq(w, index.pq)
        # BlockInvertedLists (invlists/BlockInvertedLists.cpp:152)
        w.fourcc(b"ilbl")
        w.u64(index.nlist)
        w.u64(M2 // 2)
        w.u64(index.bbs)
        w.u64(index.bbs * M2 // 2)
        lists = _gather_lists(index, lambda ix, sel: ix._codes_host[sel])
        for codes, ids in lists:
            w.vector(np.asarray(ids, np.int64), np.int64)
            w.vector(_pq4_pack(codes, index.bbs, M2), np.uint8)
        return

    if isinstance(index, IndexIVFPQ):
        w.fourcc(b"IwPQ")
        _write_ivf_header(w, index)
        w.boolean(index.by_residual)
        w.u64(index.code_size)
        _write_pq(w, index.pq)
        lists = _gather_lists(
            index,
            lambda ix, sel: _bits_pack(ix._codes_host[sel], ix.pq.nbits),
        )
        _write_invlists_arrays(w, index.nlist, index.code_size, lists)
        return

    if isinstance(index, IndexIVFScalarQuantizer):
        w.fourcc(b"IwSq")
        _write_ivf_header(w, index)
        _write_sq(w, index.sq, index.d)
        w.u64(index.sq.code_size)
        w.boolean(index.by_residual)
        lists = _gather_lists(index, lambda ix, sel: ix._codes_host[sel])
        _write_invlists_arrays(w, index.nlist, index.sq.code_size, lists)
        return

    if isinstance(index, IndexIVFFlat):
        w.fourcc(b"IwFl")
        _write_ivf_header(w, index)
        lists = _gather_lists(
            index,
            lambda ix, sel: np.ascontiguousarray(
                ix._codes_host[sel], np.float32
            ).view(np.uint8).reshape(len(sel), ix.d * 4),
        )
        _write_invlists_arrays(w, index.nlist, index.d * 4, lists)
        return

    if isinstance(index, IndexPQFastScan):
        w.fourcc(b"IPfs")
        _write_header(w, index)
        _write_pq(w, index.pq)
        M2 = -(-index.pq.M // 2) * 2
        ntotal2 = -(-max(index.ntotal, 1) // index.bbs) * index.bbs
        w.i32(0)  # implem
        w.i32(index.bbs)
        w.i32(0)  # qbs
        w.u64(ntotal2)
        w.u64(M2)
        codes = (
            index._codes_host
            if index._codes_host is not None
            else np.zeros((0, index.pq.M), np.uint8)
        )
        w.vector(_pq4_pack(codes, index.bbs, M2), np.uint8)
        return

    if isinstance(index, IndexPQ):
        w.fourcc(b"IxPq")
        _write_header(w, index)
        _write_pq(w, index.pq)
        codes = (
            _bits_pack(index._codes_host, index.pq.nbits)
            if index._codes_host is not None
            else np.zeros((0, 1), np.uint8)
        )
        w.vector(codes.reshape(-1), np.uint8)
        w.i32(0)  # search_type ST_PQ
        w.boolean(False)  # encode_signs
        w.i32(0)  # polysemous_ht
        return

    if isinstance(index, IndexScalarQuantizer):
        w.fourcc(b"IxSQ")
        _write_header(w, index)
        _write_sq(w, index.sq, index.d)
        codes = (
            index._codes
            if index._codes is not None
            else np.zeros((0, 1), np.uint8)
        )
        w.vector(np.asarray(codes, np.uint8).reshape(-1), np.uint8)
        return

    if isinstance(index, IndexFlat):
        mt = index.metric_type
        w.fourcc(
            b"IxF2" if mt == MetricType.L2
            else b"IxFI" if mt == MetricType.INNER_PRODUCT
            else b"IxFl"
        )
        _write_header(w, index)
        w.xbvector(index.vectors())
        return

    raise ValueError(
        f"cannot export {type(index).__name__} to the reference binary "
        "format (supported: Flat/PQ/SQ/IVFFlat/IVFSQ/IVFPQ/IVFPQFastScan/"
        "PQFastScan/PreTransform/Refine/IDMap)"
    )


def _write_ivf_header(w: _W, index):
    _write_header(w, index)
    w.u64(index.nlist)
    w.u64(index.nprobe)
    _write_any(w, index.quantizer)
    # direct map: none (write_direct_map, index_write.cpp:451)
    w.raw(b"\x00")
    w.u64(0)


# ---------------------------------------------------------------------------
# public API
# ---------------------------------------------------------------------------


def read_ref_index(src: Union[str, bytes, BinaryIO]):
    """Load an index written by the reference library
    (impl/index_read.cpp read_index)."""
    if isinstance(src, bytes):
        buf = src
    elif hasattr(src, "read"):
        buf = src.read()
    else:
        with open(src, "rb") as f:
            buf = f.read()
    return _read_any(_R(buf))


def write_ref_index(index, dst: Union[str, BinaryIO, None] = None
                    ) -> Optional[bytes]:
    """Serialize ``index`` in the reference binary format
    (impl/index_write.cpp write_index). Returns the bytes when ``dst``
    is None."""
    w = _W()
    _write_any(w, index)
    buf = w.getvalue()
    if dst is None:
        return buf
    if hasattr(dst, "write"):
        dst.write(buf)
    else:
        with open(dst, "wb") as f:
            f.write(buf)
    return None
