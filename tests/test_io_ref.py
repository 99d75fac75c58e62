"""Reference (.faissindex) binary-format interop tests.

Round-trips every supported family through write_ref_index /
read_ref_index and asserts identical search results, plus byte-level
golden checks of the container layout against the documented format
(impl/index_write.cpp) so the writer can't drift in a way the
reader compensates for.
"""

import io as _io
import struct

import numpy as np
import pytest

import faiss_tpu as ft
from faiss_tpu.io_ref import (
    _bits_pack,
    _bits_unpack,
    _pq4_pack,
    _pq4_unpack,
    read_ref_index,
    write_ref_index,
)


rs = np.random.RandomState(5)
D = 16
XB = rs.randn(600, D).astype(np.float32)
XQ = rs.randn(25, D).astype(np.float32)


def _roundtrip(index):
    buf = write_ref_index(index)
    return buf, read_ref_index(buf)


def _same_search(a, b, k=5, rtol=1e-5):
    Da, Ia = a.search(XQ, k)
    Db, Ib = b.search(XQ, k)
    np.testing.assert_array_equal(Ia, Ib)
    np.testing.assert_allclose(Da, Db, rtol=rtol, atol=1e-5)


def test_flat_roundtrip_and_header_bytes():
    index = ft.IndexFlatL2(D)
    index.add(XB)
    buf, back = _roundtrip(index)
    _same_search(index, back)
    # golden header layout (index_write.cpp:100): fourcc, d(i32),
    # ntotal(i64), 2 dummies(i64=1<<20), is_trained, metric(i32),
    # then WRITEXBVECTOR: count of f32s (u64) + raw f32
    assert buf[:4] == b"IxF2"
    d, nt, du1, du2 = struct.unpack_from("<iqqq", buf, 4)
    assert (d, nt, du1, du2) == (D, 600, 1 << 20, 1 << 20)
    assert buf[32:33] == b"\x01"  # is_trained
    (mt,) = struct.unpack_from("<i", buf, 33)
    assert mt == 1  # METRIC_L2
    (nf,) = struct.unpack_from("<Q", buf, 37)
    assert nf == 600 * D
    xb = np.frombuffer(buf, np.float32, nf, 45).reshape(600, D)
    np.testing.assert_array_equal(xb, XB)
    assert len(buf) == 45 + nf * 4


def test_flat_ip_metric_fourcc():
    index = ft.IndexFlatIP(D)
    index.add(XB)
    buf, back = _roundtrip(index)
    assert buf[:4] == b"IxFI"
    assert back.metric_type == ft.MetricType.INNER_PRODUCT
    _same_search(index, back)


def test_pq_roundtrip_nbits8_and_4():
    for nbits in (8, 4):
        index = ft.IndexPQ(D, 4, nbits)
        index.train(XB)
        index.add(XB)
        buf, back = _roundtrip(index)
        assert buf[:4] == b"IxPq"
        np.testing.assert_array_equal(
            back.pq.centroids, index.pq.centroids
        )
        _same_search(index, back)


def test_bits_pack_unpack_inverse():
    for nbits in (4, 6, 8, 10, 12, 16):
        codes = rs.randint(0, 1 << nbits, size=(40, 6)).astype(np.uint32)
        packed = _bits_pack(codes, nbits)
        assert packed.shape[1] == (6 * nbits + 7) // 8
        got = _bits_unpack(packed, 40, 6, nbits)
        np.testing.assert_array_equal(got, codes)


def test_pq4_pack_matches_reference_layout():
    """Byte-level check of one block against the documented packing
    (impl/fast_scan/fast_scan.cpp:48): for 32 codes of one sq pair,
    out[j] = lo[perm0[j]] | lo[perm0[j]+16]<<4, then the hi plane."""
    perm0 = [0, 8, 1, 9, 2, 10, 3, 11, 4, 12, 5, 13, 6, 14, 7, 15]
    codes = rs.randint(0, 16, size=(32, 2)).astype(np.uint8)
    packed = _pq4_pack(codes, 32, 2)
    assert packed.size == 32 * 2 // 2
    byte = codes[:, 0] | (codes[:, 1] << 4)
    lo, hi = byte & 15, byte >> 4
    exp = np.empty(32, np.uint8)
    for j in range(16):
        exp[j] = lo[perm0[j]] | (lo[perm0[j] + 16] << 4)
        exp[j + 16] = hi[perm0[j]] | (hi[perm0[j] + 16] << 4)
    np.testing.assert_array_equal(packed, exp)
    np.testing.assert_array_equal(_pq4_unpack(packed, 32, 2, 32, 2), codes)


def test_pq4_pack_unpack_odd_sizes():
    for n, M, bbs in ((5, 3, 32), (70, 8, 32), (64, 5, 64)):
        codes = rs.randint(0, 16, size=(n, M)).astype(np.uint8)
        M2 = -(-M // 2) * 2
        packed = _pq4_pack(codes, bbs, M2)
        assert packed.size == (-(-n // bbs)) * bbs * M2 // 2
        np.testing.assert_array_equal(
            _pq4_unpack(packed, n, M, bbs, M2), codes
        )


def test_sq_roundtrip():
    index = ft.IndexScalarQuantizer(D, ft.ScalarQuantizer.QT_8bit)
    index.train(XB)
    index.add(XB)
    buf, back = _roundtrip(index)
    assert buf[:4] == b"IxSQ"
    np.testing.assert_allclose(back.sq.trained, index.sq.trained)
    _same_search(index, back)


def test_ivf_flat_roundtrip():
    index = ft.IndexIVFFlat(None, D, 8)
    index.train(XB)
    index.add(XB)
    index.nprobe = 3
    buf, back = _roundtrip(index)
    assert buf[:4] == b"IwFl"
    assert back.nlist == 8 and back.nprobe == 3
    assert back.ntotal == index.ntotal
    _same_search(index, back)


def test_ivf_flat_sparse_lists():
    # <= nlist/2 nonempty lists exercises the 'sprs' encoding (20 adds
    # can touch at most 20 of 64 lists)
    index = ft.IndexIVFFlat(None, D, 64)
    index.train(XB)
    index.add(XB[:20])
    buf, back = _roundtrip(index)
    assert b"sprs" in buf  # sparse encoding taken (after the 4 KB quantizer)
    _same_search(index, back)


def _assert_codes_id_aligned(a, b):
    """Rows round-trip list-grouped (the container stores per-list
    blobs), so compare codes per-id, not per-position."""
    oa = np.argsort(a._ids_host, kind="stable")
    ob = np.argsort(b._ids_host, kind="stable")
    np.testing.assert_array_equal(a._ids_host[oa], b._ids_host[ob])
    np.testing.assert_array_equal(a._codes_host[oa], b._codes_host[ob])
    np.testing.assert_array_equal(
        a._listnos_host[oa], b._listnos_host[ob]
    )


def test_ivf_pq_roundtrip_nbits8_and_4():
    for nbits in (8, 4):
        index = ft.IndexIVFPQ(None, D, 8, 4, nbits)
        index.cp.min_points_per_centroid = 1
        index.train(XB)
        index.add(XB)
        index.nprobe = 4
        buf, back = _roundtrip(index)
        assert buf[:4] == b"IwPQ"
        _assert_codes_id_aligned(index, back)
        _same_search(index, back)


def test_ivf_pq_fastscan_roundtrip():
    index = ft.IndexIVFPQFastScan(None, D, 8, 4, 4)
    index.cp.min_points_per_centroid = 1
    index.train(XB)
    index.add(XB)
    index.nprobe = 4
    buf, back = _roundtrip(index)
    assert buf[:4] == b"IwPf"
    assert b"ilbl" in buf
    _assert_codes_id_aligned(index, back)
    _same_search(index, back)


def test_pq_fastscan_roundtrip():
    index = ft.IndexPQFastScan(D, 4, 4)
    index.train(XB)
    index.add(XB)
    buf, back = _roundtrip(index)
    assert buf[:4] == b"IPfs"
    np.testing.assert_array_equal(back._codes_host, index._codes_host)
    _same_search(index, back)


def test_pretransform_opq_refine_composite():
    """The full serving composite: OPQ pretransform + IVFPQ base +
    flat refine, through IxPT / IxRF / LTra records."""
    base = ft.IndexIVFPQ(None, D, 8, 4, 8)
    base.cp.min_points_per_centroid = 1
    ref = ft.IndexRefineFlat(base)
    ref.k_factor = 3
    pre = ft.index_factory(D, "OPQ4,IVF8,PQ4")
    # hand-build the refine around the factory's pretransform core
    core = pre.index if isinstance(pre, ft.IndexPreTransform) else pre
    del core
    comp = ft.IndexPreTransform(ref)
    opq = ft.OPQMatrix(D, 4)
    opq.train(XB)
    comp.prepend_transform(opq)
    comp.train(XB)
    comp.add(XB)
    buf, back = _roundtrip(comp)
    assert buf[:4] == b"IxPT"
    _same_search(comp, back)


def test_idmap_roundtrip():
    sub = ft.IndexFlatL2(D)
    index = ft.IndexIDMap(sub)
    ids = np.arange(600, dtype=np.int64) * 7 + 3
    index.add_with_ids(XB, ids)
    buf, back = _roundtrip(index)
    assert buf[:4] == b"IxMp"
    _same_search(index, back)


def test_read_index_sniffs_ref_format(tmp_path):
    """ft.read_index must transparently open a reference-format file."""
    index = ft.IndexFlatL2(D)
    index.add(XB)
    p = tmp_path / "ref.faissindex"
    write_ref_index(index, str(p))
    back = ft.read_index(str(p))
    _same_search(index, back)
    # and our own container still loads
    p2 = tmp_path / "own.index"
    ft.write_index(index, str(p2))
    back2 = ft.read_index(str(p2))
    _same_search(index, back2)


def test_unsupported_fourcc_raises():
    blob = b"IHNf" + b"\x00" * 64
    with pytest.raises(ValueError, match="unsupported reference index"):
        read_ref_index(blob)


def test_reference_written_fixture_bytes():
    """A hand-assembled IwFl file following index_write.cpp field by
    field (independent of our writer) must load correctly — guards
    against reader/writer agreeing on a wrong layout."""
    d, nlist = 4, 2
    cent = np.array([[0.0] * 4, [10.0] * 4], np.float32)
    v0 = np.array([[0.1, 0, 0, 0], [0, 0.2, 0, 0]], np.float32)
    v1 = np.array([[10, 10.3, 10, 10]], np.float32)
    b = _io.BytesIO()

    def w(fmt, *vals):
        b.write(struct.pack(fmt, *vals))

    b.write(b"IwFl")
    w("<iqqq", d, 3, 1 << 20, 1 << 20)
    b.write(b"\x01")
    w("<i", 1)  # METRIC_L2
    w("<QQ", nlist, 1)  # nlist, nprobe
    # quantizer: IxF2 flat with the centroids
    b.write(b"IxF2")
    w("<iqqq", d, nlist, 1 << 20, 1 << 20)
    b.write(b"\x01")
    w("<i", 1)
    w("<Q", nlist * d)
    b.write(cent.tobytes())
    # direct map: type NoMap, empty array
    b.write(b"\x00")
    w("<Q", 0)
    # invlists: ilar, full sizes
    b.write(b"ilar")
    w("<QQ", nlist, d * 4)
    b.write(b"full")
    w("<Q", nlist)
    w("<QQ", 2, 1)
    b.write(v0.tobytes())
    w("<qq", 7, 8)
    b.write(v1.tobytes())
    w("<q", 9)
    index = read_ref_index(b.getvalue())
    assert index.ntotal == 3 and index.nlist == 2
    Dq, Iq = index.search(np.zeros((1, 4), np.float32), 2)
    np.testing.assert_array_equal(Iq[0], [7, 8])
    Dq, Iq = index.search(np.full((1, 4), 10.0, np.float32), 1)
    assert Iq[0, 0] == 9
