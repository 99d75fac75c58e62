"""Merging on-disk index shards (analogue of contrib/ondisk.py merge_ondisk).

The reference merges trained IVF shards into OnDiskInvertedLists. Here
shards are .npz index files; merge loads each shard's entries into the
target without re-encoding (the invlists are host arrays, so "on disk"
means memory-mapped npz payloads)."""

from __future__ import annotations

from ..io import read_index
from ..ivflib import extract_index_ivf


def merge_ondisk(trained_index, shard_fnames, ivfdata_fname=None) -> None:
    """Merge shard files into trained_index (contrib/ondisk.py:13)."""
    del ivfdata_fname  # output container is the caller's write_index target
    ivf0 = extract_index_ivf(trained_index)
    for fname in shard_fnames:
        shard = read_index(fname)
        ivf = extract_index_ivf(shard)
        ivf0.merge_from(ivf)
    trained_index.ntotal = ivf0.ntotal
