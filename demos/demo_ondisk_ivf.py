"""Build IVF shards separately, persist them, merge
(analogue of reference demos/demo_ondisk_ivf.py)."""

import tempfile
import os

import numpy as np

import faiss_tpu as ft
from faiss_tpu.contrib.ondisk import merge_ondisk
from faiss_tpu.utils.datasets import SyntheticDataset


def main():
    ds = SyntheticDataset(32, 5000, 40000, 100)
    xb = ds.get_database()
    trained = ft.index_factory(32, "IVF128,Flat")
    trained.train(ds.get_train())

    tmp = tempfile.mkdtemp()
    fnames = []
    for i in range(4):
        shard = ft.clone_index(trained)
        sl = slice(i * 10000, (i + 1) * 10000)
        shard.add_with_ids(xb[sl], np.arange(sl.start, sl.stop, dtype=np.int64))
        fname = os.path.join(tmp, f"block_{i}.npz")
        ft.write_index(shard, fname)
        fnames.append(fname)

    merge_ondisk(trained, fnames)
    trained.nprobe = 16
    D, I = trained.search(ds.get_queries(), 5)
    print("merged ntotal:", trained.ntotal, "first ids:", I[0])


if __name__ == "__main__":
    main()
