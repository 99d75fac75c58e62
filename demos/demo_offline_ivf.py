"""Offline IVF pipeline demo (reference: demos/offline_ivf/).

The reference's offline_ivf runs a production-style batch pipeline:
  1. the dataset arrives as file shards (create_sharded_ssnpp_files.py),
  2. a shared quantizer is trained once, each shard is encoded into its own
     IVF index (offline_ivf.py OfflineIVF.index_shard),
  3. shards merge into one on-disk index (contrib/ondisk.py),
  4. queries run as checkpointable big-batch search (offline_ivf.py
     OfflineIVF.search, powered by contrib/big_batch_search.py),
  5. results are written as .npy files.

This demo reproduces that flow end to end on synthetic data with the TPU
stack: shard files -> per-shard add -> merge_ondisk (mmapped payloads) ->
big_batch_search with a checkpoint file -> result files + recall report.

Run: python demos/demo_offline_ivf.py [workdir]
"""

import os
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import faiss_tpu as ft  # noqa: E402
from faiss_tpu.contrib.big_batch_search import big_batch_search  # noqa: E402
from faiss_tpu.contrib.ondisk import merge_ondisk  # noqa: E402


def main(workdir=None):
    workdir = workdir or tempfile.mkdtemp(prefix="offline_ivf_")
    os.makedirs(workdir, exist_ok=True)
    print(f"workdir: {workdir}")
    rs = np.random.RandomState(123)
    d, nshard, per_shard, nq, k = 32, 4, 5000, 200, 10
    nb = nshard * per_shard

    # --- 1. shard files (the create_sharded_*_files stage)
    shard_files = []
    for s in range(nshard):
        xs = rs.rand(per_shard, d).astype(np.float32)
        fname = os.path.join(workdir, f"shard_{s}.npy")
        np.save(fname, xs)
        shard_files.append(fname)
    xq = rs.rand(nq, d).astype(np.float32)

    # --- 2. train the quantizer once, index each shard separately
    xt = np.concatenate([np.load(f)[:2000] for f in shard_files])
    trained = ft.index_factory(d, "IVF64,Flat")
    trained.train(xt)
    ft.write_index(trained, os.path.join(workdir, "trained.index"))

    index_files = []
    for s, fname in enumerate(shard_files):
        idx = ft.read_index(os.path.join(workdir, "trained.index"))
        xs = np.load(fname)
        idx.add_with_ids(
            xs, np.arange(s * per_shard, (s + 1) * per_shard, dtype=np.int64)
        )
        out = os.path.join(workdir, f"shard_{s}.index")
        ft.write_index(idx, out)
        index_files.append(out)
        print(f"indexed shard {s}: {idx.ntotal} vectors")

    # --- 3. merge on disk (payloads stay memory-mapped)
    merged = ft.read_index(os.path.join(workdir, "trained.index"))
    merge_ondisk(
        merged, index_files,
        ivfdata_fname=os.path.join(workdir, "merged.ivfdata"),
    )
    print(f"merged index: ntotal={merged.ntotal}")
    assert merged.ntotal == nb

    # --- 4. checkpointable big-batch search
    merged.nprobe = 16
    ckpt = os.path.join(workdir, "search_ckpt.npz")
    D, I = big_batch_search(
        merged, xq, k, verbose=1, checkpoint_path=ckpt, checkpoint_every=16
    )

    # --- 5. write results + report recall vs exact
    np.save(os.path.join(workdir, "D.npy"), D)
    np.save(os.path.join(workdir, "I.npy"), I)
    flat = ft.IndexFlatL2(d)
    for f in shard_files:
        flat.add(np.load(f))
    _, gt = flat.search(xq, k)
    recall = np.mean([
        len(np.intersect1d(I[i], gt[i])) / k for i in range(nq)
    ])
    print(f"recall@{k} vs exact (nprobe=16): {recall:.4f}")
    assert recall > 0.5
    print("offline IVF pipeline OK")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else None)
