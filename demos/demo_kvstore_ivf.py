"""Inverted lists living in a key-value store — proof that the
InvertedLists storage interface is pluggable (analogue of the reference
``demos/rocksdb_ivf``: RocksDBInvertedLists keyed by list_no, codes and
ids as values; here the KV store is stdlib sqlite3, the same
one-key-per-list schema).

Flow (mirrors demos/rocksdb_ivf/demo_rocksdb_ivf.cpp):
  1. train an IVF index, add vectors into a KVInvertedLists store
  2. close everything, reopen the database cold
  3. plug the lists into a fresh index via replace_invlists and search
"""

import os
import sqlite3
import tempfile

import numpy as np

import faiss_tpu as ft
from faiss_tpu.invlists import InvertedLists, replace_invlists
from faiss_tpu.utils.datasets import SyntheticDataset
from faiss_tpu.utils.evaluation import recall_at_k


class KVInvertedLists(InvertedLists):
    """InvertedLists over a (list_no -> blob) key-value store.

    Two keyspaces, like the reference's rocksdb demo: ``codes/<l>`` and
    ``ids/<l>``. Appends read-modify-write the blob — a KV store is a
    capacity backend, not a high-churn one (same trade-off as the
    reference demo).
    """

    def __init__(self, nlist: int, code_size: int, path: str):
        super().__init__(nlist, code_size)
        self.db = sqlite3.connect(path)
        self.db.execute(
            "CREATE TABLE IF NOT EXISTS kv (k TEXT PRIMARY KEY, v BLOB)"
        )

    def _get(self, key: str) -> bytes:
        row = self.db.execute("SELECT v FROM kv WHERE k=?", (key,)).fetchone()
        return row[0] if row else b""

    def _put(self, key: str, value: bytes) -> None:
        self.db.execute(
            "INSERT INTO kv (k, v) VALUES (?, ?) "
            "ON CONFLICT(k) DO UPDATE SET v=excluded.v",
            (key, value),
        )

    def list_size(self, list_no: int) -> int:
        return len(self._get(f"ids/{list_no}")) // 8

    def get_codes(self, list_no: int) -> np.ndarray:
        buf = self._get(f"codes/{list_no}")
        return np.frombuffer(buf, np.uint8).reshape(-1, self.code_size)

    def get_ids(self, list_no: int) -> np.ndarray:
        return np.frombuffer(self._get(f"ids/{list_no}"), np.int64)

    def add_entries(self, list_no, ids, codes) -> int:
        ids = np.ascontiguousarray(ids, np.int64)
        codes = np.ascontiguousarray(codes, np.uint8)
        self._put(f"ids/{list_no}", self._get(f"ids/{list_no}") + ids.tobytes())
        self._put(
            f"codes/{list_no}", self._get(f"codes/{list_no}") + codes.tobytes()
        )
        return len(ids)

    def commit(self) -> None:
        self.db.commit()

    def close(self) -> None:
        self.db.commit()
        self.db.close()


def build(trained_index, xb, ids, db_path) -> None:
    """Route every added vector's code into the KV store."""
    index = trained_index
    kv = KVInvertedLists(index.nlist, index.code_size, db_path)
    _, listnos = index.quantizer.search(xb, 1)
    listnos = np.asarray(listnos)[:, 0]
    codes = index.encode_vectors(xb, listnos)
    codes = np.ascontiguousarray(codes).view(np.uint8).reshape(len(xb), -1)
    for l in np.unique(listnos):
        sel = listnos == l
        kv.add_entries(int(l), ids[sel], codes[sel])
    kv.close()


def load(trained_index, db_path):
    """Cold-open the KV store and plug it into a fresh index."""
    kv = KVInvertedLists(
        trained_index.nlist, trained_index.code_size, db_path
    )
    replace_invlists(trained_index, kv)
    kv.close()
    return trained_index


def main():
    ds = SyntheticDataset(32, 4000, 20000, 100)
    trained = ft.index_factory(32, "IVF64,SQ8")
    trained.train(ds.get_train())

    tmp = tempfile.mkdtemp()
    db_path = os.path.join(tmp, "invlists.sqlite")
    build(
        ft.clone_index(trained),
        ds.get_database(),
        np.arange(20000, dtype=np.int64),
        db_path,
    )

    index = load(ft.clone_index(trained), db_path)
    index.nprobe = 16
    _, I = index.search(ds.get_queries(), 10)
    ref = ft.clone_index(trained)
    ref.add(ds.get_database())
    ref.nprobe = 16
    _, Iref = ref.search(ds.get_queries(), 10)
    r = recall_at_k(np.asarray(I), np.asarray(Iref), 10)
    print(f"KV-store IVF vs in-RAM IVF agreement@10: {r:.4f}")
    assert r > 0.99
    print("demo_kvstore_ivf OK")


if __name__ == "__main__":
    main()
