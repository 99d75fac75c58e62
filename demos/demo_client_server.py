"""Distributed search over localhost sockets
(analogue of reference demos/demo_client_server_ivf.py)."""

import numpy as np

import faiss_tpu as ft
from faiss_tpu.contrib.client_server import ClientIndex, SearchServer
from faiss_tpu.utils.datasets import SyntheticDataset


def main():
    ds = SyntheticDataset(32, 5000, 20000, 100)
    xb = ds.get_database()
    nshard = 4
    servers, ports = [], []
    for i in range(nshard):
        index = ft.index_factory(32, "IVF64,Flat")
        index.train(ds.get_train())
        shard = xb[i::nshard]
        index.add_with_ids(shard, np.arange(i, len(xb), nshard, dtype=np.int64))
        index.nprobe = 16
        srv = SearchServer(index).start()
        servers.append(srv)
        ports.append(("127.0.0.1", srv.port))
    client = ClientIndex(ports)
    print("total indexed:", client.ntotal)
    D, I = client.search(ds.get_queries(), 5)
    print("first results:", I[0])
    client.close()
    for s in servers:
        s.stop()


if __name__ == "__main__":
    main()
