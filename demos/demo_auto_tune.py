"""Explore the speed/accuracy Pareto frontier of several index types
(analogue of reference demos/demo_auto_tune.py)."""

import numpy as np

import faiss_tpu as ft
from faiss_tpu.utils.datasets import SyntheticDataset


def main():
    ds = SyntheticDataset(64, 20000, 100000, 500)
    gt = ds.get_groundtruth(1)
    for desc in ["IVF256,Flat", "IVF256,PQ16", "HNSW16"]:
        index = ft.index_factory(64, desc)
        index.train(ds.get_train())
        index.add(ds.get_database())
        ps = ft.ParameterSpace()
        ps.initialize(index)
        crit = ft.OneRecallAtRCriterion(ds.nq, 1)
        crit.set_groundtruth(None, gt)
        ops = ps.explore(index, ds.get_queries(), crit)
        print(f"=== {desc} operating points:")
        ops.display()


if __name__ == "__main__":
    main()
