"""Declarative benchmark framework (reference: benchs/bench_fw/).

The reference's bench_fw drives reproducible index benchmarks from
descriptors: a DatasetDescriptor names the data, an IndexDescriptor names a
factory string plus construction/search parameter grids, and Benchmark
trains/builds/sweeps them, recording Pareto-optimal (accuracy, time)
operating points (benchs/bench_fw/benchmark.py, descriptors.py,
optimize.py). This module is the TPU-native equivalent, built on the
existing autotune machinery (OperatingPoints / ParameterSpace) instead of a
separate result-handler stack; results serialize to plain JSON.

Typical use:

    ds = DatasetDescriptor(d=64, nb=10000, nq=100, nt=5000)
    idx = IndexDescriptor("IVF64,PQ8x4fs", search_params={"nprobe": [1, 4, 16]})
    bench = Benchmark(ds, [idx], k=10)
    results = bench.run()
    print(json.dumps(results, indent=2))
"""

from __future__ import annotations

import json
import time
from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional

import numpy as np

from .autotune import OperatingPoints
from .factory import index_factory
from .io import read_index
from .metric import MetricType
from .utils.datasets import Dataset, SyntheticDataset
from .utils.evaluation import knn_intersection_measure


@dataclass
class DatasetDescriptor:
    """Names a dataset (reference: bench_fw/descriptors.py:56).

    Either give (d, nb, nq, nt[, seed]) for synthetic data, or a
    ``dataset`` instance implementing utils.datasets.Dataset.
    """

    d: int = 0
    nb: int = 0
    nq: int = 0
    nt: int = 0
    seed: int = 1338
    metric: str = "L2"
    dataset: Optional[Dataset] = None
    name: str = ""

    def load(self) -> Dataset:
        if self.dataset is not None:
            return self.dataset
        return SyntheticDataset(
            self.d, self.nt, self.nb, self.nq, metric=self.metric,
            seed=self.seed,
        )

    def label(self) -> str:
        if self.name:
            return self.name
        return f"syn_{self.d}d_{self.nb}n_{self.seed}"


@dataclass
class IndexDescriptor:
    """Names an index build (reference: bench_fw/descriptors.py:24).

    ``factory`` is an index_factory string (or ``path`` a serialized index);
    ``construction_params`` are attributes set before train/add (e.g.
    {"k_factor": 8}); ``search_params`` maps parameter name -> list of
    values swept at search time (cartesian product).
    """

    factory: Optional[str] = None
    path: Optional[str] = None
    construction_params: Dict[str, Any] = field(default_factory=dict)
    search_params: Dict[str, List[Any]] = field(default_factory=dict)
    training_size: Optional[int] = None

    def label(self) -> str:
        return self.factory or self.path or "?"


def _param_grid(search_params: Dict[str, List[Any]]):
    """Cartesian product of the search-parameter grid, cheapest first."""
    if not search_params:
        yield {}
        return
    names = sorted(search_params)
    idx = [0] * len(names)
    sizes = [len(search_params[n]) for n in names]
    total = int(np.prod(sizes))
    for flat in range(total):
        combo, rem = {}, flat
        for n, s in zip(names, sizes):
            combo[n] = search_params[n][rem % s]
            rem //= s
        yield combo


def _set_param(index, name: str, value):
    """Set a search-time parameter, descending through wrappers (the
    ParameterSpace convention: 'nprobe' reaches the inner IVF index)."""
    obj = index
    for _ in range(8):
        if hasattr(obj, name):
            setattr(obj, name, value)
            return
        inner = getattr(obj, "base_index", None) or getattr(obj, "index", None)
        if inner is None:
            break
        obj = inner
    raise AttributeError(f"no index in the chain has parameter {name!r}")


class Benchmark:
    """Train/build/sweep a set of index descriptors over one dataset and
    record Pareto-optimal operating points (reference:
    bench_fw/benchmark.py Benchmark.benchmark)."""

    def __init__(self, dataset: DatasetDescriptor,
                 indexes: List[IndexDescriptor], k: int = 10,
                 nrun: int = 1, verbose: bool = False):
        self.dataset = dataset
        self.indexes = indexes
        self.k = int(k)
        self.nrun = int(nrun)
        self.verbose = verbose

    def _log(self, msg):
        if self.verbose:
            import sys

            print(f"[bench_fw] {msg}", file=sys.stderr, flush=True)

    def run(self) -> Dict[str, Any]:
        ds = self.dataset.load()
        xt, xb, xq = ds.get_train(), ds.get_database(), ds.get_queries()
        gt = ds.get_groundtruth(self.k)
        out: Dict[str, Any] = {
            "dataset": self.dataset.label(),
            "k": self.k,
            "indexes": [],
        }
        for desc in self.indexes:
            self._log(f"building {desc.label()}")
            d = xb.shape[1]
            if desc.path:
                index = read_index(desc.path)
                t_train = t_add = 0.0
            else:
                metric = (
                    MetricType.INNER_PRODUCT
                    if self.dataset.metric in ("IP", "INNER_PRODUCT")
                    else MetricType.L2
                )
                index = index_factory(d, desc.factory, metric)
                for name, val in desc.construction_params.items():
                    _set_param(index, name, val)
                t0 = time.time()
                ts = desc.training_size
                index.train(xt[:ts] if ts else xt)
                t_train = time.time() - t0
                t0 = time.time()
                index.add(xb)
                t_add = time.time() - t0
            ops = OperatingPoints()
            rows = []
            for combo in _param_grid(desc.search_params):
                for name, val in combo.items():
                    _set_param(index, name, val)
                # warmup (compile) run, then timed runs
                index.search(xq, self.k)
                t0 = time.time()
                for _ in range(self.nrun):
                    _, I = index.search(xq, self.k)
                t_search = (time.time() - t0) / self.nrun
                recall = knn_intersection_measure(I[:, : self.k], gt)
                key = json.dumps(combo, sort_keys=True)
                optimal = ops.add(recall, t_search, key)
                rows.append(
                    {
                        "params": combo,
                        "recall": round(float(recall), 4),
                        "time_s": round(t_search, 6),
                        "qps": round(len(xq) / max(t_search, 1e-9), 1),
                        "optimal": bool(optimal),
                    }
                )
                self._log(
                    f"  {key}: recall={recall:.4f} {t_search*1000:.1f} ms"
                )
            out["indexes"].append(
                {
                    "factory": desc.label(),
                    "train_s": round(t_train, 3),
                    "add_s": round(t_add, 3),
                    "points": rows,
                    "pareto": [
                        {"recall": round(p.perf, 4), "time_s": round(p.t, 6),
                         "params": json.loads(p.key)}
                        for p in ops.optimal_pts
                    ],
                }
            )
        return out


def run_benchmark(config: Dict[str, Any]) -> Dict[str, Any]:
    """Config-file entry point (the bench_fw CLI analogue): a dict with
    "dataset" (DatasetDescriptor fields) and "indexes" (list of
    IndexDescriptor fields), e.g. parsed from JSON."""
    ds = DatasetDescriptor(**config["dataset"])
    idxs = [IndexDescriptor(**ic) for ic in config["indexes"]]
    bench = Benchmark(
        ds, idxs, k=config.get("k", 10), nrun=config.get("nrun", 1),
        verbose=config.get("verbose", False),
    )
    return bench.run()
