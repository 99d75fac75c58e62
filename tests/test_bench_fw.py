"""bench_fw declarative benchmark runner (reference: benchs/bench_fw/)."""

import json

import numpy as np

import faiss_tpu as ft
from faiss_tpu.bench_fw import (
    Benchmark,
    DatasetDescriptor,
    IndexDescriptor,
    run_benchmark,
)


def test_benchmark_sweep(tmp_path):
    ds = DatasetDescriptor(d=16, nb=2000, nq=50, nt=1500)
    idx = IndexDescriptor(
        "IVF16,Flat", search_params={"nprobe": [1, 4, 16]}
    )
    bench = Benchmark(ds, [idx], k=5, nrun=1)
    res = bench.run()
    assert res["k"] == 5
    (entry,) = res["indexes"]
    assert entry["factory"] == "IVF16,Flat"
    pts = entry["points"]
    assert len(pts) == 3
    by_nprobe = {p["params"]["nprobe"]: p for p in pts}
    # recall must be monotone in nprobe, exact at full probing
    assert by_nprobe[16]["recall"] >= by_nprobe[4]["recall"]
    assert by_nprobe[4]["recall"] >= by_nprobe[1]["recall"]
    assert by_nprobe[16]["recall"] > 0.999
    # pareto frontier is non-empty, sorted by time, and json-serializable
    assert entry["pareto"]
    ts = [p["time_s"] for p in entry["pareto"]]
    assert ts == sorted(ts)
    json.dumps(res)


def test_run_benchmark_config_and_wrappers():
    # construction params descend through wrappers (k_factor on RFlat)
    cfg = {
        "dataset": {"d": 16, "nb": 2000, "nq": 50, "nt": 1500},
        "indexes": [
            {
                "factory": "IVF16,PQ4x4fs,RFlat",
                "construction_params": {"k_factor": 4},
                "search_params": {"nprobe": [4, 16]},
            }
        ],
        "k": 5,
    }
    res = run_benchmark(cfg)
    (entry,) = res["indexes"]
    assert len(entry["points"]) == 2
    assert entry["train_s"] >= 0 and entry["add_s"] > 0
