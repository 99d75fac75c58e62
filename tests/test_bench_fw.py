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


def test_optimizer_and_io_cache(tmp_path):
    """Optimizer two-stage flow + BenchmarkIO artifact cache (reference:
    bench_fw/optimize.py benchmark_and_filter_candidates,
    bench_fw/benchmark_io.py)."""
    from faiss_tpu.bench_fw import BenchmarkIO, Optimizer

    ds = DatasetDescriptor(d=16, nb=2000, nq=50, nt=1500)
    cands = [
        IndexDescriptor("IVF16,Flat", search_params={"nprobe": [1, 16]}),
        IndexDescriptor("IVF16,SQ8", search_params={"nprobe": [1, 16]}),
    ]
    io = BenchmarkIO(str(tmp_path))
    opt = Optimizer(k=5, min_accuracy=0.5, io=io, verbose=False)
    res = opt.optimize(ds, cands)
    # every pareto point clears the accuracy floor and is globally optimal
    assert res["pareto"]
    flat_pts = {
        (e["factory"], json.dumps(r["params"], sort_keys=True)): r
        for e in res["all"]["indexes"] for r in e["points"]
    }
    for w in res["pareto"]:
        row = flat_pts[(w["factory"], json.dumps(w["params"], sort_keys=True))]
        assert row["recall"] >= 0.5
    assert res["filtered_candidates"]
    # second run hits the index cache: train/add cost is skipped
    res2 = Benchmark(ds, cands, k=5, io=io).run()
    for entry in res2["indexes"]:
        assert entry["train_s"] == 0.0 and entry["add_s"] == 0.0


def test_run_benchmark_optimizer_config(tmp_path):
    cfg = {
        "dataset": {"d": 16, "nb": 1000, "nq": 30, "nt": 800},
        "indexes": [{"factory": "Flat", "search_params": {}}],
        "k": 5,
        "min_accuracy": 0.9,
        "basedir": str(tmp_path),
    }
    res = run_benchmark(cfg)
    assert res["pareto"] and res["pareto"][0]["factory"] == "Flat"
