"""Test configuration: run JAX on CPU with 8 virtual devices.

Multi-chip logic (mesh sharding, allgather merges) is validated on a virtual
8-device CPU mesh — the analogue of the reference testing multi-GPU on
"however many devices exist" (gpu/test/test_multi_gpu.py), but without
hardware (SURVEY.md §4).
"""

import os

# Raise the stack rlimit BEFORE jax spawns its compile thread pools:
# pthread stacks inherit the soft limit at creation, and the one-process
# full-suite run segfaults deterministically inside XLA:CPU compile of a
# large interpret-mode Pallas program (~250 tests deep) — the signature
# of a compiler-thread stack overflow, not of OOM (115 GB free).
try:
    import resource

    _soft, _hard = resource.getrlimit(resource.RLIMIT_STACK)
    if _soft != resource.RLIM_INFINITY and (
        _hard == resource.RLIM_INFINITY or _hard > _soft
    ):
        resource.setrlimit(resource.RLIMIT_STACK, (_hard, _hard))
except Exception:
    pass

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("JAX_TRACEBACK_FILTERING", "off")

# The environment's sitecustomize force-registers the TPU backend and sets
# jax_platforms="axon,cpu"; override it back to CPU before any backend
# initialization so tests run on the 8-device virtual CPU mesh.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
