"""Index introspection (analogue of contrib/inspect_tools.py)."""

from __future__ import annotations

import numpy as np


def get_invlist(index_ivf, list_no: int):
    """ids and codes of one inverted list (contrib/inspect_tools.py)."""
    mask = index_ivf._listnos_host == list_no
    return index_ivf._ids_host[mask], index_ivf._codes_host[mask]


def get_invlist_sizes(index_ivf) -> np.ndarray:
    return np.bincount(
        index_ivf._listnos_host, minlength=index_ivf.nlist
    ).astype(np.int64)


def get_flat_data(index_flat) -> np.ndarray:
    return index_flat.vectors()


def get_pq_centroids(pq) -> np.ndarray:
    return np.array(pq.centroids)


def get_LinearTransform_matrix(vt):
    return vt.A, vt.b


def print_object_fields(obj) -> None:
    for name, val in vars(obj).items():
        if isinstance(val, np.ndarray):
            print(f"{name}: array {val.shape} {val.dtype}")
        else:
            print(f"{name}: {val!r}")
