"""Native (C++) preprocessing runtime, bound via ctypes.

Build: `make -C gtos_tpu/native` or automatically on first import (g++ is
in the image; the .so is cached next to the source). Falls back cleanly —
importers catch ImportError and use the pure-Python path
(gtos_tpu/graph/paths.py), which stays the semantic reference.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import List, Tuple

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_DIR, "libgtos_native.so")
_SRC = os.path.join(_DIR, "paths.cpp")


def _build_if_needed():
    if (os.path.exists(_SO)
            and os.path.getmtime(_SO) >= os.path.getmtime(_SRC)):
        return
    cmd = ["g++", "-O3", "-march=native", "-std=c++17", "-shared", "-fPIC",
           _SRC, "-o", _SO]
    subprocess.run(cmd, check=True, capture_output=True)


try:
    _build_if_needed()
    _lib = ctypes.CDLL(_SO)
except (OSError, subprocess.CalledProcessError) as e:  # pragma: no cover
    raise ImportError(f"native library unavailable: {e}")

_lib.gtos_relation_paths.restype = ctypes.c_int32
_lib.gtos_relation_paths.argtypes = [
    ctypes.c_int32, ctypes.c_int32,
    ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
    ctypes.POINTER(ctypes.c_int32),
    ctypes.c_int32, ctypes.c_int32,
    ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
    ctypes.POINTER(ctypes.c_int32), ctypes.c_int32,
]


def _ptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))


def pack_relation_paths_native(graph, cfg=None):
    """PackedPaths via the C++ extractor — the fast production path.

    uniq[0] = (NONE_LABEL,); the diagonal points at a trailing SELF entry;
    identical expansion to gtos_tpu.graph.paths.relation_paths."""
    from gtos_tpu.graph.paths import (
        NONE_LABEL, PackedPaths, SELF_LABEL, RelationPathConfig)

    cfg = cfg or RelationPathConfig()
    n = graph.num_nodes
    if n == 0:
        return PackedPaths(uniq=[(NONE_LABEL,)],
                           pair_idx=np.zeros((0, 0), dtype=np.int32))
    m = graph.num_edges

    labels = []
    lab2id = {}
    lab_ids = np.empty(m, dtype=np.int32)
    src = np.empty(m, dtype=np.int32)
    dst = np.empty(m, dtype=np.int32)
    for e, (s, lbl, t) in enumerate(graph.edges):
        lid = lab2id.get(lbl)
        if lid is None:
            lid = lab2id[lbl] = len(labels)
            labels.append(lbl)
        src[e], dst[e], lab_ids[e] = s, t, lid
    L = len(labels)
    # id -> string incl. direction-marked reverse labels
    id2str = labels + [lbl + cfg.reverse_suffix for lbl in labels]

    cap = max(16, n * n + 1)
    pair_idx = np.empty(n * n, dtype=np.int32)
    paths = np.empty(cap * cfg.max_path_len, dtype=np.int32)
    lens = np.empty(cap, dtype=np.int32)
    n_paths = _lib.gtos_relation_paths(
        n, m, _ptr(src), _ptr(dst), _ptr(lab_ids), L, cfg.max_path_len,
        _ptr(pair_idx), _ptr(paths), _ptr(lens), cap)
    if n_paths < 0:  # pragma: no cover — cap is n*n+1, cannot overflow
        raise RuntimeError("native path extraction overflow")

    # materialize unique paths once; slot 0 becomes NONE, diagonal -> SELF
    # (.tolist() first: numpy scalar indexing in a tight loop is ~10x
    # slower than plain list indexing)
    paths_l = paths[: n_paths * cfg.max_path_len].tolist()
    lens_l = lens[:n_paths].tolist()
    uniq: List[Tuple[str, ...]] = [(NONE_LABEL,)]
    for p in range(1, n_paths):
        base = p * cfg.max_path_len
        uniq.append(tuple(id2str[i] for i in paths_l[base: base + lens_l[p]]))
    self_idx = len(uniq)
    uniq.append((SELF_LABEL,))

    pi = pair_idx.reshape(n, n).copy()
    np.fill_diagonal(pi, self_idx)
    from gtos_tpu.graph.paths import PackedPaths
    return PackedPaths(uniq=uniq, pair_idx=pi)


def relation_paths_native(graph, cfg=None) -> List[List[Tuple[str, ...]]]:
    """Drop-in replacement for gtos_tpu.graph.paths.relation_paths
    (nested-list contract; prefer pack_relation_paths_native in pipelines)."""
    return pack_relation_paths_native(graph, cfg).expand()
