"""Graph IR, PENMAN reader, dependency reader, shortest-path relations."""

import pytest

from gtos_tpu.graph import (
    AMRParseError, Graph, dependency_graph, parse_amr, relation_paths,
    RelationPathConfig,
)
from gtos_tpu.graph.paths import NONE_LABEL, SELF_LABEL


def test_parse_simple_amr():
    g = parse_amr("(w / want-01 :ARG0 (b / boy) :ARG1 (g / go-01 :ARG0 b))")
    assert g.nodes == ["want-01", "boy", "go-01"]
    assert (0, "ARG0", 1) in g.edges
    assert (0, "ARG1", 2) in g.edges
    assert (2, "ARG0", 1) in g.edges  # re-entrancy to b


def test_parse_constants_and_strings():
    g = parse_amr('(d / date-entity :year 2020 :name (n / name :op1 "Rome") :polarity -)')
    assert "2020" in g.nodes
    assert "Rome" in g.nodes
    assert "-" in g.nodes
    assert g.num_edges == 4


def test_parse_forward_reference():
    g = parse_amr("(a / and :op1 (s / see-01 :ARG0 p) :op2 (p / person))")
    assert g.nodes == ["and", "see-01", "person"]
    assert (1, "ARG0", 2) in g.edges


def test_parse_errors():
    with pytest.raises(AMRParseError):
        parse_amr("(w / want-01")  # unbalanced
    with pytest.raises(AMRParseError):
        parse_amr("(w / want-01) trailing")


def test_dependency_graph():
    g = dependency_graph(
        ["the", "dog", "barks"], [2, 3, 0], ["det", "nsubj", "root"]
    )
    assert g.nodes == ["the", "dog", "barks"]
    assert (1, "det", 0) in g.edges
    assert (2, "nsubj", 1) in g.edges
    assert g.num_edges == 2  # root emits no edge


def test_relation_paths_basic():
    # 0 -ARG0-> 1, 0 -ARG1-> 2
    g = Graph(nodes=["a", "b", "c"], edges=[(0, "ARG0", 1), (0, "ARG1", 2)])
    paths = relation_paths(g)
    assert paths[0][0] == (SELF_LABEL,)
    assert paths[0][1] == ("ARG0",)
    assert paths[1][0] == ("ARG0_r",)         # reverse arc, direction-marked
    assert paths[1][2] == ("ARG0_r", "ARG1")  # b -> a -> c
    assert paths[2][1] == ("ARG1_r", "ARG0")


def test_relation_paths_disconnected_and_cap():
    g = Graph(nodes=["a", "b"], edges=[])
    paths = relation_paths(g)
    assert paths[0][1] == (NONE_LABEL,)

    # chain of length 5 with cap 2: truncated prefix
    chain = Graph(
        nodes=list("abcdef"),
        edges=[(i, f"L{i}", i + 1) for i in range(5)],
    )
    paths = relation_paths(chain, RelationPathConfig(max_path_len=2))
    assert paths[0][5] == ("L0", "L1")


def test_relation_paths_shortest():
    # two routes 0->3: direct edge vs 2-hop; BFS must take the direct one
    g = Graph(
        nodes=["a", "b", "c", "d"],
        edges=[(0, "X", 3), (0, "A", 1), (1, "B", 2), (2, "C", 3)],
    )
    paths = relation_paths(g)
    assert paths[0][3] == ("X",)
