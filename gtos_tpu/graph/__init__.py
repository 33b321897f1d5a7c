from gtos_tpu.graph.ir import Graph
from gtos_tpu.graph.amr import parse_amr, AMRParseError
from gtos_tpu.graph.dependency import dependency_graph
from gtos_tpu.graph.paths import relation_paths, RelationPathConfig

__all__ = [
    "Graph",
    "parse_amr",
    "AMRParseError",
    "dependency_graph",
    "relation_paths",
    "RelationPathConfig",
]
