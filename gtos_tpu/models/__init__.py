from gtos_tpu.models.generator import Generator
from gtos_tpu.models.encoder import TokenEncoder, RelationEncoder, CharCNN
from gtos_tpu.models.graph_transformer import (
    GraphTransformer, GraphTransformerLayer, RelationMultiheadAttention,
)
from gtos_tpu.models.decoder import Decoder, DecoderLayer

__all__ = [
    "Generator", "TokenEncoder", "RelationEncoder", "CharCNN",
    "GraphTransformer", "GraphTransformerLayer", "RelationMultiheadAttention",
    "Decoder", "DecoderLayer",
]
