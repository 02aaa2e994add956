from .embeddings import (
    LearnedPositionalEncoding,
    SinusoidalPositionalEncoding,
    TimestepEmbedding,
    build_position_encoding,
    sinusoidal_timestep_embedding,
)
from .stylization import (
    LinearTemporalCrossAttention,
    MdTransformerLayer,
    StylizationBlock,
    StylizedFFN,
)
from .transformer import (
    MultiHeadAttention,
    SkipTransformerDecoder,
    SkipTransformerEncoder,
    TransformerDecoderLayer,
    TransformerEncoderLayer,
)
