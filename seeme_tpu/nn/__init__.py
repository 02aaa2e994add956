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
from .gcn import ModulatedGCN, ModulatedGraphConv, smpl_adjacency
from .pointnet import ResnetBlockFC, ResnetPointnet
from .resnet import ResNet, resnet50
from .gru import BiGru, GruCell, MotionEncoderBiGRUCo, MovementConvEncoder, TextEncoderBiGRUCo
