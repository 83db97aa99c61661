from .layers import (
    SGA,
    FFN,
    MLP,
    AttentionConfig,
    AttentionPooler,
    ChannelProjection,
    MultiHeadAttention,
    SGAStack,
    dot_product_attention,
    log_softmax_nll,
)

__all__ = [
    "AttentionConfig",
    "MultiHeadAttention",
    "MLP",
    "FFN",
    "SGA",
    "SGAStack",
    "AttentionPooler",
    "ChannelProjection",
    "dot_product_attention",
    "log_softmax_nll",
]
