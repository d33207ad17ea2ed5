from .codemaps import (CodemapsHelper, SimpleCodemapsHelper,
                       ZigZagCodemapsHelper)
from .masks import (SequenceMask, BernoulliSequenceMask,
                    UniformProbabilityBernoulliSequenceMask,
                    UniformMaskedAmountSequenceMask,
                    ContiguousZonesSequenceMask)
from .transformer import (VQNSynthTransformer, TransformerConfig,
                          SelfAttentiveVQTransformer,
                          UpsamplingVQTransformer)

__all__ = [
    "CodemapsHelper",
    "SimpleCodemapsHelper",
    "ZigZagCodemapsHelper",
    "SequenceMask",
    "BernoulliSequenceMask",
    "UniformProbabilityBernoulliSequenceMask",
    "UniformMaskedAmountSequenceMask",
    "ContiguousZonesSequenceMask",
    "VQNSynthTransformer",
    "TransformerConfig",
    "SelfAttentiveVQTransformer",
    "UpsamplingVQTransformer",
]
