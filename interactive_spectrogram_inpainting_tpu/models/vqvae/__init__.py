from .bottleneck import QuantizedBottleneck, UnquantizedBottleneck
from .encoder_decoder import Encoder, Decoder, ResBlock
from .vqvae import VQVAE, VQVAEConfig

__all__ = [
    "QuantizedBottleneck",
    "UnquantizedBottleneck",
    "Encoder",
    "Decoder",
    "ResBlock",
    "VQVAE",
    "VQVAEConfig",
]
