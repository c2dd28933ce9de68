"""TPU-native VITS: conditional VAE + normalizing flows + HiFiGAN.

Functional implementation over plain parameter pytrees (nested dicts /
lists of jnp arrays). Layout is NWC throughout; see ops/nn.py.
"""

from .model import (  # noqa: F401
    infer,
    init_synthesizer_params,
    synthesizer_decode,
    synthesizer_encode,
)
