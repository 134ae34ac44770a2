"""unified_audio_tpu: a TPU-native (JAX/XLA/Pallas) unified audio framework.

Capability-parity rebuild of alibaba/unified-audio (QuarkAudio): H-Codec neural
audio codecs (1.0 / 1.5-adaptive / 2.0-48kHz), BiCodec, the UniSE AR-LM speech
enhancement stack (SE / TSE / SS), and the UniTok multitask audio-generation
architecture — redesigned for TPU (SPMD sharding, lax.scan decode loops, Pallas
kernels for VQ search) rather than ported.
"""

__version__ = "0.1.0"
