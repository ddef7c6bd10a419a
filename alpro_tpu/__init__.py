"""alpro_tpu — a TPU-native video-language pre-training / finetuning framework.

Rebuilt from scratch in JAX/XLA/Pallas with the capabilities of salesforce/ALPRO
(reference layout documented in SURVEY.md). The compute path is jit/pjit-compiled
JAX with Pallas kernels for the hot attentions; the host runtime (video decode,
preprocessing) is native C++ (see alpro_tpu/media).
"""

__version__ = "0.1.0"
