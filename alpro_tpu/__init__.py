"""alpro_tpu — a TPU-native video-language pre-training / finetuning framework.

Rebuilt from scratch in JAX/XLA/Pallas with the capabilities of salesforce/ALPRO
(reference layout documented in SURVEY.md). The compute path is jit/pjit-compiled
JAX with Pallas kernels for the hot attentions; the host runtime (video decode,
preprocessing) is native C++ (see alpro_tpu/media).
"""

__version__ = "0.1.0"

import os as _os

if _os.environ.get("ALPRO_PLATFORM"):
    # Some environments pin JAX_PLATFORMS via a site hook before user code
    # runs; jax.config still honours an update made before backend init.
    import jax as _jax

    _jax.config.update("jax_platforms", _os.environ["ALPRO_PLATFORM"])
