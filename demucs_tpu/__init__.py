"""demucs_tpu — a TPU-native music source separation framework.

A from-scratch JAX/XLA/Pallas re-design with the capabilities of
sevagh/demucs.cpp (reference mounted read-only at /root/reference):

  * Demucs v4 "Hybrid Transformer" (htdemucs, htdemucs_6s, htdemucs_ft)
    and Demucs v3 "Hybrid" (hdemucs_mmi) inference.
  * ggml weight-file loading (same binary format as the reference,
    cf. reference scripts/convert-pth-to-ggml.py:110-140).
  * Full-track segmented overlap-add inference, re-designed as
    *batched* segment inference on TPU (the reference's sequential
    per-segment loop, src/model_apply.cpp:189, becomes a leading batch
    dimension).
  * Multi-chip scaling via jax.sharding meshes (data-parallel segment
    batching, tensor-parallel transformer, BagOfModels groups).

Layout conventions (throughout the package):
  * time-branch activations:  (B, C, T)
  * freq-branch activations:  (B, C, F, T)
  * complex spectrograms:     (B, C, F, T) complex64
"""

__version__ = "0.1.0"

from . import dsp  # noqa: F401
