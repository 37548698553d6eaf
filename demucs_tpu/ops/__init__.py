"""Functional NN ops (TPU-first re-design of reference src/conv.hpp,
src/layers.{hpp,cpp}, src/lstm.{hpp,cpp}).

Everything here is a pure function over explicit weight arrays, batched
over a leading dimension, jit/vmap/shard_map-friendly. Convs lower to
XLA's native convolutions (MXU) instead of the reference's im2col+GEMM
loops; attention is one batched einsum instead of per-head GEMMs.
"""

from .conv import (  # noqa: F401
    conv1d,
    conv2d,
    conv_transpose1d,
    conv_transpose1d_blocked,
    conv_transpose2d,
    freq_conv1x1_fmajor,
    freq_conv3x3_fmajor,
    freq_conv_fmajor,
    freq_convtr_fmajor,
)
from .norms import (  # noqa: F401
    gelu,
    glu,
    group_norm,
    group_norm_fmajor,
    layer_norm,
    layer_scale,
)
from .attention import multihead_attention, transformer_layer  # noqa: F401
from .embeddings import create_sin_embedding, create_2d_sin_embedding  # noqa: F401
from .lstm import bilstm  # noqa: F401
from .local_attention import local_attention, decay_kernel  # noqa: F401
