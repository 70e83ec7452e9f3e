"""Pallas TPU kernels — the framework's native compute layer.

The reference has no native code at all (SURVEY.md §2.2: pure Python over
Keras' prebuilt kernels), so the "native layer" of this rebuild is
hand-written Pallas TPU kernels for the hot path: the fused whole-network
emulator forward pass (:mod:`tpu21cmvae.ops.pallas.fused_mlp`). Every
kernel is gated behind an XLA reference implementation with parity tests;
on non-TPU backends the kernels run in interpreter mode.
"""

from tpu21cmvae.ops.pallas.fused_mlp import (  # noqa: F401
    fold_emulator_constants,
    make_fused_emulate,
    make_fused_mlp,
)
from tpu21cmvae.ops.pallas.fused_loglik import (  # noqa: F401
    fold_loglik_constants,
    gram_fold,
    make_fused_loglik,
    make_fused_loglik_gram,
)
