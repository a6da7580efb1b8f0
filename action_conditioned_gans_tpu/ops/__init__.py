"""Layer ops: the rebuild of the reference's ``ops.py`` (SURVEY.md §3 row 3).

The reference wraps TF1 ``conv2d`` / ``deconv2d`` / ``lrelu`` / ``linear`` /
``batch_norm``; here each op is a pure function over explicit parameters
with two interchangeable backends:

* ``"xla"`` — ``lax.conv_general_dilated`` et al. Always available; the
  correctness oracle for parity tests (SURVEY.md §5.1).
* ``"pallas"`` — fused Pallas TPU kernels (norm+activation fusion, MXU conv)
  in ``ops.pallas``, dropped in behind the same signatures.

All image tensors are NHWC (TPU-native layout); conv kernels are HWIO.
"""

from action_conditioned_gans_tpu.ops.api import (
    conv2d,
    conv2d_transpose,
    conv_norm_act,
    dense,
    leaky_relu,
    norm_act,
    set_default_backend,
    get_default_backend,
)

__all__ = [
    "conv2d",
    "conv2d_transpose",
    "conv_norm_act",
    "dense",
    "leaky_relu",
    "norm_act",
    "set_default_backend",
    "get_default_backend",
]
