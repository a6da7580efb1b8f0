"""Fused Pallas TPU kernels (SURVEY.md §8 stage 7).

The reference has no native kernels of its own (pure TF1 Python, SURVEY.md
§3); the rebuild's native layer is here: Mosaic/Pallas kernels for the hot
ops, fusing what XLA does not —

* ``group_norm_act``  — GroupNorm + activation in one VMEM-resident pass
  (bandwidth-bound: one HBM read + one write instead of several).
* ``conv_norm_act``   — the whole conv -> GroupNorm -> activation block in a
  single kernel per sample: im2col patches feed the MXU, the epilogue
  normalizes and activates before anything returns to HBM.

Every kernel carries a ``*_supported`` predicate (static shape check against
the VMEM budget) and the plain-XLA path remains the permanent fallback and
numerical oracle (parity ≤ 1e-3, tests/test_pallas.py).

Backward passes are provided via ``jax.custom_vjp`` with the XLA composite
as the gradient implementation: mathematically identical, and keeps the
fused forward on the training path without hand-writing transposed kernels.
On non-TPU backends the kernels run in interpreter mode (tests).
"""

from action_conditioned_gans_tpu.ops.pallas.norm_act import (
    group_norm_act,
    group_norm_act_supported,
)
from action_conditioned_gans_tpu.ops.pallas.conv import (
    conv2d,
    conv2d_transpose,
    conv_norm_act,
    conv_norm_act_supported,
    conv_transpose_norm_act,
    conv_transpose_norm_act_supported,
)

__all__ = [
    "group_norm_act",
    "group_norm_act_supported",
    "conv2d",
    "conv2d_transpose",
    "conv_norm_act",
    "conv_norm_act_supported",
    "conv_transpose_norm_act",
    "conv_transpose_norm_act_supported",
]
