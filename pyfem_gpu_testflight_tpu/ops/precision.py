"""Precision-pinned einsum for all FEM contractions.

TPU matmul units default to bf16 inputs for float32 einsums.  FEM
geometry/stiffness contractions cancel near-equal coordinates (element
sizes are ~1e-3 of the coordinate magnitude at 1M dof), and bf16's 8-bit
mantissa turns Jacobian determinants into zeros/garbage.  Every einsum
in the framework therefore requests ``Precision.HIGHEST`` (true f32
accumulation; bandwidth-bound kernels lose nothing).
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax

__all__ = ["einsum"]


def einsum(*args, **kwargs):
    kwargs.setdefault("precision", lax.Precision.HIGHEST)
    return jnp.einsum(*args, **kwargs)
