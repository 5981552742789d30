"""pyfem_gpu_testflight_tpu — a TPU-native finite-element framework.

A ground-up JAX/XLA/Pallas re-design of the capabilities of
``aaronyicongfu/pyfem_gpu_testflight`` (a vectorized NumPy FEM prototype):
five element types, five physics models, batched element assembly via
``segment_sum`` over static sparsity patterns, matrix-free
Jacobi-preconditioned Krylov solvers, Newton, adjoint design
sensitivities, Helmholtz-filtered RAMP topology optimization with an MMA
optimizer, structured/Abaqus mesh pipelines and VTK export — all
expressed as jit-compiled, shardable array programs.

float64 support is enabled at import (required for the verification
tolerances); benchmark paths pass explicit float32/bfloat16 dtypes.
"""

import jax as _jax

_jax.config.update("jax_enable_x64", True)

from . import assembly, bcs, elements, mesh, solvers  # noqa: E402
from .elements import ElementType, get_element  # noqa: E402
from .mesh import ProblemCreator, structured_mesh, fix_orientation  # noqa: E402
from .bcs import DirichletBC  # noqa: E402
from .models import (  # noqa: E402
    FEModel,
    Helmholtz,
    LinearElasticity,
    LinearPoisson,
    NonlinearPoisson,
)
from .assembler import Assembler  # noqa: E402
from .utils.profile import (  # noqa: E402
    time_this,
    timer_off,
    timer_on,
    timer_set_threshold,
    timer_to_stdout,
)
from .io.vtk import to_vtk  # noqa: E402
from .io.inp import InpParser  # noqa: E402

__version__ = "0.1.0"

__all__ = [
    "fix_orientation",
    "Assembler",
    "DirichletBC",
    "ElementType",
    "FEModel",
    "Helmholtz",
    "InpParser",
    "LinearElasticity",
    "LinearPoisson",
    "NonlinearPoisson",
    "ProblemCreator",
    "assembly",
    "bcs",
    "elements",
    "get_element",
    "mesh",
    "solvers",
    "structured_mesh",
    "time_this",
    "timer_off",
    "timer_on",
    "timer_set_threshold",
    "timer_to_stdout",
    "to_vtk",
]
