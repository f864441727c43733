"""jrl_lbm_tpu — a TPU-native (JAX/XLA/Pallas) lattice-Boltzmann framework.

Brand-new implementation of the capabilities of GeCao/JRL-LBM (a
PyTorch + CUDA D2Q9 solver for scanning-electrochemical-microscopy
approach curves): D2Q9 streaming with flag boundary conditions, BGK/MRT/
KBC collision, axisymmetric source terms, curved moving-obstacle
solid-fluid coupling, and a coupled advection-diffusion lattice —
redesigned around jit/fori_loop time stepping, shard_map domain
decomposition, and a fused Pallas collide-and-stream kernel.
"""

from jrl_lbm_tpu import lattice
from jrl_lbm_tpu.simulation import SimulationParameters, SimulationRunner

__version__ = "0.1.0"

__all__ = ["lattice", "SimulationParameters", "SimulationRunner", "__version__"]
