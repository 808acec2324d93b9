"""TPU-native GPS L1 C/A software-defined receiver framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
iliasam/STM32F4_SDR_GPS (see SURVEY.md): FFT-parallel acquisition,
batched multi-channel DLL/PLL/FLL tracking via ``lax.scan``, nav-message
decode, and least-squares PVT, scaled over TPU device meshes.
"""

__version__ = "0.1.0"

from . import config  # noqa: F401
