"""roma_tpu — TPU-native dense feature matching (JAX/XLA/Pallas).

A ground-up rebuild of the capabilities of Parskatt/RoMa (CVPR 2024) designed
for TPUs: NHWC layouts, static-shape jitted match pipelines, MXU-friendly
correlation/GP matmuls, Pallas kernels for the windowed local correlation,
and jax.sharding data parallelism for training and benchmark sweeps.
"""
from .models.roma import RegressionMatcher
from .models.tiny import TinyRoMa
from .models.zoo import roma_indoor, roma_outdoor, tiny_roma_v1_outdoor
from .serving import MatchEngine

__all__ = [
    "MatchEngine",
    "RegressionMatcher",
    "TinyRoMa",
    "roma_indoor",
    "roma_outdoor",
    "tiny_roma_v1_outdoor",
]
