"""sph_pie_tpu — a TPU-native smoothed-particle-hydrodynamics framework.

Brand-new JAX/XLA/Pallas implementation scoped by SURVEY.md (the structural
map of the reference platform sphereisaiahmin-dev/sph-pie) and BASELINE.json
(the performance contract: fused jit WCSPH/PBF steps over SoA particle
arrays, counting-sort cell lists, on-device splat rendering, ppermute halo
exchange for multi-chip domain decomposition).
"""

__version__ = "0.1.0"
