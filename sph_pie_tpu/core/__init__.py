from sph_pie_tpu.core.params import FluidParams, make_params
from sph_pie_tpu.core.state import ParticleState, allocate, from_positions
