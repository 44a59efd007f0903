from sph_pie_tpu.kernels import eos, smoothing
