from volq.render.binning import bin_particles, PairList
from volq.render.xla_render import render, composite_pairs

__all__ = ["bin_particles", "PairList", "render", "composite_pairs"]
