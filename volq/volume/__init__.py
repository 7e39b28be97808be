from volq.volume.noise import perlin3, perlin4, fbm3, fbm4
from volq.volume.bake import bake_bank, bake_bank_4d

__all__ = ["perlin3", "perlin4", "fbm3", "fbm4", "bake_bank", "bake_bank_4d"]
