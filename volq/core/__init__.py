from volq.core.types import Camera, Light, Particles, SceneState
from volq.core.camera import make_camera, pixel_rays, view_z
from volq.core.aabb import ray_aabb
from volq.core.interp import sample_bank_trilinear, trilinear_weights

__all__ = [
    "Camera", "Light", "Particles", "SceneState",
    "make_camera", "pixel_rays", "view_z",
    "ray_aabb", "sample_bank_trilinear", "trilinear_weights",
]
