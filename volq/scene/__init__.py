from volq.scene.config import (
    SceneConfig, VolumeConfig, EmitterConfig, ForcesConfig, CameraConfig,
    LightConfig, RenderConfig, PRESETS, c1, c2, c3, c4, c5, to_json,
    from_json,
)
from volq.scene.state import (
    init_scene, build_camera, build_light, bake_volumes,
)

__all__ = [
    "SceneConfig", "VolumeConfig", "EmitterConfig", "ForcesConfig",
    "CameraConfig", "LightConfig", "RenderConfig", "PRESETS",
    "c1", "c2", "c3", "c4", "c5", "to_json", "from_json",
    "init_scene", "build_camera", "build_light", "bake_volumes",
]
