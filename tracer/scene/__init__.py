from tracer.scene.builder import (
    Material, Light, Sphere, Square, MeshObject, SceneBuilder,
    DIFFUSE, GLASS, MIRROR, TEX_NONE, TEX_CHECKERBOARD, TEX_IMAGE,
)
from tracer.scene.device import DeviceScene, compile_scene

__all__ = [
    "Material", "Light", "Sphere", "Square", "MeshObject", "SceneBuilder",
    "DeviceScene", "compile_scene",
    "DIFFUSE", "GLASS", "MIRROR", "TEX_NONE", "TEX_CHECKERBOARD", "TEX_IMAGE",
]
