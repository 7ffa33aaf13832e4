from .camera import Camera, CameraUniforms
from .controls import CircleCameraController, OrbitAnimator
from .scene import Scene, SceneData

__all__ = ["Camera", "CameraUniforms", "CircleCameraController", "OrbitAnimator",
           "Scene", "SceneData"]
