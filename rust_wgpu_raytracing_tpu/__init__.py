"""rust_wgpu_raytracing_tpu — a TPU-native real-time ray-tracing framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the reference
wgpu ray tracer (clejacquet/rust-wgpu-raytracing): per-pixel compute-shader
ray tracing of analytic spheres + OBJ triangle meshes with Blinn-Phong
shading, manual depth-test compositing across passes, an orbiting camera,
and native/web presentation shells.

Architecture (TPU-first, NOT a port):

- the reference's per-frame pass choreography (clear copies, depth-texture
  handoffs, sequential compute dispatches — reference src/lib.rs:1012-1230)
  becomes ONE jitted, purely functional frame function in which framebuffer
  and depth are SSA `jnp` array values;
- the reference's WGSL per-pixel kernels (src/models/*/compute.wgsl) become
  Pallas kernels tiled over the image plane, with the brute-force
  ray-triangle loop reformulated as MXU matmuls over precomputed per-face
  edge planes (see ops/megakernel.py);
- the Rust host runtime (winit event loop, wgpu resource management —
  src/lib.rs) becomes a thin host layer: scene import to flat SoA arrays,
  device-resident scene cache, frame scheduler, HTTP/MJPEG presentation;
- scaling past one chip uses `jax.sharding.Mesh` + shard_map over image
  tiles / sample batches with XLA collectives (parallel/).

Public API is re-exported here.
"""

from .config import (
    CameraConfig,
    LightConfig,
    RenderConfig,
    SceneConfig,
    SphereConfig,
    MeshConfig,
)
from .core.camera import Camera, CameraUniforms
from .core.controls import CircleCameraController, OrbitAnimator
from .core.scene import Scene, SceneData
from .runtime.renderer import Renderer

__version__ = "0.1.0"

__all__ = [
    "Camera",
    "CameraUniforms",
    "CameraConfig",
    "CircleCameraController",
    "LightConfig",
    "MeshConfig",
    "OrbitAnimator",
    "RenderConfig",
    "Renderer",
    "Scene",
    "SceneData",
    "SceneConfig",
    "SphereConfig",
]
