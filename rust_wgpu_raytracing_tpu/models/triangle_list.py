"""Triangle-mesh model (reference src/models/triangle_list/).

The reference TriangleList owns a loaded Model, its storage buffers and
an 8-entry bind-group layout (triangle_list.rs:79-226); here it owns a
MeshConfig and builds/borrows the shared SoA soup. The hot path is the
Pallas G-buffer kernel (ops/megakernel.py).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional

import jax.numpy as jnp

from ..config import MeshConfig, SceneConfig, RenderConfig
from ..core.scene import Scene, SceneData


@dataclass
class TriangleList:
    config: MeshConfig
    _scene: Optional[Scene] = field(default=None, repr=False)

    @staticmethod
    def new(obj_path: str, **kw) -> "TriangleList":
        """Mirrors TriangleList::new(device, model)
        (triangle_list.rs:79)."""
        return TriangleList(MeshConfig(obj_path=obj_path, **kw))

    @property
    def scene(self) -> Scene:
        if self._scene is None:
            self._scene = Scene.build(
                SceneConfig(meshes=(self.config,),
                            render=RenderConfig(width=8, height=8)))
        return self._scene

    @property
    def data(self) -> SceneData:
        return self.scene.data

    def intersect(self, origin, dx, dy, dz, interpret: bool = False):
        """Closest-hit G-buffer over the mesh (the reference's per-pixel
        brute-force loop, triangle_list/compute.wgsl:186-202)."""
        from ..ops.megakernel import gbuffer_pallas

        return gbuffer_pallas(self.data, jnp.asarray(origin, jnp.float32),
                              dx, dy, dz, interpret=interpret)

    def num_faces(self) -> int:
        return self.data.num_faces
