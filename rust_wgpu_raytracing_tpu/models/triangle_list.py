"""Triangle-mesh model (reference src/models/triangle_list/).

The reference TriangleList owns a loaded Model, its storage buffers and
an 8-entry bind-group layout (triangle_list.rs:79-226); here it owns a
MeshConfig and builds/borrows the shared SoA soup. The hot path is the
Pallas G-buffer kernel (ops/megakernel.py).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import List, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from ..config import MeshConfig, SceneConfig, RenderConfig, resolve_asset
from ..core.scene import Scene, SceneData
from ..io.obj import ObjMaterial, ObjMesh


@dataclass
class TriangleList:
    config: MeshConfig
    _scene: Optional[Scene] = field(default=None, repr=False)

    @staticmethod
    def new(obj_path: str, **kw) -> "TriangleList":
        """Mirrors TriangleList::new(device, model)
        (triangle_list.rs:79)."""
        return TriangleList(MeshConfig(obj_path=obj_path, **kw))

    def load(self) -> Tuple[List[ObjMesh], List[ObjMaterial]]:
        """Resolve + load this config's asset — the analogue of
        resources::load_model feeding TriangleList::new
        (src/resources.rs:116-213, triangle_list.rs:79). Builtin
        procedural assets (cube / terrain stress mesh) keep tests and
        dryruns standalone; anything else goes through the OBJ loader
        (io/obj.py, native fast path included)."""
        path = self.config.obj_path
        if path == "builtin:cube":
            from ..io.obj import make_cube

            return [make_cube()], [ObjMaterial(
                name="builtin", ambient=(0.05,) * 3, diffuse=(0.8,) * 3,
                specular=(0.2,) * 3)]
        if path.startswith("builtin:terrain"):
            # "builtin:terrain" or "builtin:terrain:<grid_n>" — the
            # large-scene stress asset (512 -> 522k faces)
            from ..io.obj import make_terrain

            parts = path.split(":")
            grid_n = int(parts[2]) if len(parts) > 2 else 512
            return [make_terrain(grid_n)], [ObjMaterial(
                name="builtin", ambient=(0.05,) * 3, diffuse=(0.8,) * 3,
                specular=(0.2,) * 3)]
        from ..io.obj import load_obj

        return load_obj(resolve_asset(path))

    def world_positions(self, mesh: ObjMesh) -> np.ndarray:
        """Model transform (scale then translate) into world space — the
        instance-matrix analogue the reference bakes per TriangleList
        (triangle_list.rs:94-117)."""
        return (mesh.positions * np.float32(self.config.scale)
                + np.asarray(self.config.translation, np.float32))

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
