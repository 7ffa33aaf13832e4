"""Per-primitive model layer — the structural analogue of the reference's
`src/models/` (mod.rs exports sphere, triangle, triangle_list).

Where the reference's model classes own GPU pipelines and bind-group
layouts (sphere.rs:18-133, triangle_list.rs:79-250), these own scene
fragments + per-primitive pass functions over the shared planar frame
state. The `Triangle` single-primitive model mirrors the reference's
dead-code `triangle` module (SURVEY §2.2) for API completeness.
"""

from .sphere import Sphere
from .triangle import Triangle
from .triangle_list import TriangleList

__all__ = ["Sphere", "Triangle", "TriangleList"]
