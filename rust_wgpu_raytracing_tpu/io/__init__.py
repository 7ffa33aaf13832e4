from .obj import ObjMesh, ObjMaterial, load_obj
from .textures import TextureData, load_texture_file
from .image_out import write_png, write_ppm, framebuffer_to_image
from .checkpoint import save_checkpoint, load_checkpoint

__all__ = ["ObjMesh", "ObjMaterial", "load_obj", "TextureData",
           "load_texture_file", "write_png", "write_ppm",
           "framebuffer_to_image", "save_checkpoint", "load_checkpoint"]
