from . import camera, scene  # noqa: F401
from .camera import Camera, make_camera  # noqa: F401
from .scene import Scene, huge_scene, simple_scene_cpu, simple_scene_cuda  # noqa: F401
