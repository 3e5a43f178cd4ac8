"""raytracinginoneweekend_tpu: a TPU-native differentiable path tracer.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
Alabuta/RaytracingInOneWeekend (C++20 + CUDA/Thrust): the full Ray Tracing
in One Weekend pipeline -- thin-lens camera, brute-force ray/sphere
intersection, lambert/metal/dielectric scatter, iterative bounce integrator,
gamma + PPM/PNG output -- rebuilt as a wavefront renderer over SoA ray
state, differentiable end-to-end, and sharded across TPU meshes.

Public API surface (the "everything a reference user needs" set):
  Scenes/cameras:  models.scene.{Scene, simple_scene_cuda, simple_scene_cpu,
                   huge_scene}, models.camera.{Camera, make_camera, ...}
  Rendering:       render.render / render.render_pixels, config.RenderConfig
  Compat options:  config.{TraceOptions, DEFAULT, REFERENCE_CUDA,
                   REFERENCE_CPU}
  Postprocess/IO:  ops.postprocess.to_u8, io.image.{write_ppm, write_png}
  Differentiable:  ops.integrate.trace (reverse-mode safe), optim.*
  Parallel:        parallel.* (mesh sharding, distributed init)
"""

__version__ = "0.1.0"

from . import config  # noqa: F401
from .config import DEFAULT, REFERENCE_CPU, REFERENCE_CUDA  # noqa: F401
from .config import RenderConfig, TraceOptions  # noqa: F401
