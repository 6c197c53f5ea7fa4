"""craytpu — a TPU-native differentiable Monte Carlo path tracer.

A from-scratch JAX/XLA/Pallas framework with the capabilities of the
c-ray CPU renderer (reference: /root/reference, VKoskiv/c-ray v0.6.3):
JSON scenes, OBJ/MTL meshes, two-level SAH BVH, a node-based material
system, QMC/PRNG samplers with bit-parity PCG32 streams, HDR environment
lighting, PNG/BMP output, and multi-chip rendering via jax.sharding —
plus end-to-end differentiability, which the reference does not have.

Layout (maps to the reference's layer map, SURVEY.md §1):
  craytpu.api       — public API (the `crXxx` functions, c-ray.h)
  craytpu.main      — command-line entry (main.c), craytpu.args flags
  craytpu.models    — integrators: wavefront path tracer (renderer/pathtrace.c)
  craytpu.ops       — device kernels: sampler, camera, intersect, traverse,
                      texture fetch, shading (renderer/samplers, accelerators,
                      datatypes/poly+sphere, nodes/*)
  craytpu.scene     — host-side scene pipeline: JSON/OBJ/MTL/texture loaders,
                      transforms, material graph compiler (utils/loaders, nodes)
  craytpu.accel     — BVH build + flattening (accelerators/bvh.c build half)
  craytpu.parallel  — device meshes + sharded train/render (shard.py),
                      TCP master/worker cluster (cluster.py)
  craytpu.runtime   — tile scheduler, checkpoint/resume
  craytpu.native    — C++ fast paths (SAH BVH builder) via ctypes
  craytpu.io        — PNG/BMP encoders, HDR decode (utils/encoders, stb/lodepng)
  craytpu.utils     — logging, timers, prefs/args (utils/)
"""

from craytpu.version import __version__

# Configure the JAX runtime (compile cache, CRAYTPU_PLATFORM pin) before any
# module creates a device array, so platform selection actually applies.
from craytpu.utils.jaxsetup import setup_jax as _setup_jax

_setup_jax()

__all__ = ["__version__"]
