"""Camera ray generation (pinhole + thin-lens DoF) with tent-filter jitter.

Mirrors datatypes/camera.c:22-87. The camera is fixed at scene compile time,
so `make_camera_ray_fn` bakes all host scalars (FOV-derived sensor size,
aperture, composite transform) into the traced function as constants; the
DoF branch is resolved statically like the C `if (cam->aperture > 0.0f)`.

Dimension consumption order per ray (parity-critical):
  jitterX, jitterY, then (aperture > 0 only) disc r, disc theta.
"""

from __future__ import annotations

import math

import jax.numpy as jnp

from craytpu.ops import sampler as smp
from craytpu.ops import vecmath as vm

f32 = jnp.float32


class CameraHost:
    """Host-side camera (struct camera, camera.c:22-42)."""

    def __init__(self, width: int, height: int, fov: float,
                 focal_distance: float, fstops: float, composite_A):
        import numpy as np
        self.width = int(width)
        self.height = int(height)
        self.fov = float(fov)
        self.focal_distance = float(focal_distance)
        self.fstops = float(fstops)
        self.A = np.asarray(composite_A, np.float32)
        self.aspect = np.float32(width) / np.float32(height)
        fov_rad = np.float32(np.float32(fov) * np.float32(np.pi)) / np.float32(180.0)
        self.sensor_x = np.float32(2.0) * np.float32(np.tan(fov_rad / np.float32(2.0)))
        self.sensor_y = np.float32(self.sensor_x / self.aspect)
        # 35mm-sensor focal length quirk kept for config compatibility
        # (camera.c:34-39)
        sensor_width_35mm = np.float32(0.036)
        self.focal_length = np.float32(0.5) * sensor_width_35mm / np.float32(
            np.float32(0.5) * fov_rad)
        self.aperture = (np.float32(0.5) * (self.focal_length / np.float32(fstops))
                         if fstops != 0.0 else np.float32(0.0))
        # updateCam with lookAt=(0,0,1), worldUp=(0,1,0) (camera.c:16-20,:33)
        self.forward = np.array([0.0, 0.0, 1.0], np.float32)
        self.right = np.array([1.0, 0.0, 0.0], np.float32)
        self.up = np.array([0.0, 1.0, 0.0], np.float32)


def make_camera_ray_fn(cam: CameraHost, kind: str):
    """Returns get_ray(x, y, sampler_state) -> (start, direction, state).

    x, y are pixel integer coordinates (scalar int32/float32 traced values);
    the function is scalar-ray style for vmap.
    """
    forward = jnp.asarray(cam.forward)
    right = jnp.asarray(cam.right)
    up = jnp.asarray(cam.up)
    pix_x = right * f32(cam.sensor_x / cam.width)
    pix_y = up * f32(cam.sensor_y / cam.height)
    half_w = f32(cam.width * 0.5)
    half_h = f32(cam.height * 0.5)
    A = jnp.asarray(cam.A)
    aperture = float(cam.aperture)
    focal_distance = f32(cam.focal_distance)

    def get_ray(x, y, s: smp.SamplerState):
        d1, s = smp.get_dimension(kind, s)
        d2, s = smp.get_dimension(kind, s)
        jx = vm.triangle_distribution(d1)
        jy = vm.triangle_distribution(d2)
        px = jnp.asarray(x, f32) - half_w + jx + f32(0.5)
        py = jnp.asarray(y, f32) - half_h + jy + f32(0.5)
        # reference-binary rounding: pixV = forward + fma(pixX, px,
        # pixY*py) per component (getCameraRay disassembly)
        pix_v = forward + vm.fma_raw(pix_x, px, pix_y * py)
        direction = vm.vnormalize(pix_v)
        start = jnp.zeros(3, f32)

        if aperture > 0.0:  # static branch, camera.c:77-83
            ft = vm.exact_div(focal_distance, vm.vdot(direction, forward))
            focus_point = start + direction * ft
            lx, ly, s = vm.random_coord_on_unit_disc(kind, s)
            lens = right * (f32(aperture) * lx) + up * (f32(aperture) * ly)
            start = start + lens
            direction = vm.vnormalize(focus_point - start)

        # To world space (camera.c:85): transformRay by composite.A.
        # Explicit chains, not @: backend-bit-stable (vm.mat34_point)
        w_start = vm.mat34_point(A[:3, :4], start)
        w_dir = vm.mat33_vec(A[:3, :4], direction)
        return w_start, w_dir, s

    return get_ray
