"""Pinhole camera model for the depth pipeline.

Replaces the reference's ad-hoc depth-to-point scaling (it hard-coded a
magic scale and TODO'd "should use camera intrinsics",
ref Main.hs:1307-1313) with a real intrinsics model.

Conventions: camera x right, y down, z forward; pixel (u, v) with u along
width; ``u = fx * x / z + cx``. Poses are 4x4 row-vector camera-to-world
transforms (``p_world = p_cam @ R + t``), matching the package transform
convention.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax.numpy as jnp

from housescan_tpu.config import CameraConfig


class Intrinsics(NamedTuple):
    """Static pinhole intrinsics (hashable, safe as a jit static arg)."""

    width: int
    height: int
    fx: float
    fy: float
    cx: float
    cy: float

    @staticmethod
    def from_config(cfg: CameraConfig) -> "Intrinsics":
        return Intrinsics(cfg.width, cfg.height, cfg.fx, cfg.fy, cfg.cx, cfg.cy)

    def level(self, lvl: int) -> "Intrinsics":
        """Intrinsics of pyramid level ``lvl`` (each level halves).

        POINT-SAMPLING convention: level pixel (i, j) sits exactly on fine
        pixel (2^l i, 2^l j), so cx scales as cx / 2^l. Both the depth
        pyramid (smooth-then-subsample) and the model-map pyramid
        ([::2, ::2]) use this convention; mixing it with the
        block-averaging convention (+0.5 centers) puts a coherent
        half-fine-pixel bias into coarse ICP levels, which integrates
        into slow pose drift.
        """
        f = 1 << lvl
        return Intrinsics(
            self.width // f,
            self.height // f,
            self.fx / f,
            self.fy / f,
            self.cx / f,
            self.cy / f,
        )


def pixel_rays(intr: Intrinsics, dtype=jnp.float32) -> jnp.ndarray:
    """(H, W, 3) camera-frame ray directions with z = 1.

    ``vertex = depth * pixel_rays`` is the backprojection, so depth maps
    hold projective depth (z), not ray length.
    """
    u = jnp.arange(intr.width, dtype=dtype)
    v = jnp.arange(intr.height, dtype=dtype)
    x = (u[None, :] - intr.cx) / intr.fx
    y = (v[:, None] - intr.cy) / intr.fy
    x = jnp.broadcast_to(x, (intr.height, intr.width))
    y = jnp.broadcast_to(y, (intr.height, intr.width))
    return jnp.stack([x, y, jnp.ones_like(x)], axis=-1)


def project(
    intr: Intrinsics, points_cam: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Camera-frame points (..., 3) -> (u, v, valid-in-front)."""
    z = points_cam[..., 2]
    safe_z = jnp.where(z > 1e-6, z, 1.0)
    u = intr.fx * points_cam[..., 0] / safe_z + intr.cx
    v = intr.fy * points_cam[..., 1] / safe_z + intr.cy
    return u, v, z > 1e-6


def in_bounds(intr: Intrinsics, u: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    return (u >= 0) & (u <= intr.width - 1) & (v >= 0) & (v <= intr.height - 1)
