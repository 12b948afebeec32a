"""Plane-raycast front end: model maps from sub-block surface planes.

Replaces per-ray TSDF sampling (1.8s/frame at 512^3 in XLA — near-scalar
gathers) with pure arithmetic: surface planes fitted per (8, 8, 8) voxel
sub-block (ops/planes_pallas.py) are intersected analytically with every
pixel ray by the tile-grouped, candidate-vectorized Pallas kernel in
ops/raycast_tiles.py. This module owns the result assembly: exact-plane
normals plus DISAGREEING-SEAM MASKING (see raycast_planes below).

Accuracy model: exact for planar surfaces (rooms, walls, furniture
faces); curved geometry is piecewise-planar at sub-block scale (~5cm at
512^3).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from housescan_tpu.kinfu.camera import Intrinsics
from housescan_tpu.kinfu.tsdf import TsdfVolume
from housescan_tpu.ops.planes_pallas import N_FIELDS, SUB_Z, extract_subblock_planes

MAX_CAND = 256
BIG = 1.0e9


class PlaneRaycastResult(NamedTuple):
    vertices: jnp.ndarray  # (H, W, 3) world
    normals: jnp.ndarray  # (H, W, 3) unit, toward free space
    valid: jnp.ndarray  # (H, W)
    depth: jnp.ndarray  # (H, W) projective depth (0 invalid)


@partial(jax.jit, static_argnames=("intr", "interpret"))
def raycast_planes(
    planes: jnp.ndarray,
    pose: jnp.ndarray,
    intr: Intrinsics,
    vol: TsdfVolume,
    z_min: float = 0.3,
    interpret: bool = False,
) -> PlaneRaycastResult:
    """Tile-candidate raycast (ops/raycast_tiles.py) + seam masking."""
    from housescan_tpu.ops.raycast_tiles import raycast_tiles_maps

    depth, vx, vy, vz, nx, ny, nz, bid = raycast_tiles_maps(
        planes, pose, intr, vol, z_min=z_min, interpret=interpret
    )
    vertices = jnp.stack([vx, vy, vz], axis=-1)
    normals = jnp.stack([nx, ny, nz], axis=-1)
    return finalize_plane_maps(depth, vertices, normals, bid)


def finalize_plane_maps(
    depth: jnp.ndarray,
    vertices: jnp.ndarray,
    normals: jnp.ndarray,
    bid: jnp.ndarray,
) -> PlaneRaycastResult:
    """Seam masking over raw plane-hit maps. Split out so the mesh-
    sharded raycast can pmin-combine per-slab raw maps FIRST and mask
    once on the combined result (sub-block ids are globally unique
    across shards)."""
    valid = depth > 0

    # Exact block-plane normals + DISAGREEING-SEAM MASKING. Each pixel's
    # normal is the plane it actually hit — an exact-plane sample,
    # unbiased for point-to-plane ICP. But at sub-block seams the
    # piecewise-planar model is a staircase: neighboring blocks' tilt
    # and offset errors correlate by construction (both ~ the local fit
    # residual, one-signed), and smoothing normals across seams (vertex-
    # map normals were tried) manufactures mid-tilt pixels whose
    # tilt x offset product sums coherently — ICP then walks
    # ~1mm/iteration along the scene's weakest pose mode. Instead: drop
    # any pixel whose 4-neighborhood hit a DIFFERENT block whose plane
    # DISAGREES (normal tilt > ~3 deg or a depth step — corners,
    # silhouettes, bad fits). Coplanar mid-wall seams agree to sub-mm
    # and are kept, so coverage stays near the XLA raycast's.
    same = valid
    for axis, shift in ((0, 1), (0, -1), (1, 1), (1, -1)):
        nb_bid = jnp.roll(bid, shift, axis=axis)
        nb_n = jnp.roll(normals, shift, axis=axis)
        nb_z = jnp.roll(depth, shift, axis=axis)
        agree = (jnp.sum(normals * nb_n, axis=-1) > 0.9986) & (
            jnp.abs(depth - nb_z) < 0.08
        )
        same = same & ((nb_bid == bid) | agree)
    valid = valid & same
    vertices = jnp.where(valid[..., None], vertices, 0.0)
    normals = jnp.where(valid[..., None], normals, 0.0)
    depth = jnp.where(valid, depth, 0.0)
    return PlaneRaycastResult(vertices, normals, valid, depth)


def raycast_pallas(
    vol: TsdfVolume,
    pose: jnp.ndarray,
    intr: Intrinsics,
    z_min: float = 0.3,
    interpret: bool = False,
) -> PlaneRaycastResult:
    """Full pipeline: extract sub-block planes, then plane-raycast."""
    planes = extract_subblock_planes(vol, interpret=interpret)
    return raycast_planes(planes, pose, intr, vol, z_min=z_min, interpret=interpret)
