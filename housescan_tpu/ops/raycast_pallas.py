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

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from housescan_tpu.kinfu.camera import Intrinsics
from housescan_tpu.kinfu.tsdf import TsdfVolume
from housescan_tpu.ops.planes_pallas import N_FIELDS, SUB_Z, extract_subblock_planes

MAX_CAND = 256
BIG = 1.0e9
# Silhouette-skirt mask dilation radius in pixels (finalize_plane_maps):
# must span the widest plane-extension skirt, ~(1.8 x in-plane RMS
# radius margin + 1.5 voxels) projected at typical working distance.
EDGE_PX = 4

# Raw-map row indices (raycast_tiles_maps output): like the model-map
# layout (kinfu/maps.py) but with the hit sub-block id in row 7 where
# the finalized maps carry the valid flag, plus the nearest occluder
# event time in row 8 (BIG = none; consumed and dropped here).
RAW_BID = 7
RAW_OCC = 8


@partial(jax.jit, static_argnames=("intr", "interpret"))
def raycast_planes(
    planes: jnp.ndarray,
    pose: jnp.ndarray,
    intr: Intrinsics,
    vol: TsdfVolume,
    z_min: float = 0.3,
    interpret: bool = False,
) -> jnp.ndarray:
    """Tile-candidate raycast (ops/raycast_tiles.py) + seam masking.

    Returns CHANNEL-MAJOR model maps (8, H, W): depth, world vertex xyz,
    world normal xyz, valid (kinfu/maps.py layout)."""
    from housescan_tpu.ops.raycast_tiles import raycast_tiles_maps

    raw = raycast_tiles_maps(
        planes, pose, intr, vol, z_min=z_min, interpret=interpret
    )
    return finalize_plane_maps(raw, voxel_size=vol.voxel_size)


def finalize_plane_maps(raw: jnp.ndarray, voxel_size=None) -> jnp.ndarray:
    """Seam masking over raw (8, H, W) plane-hit maps -> model maps.

    Split out so the mesh-sharded raycast can pmin-combine per-slab raw
    maps FIRST and mask once on the combined result (sub-block ids are
    globally unique across shards).

    Exact block-plane normals + DISAGREEING-SEAM MASKING. Each pixel's
    normal is the plane it actually hit — an exact-plane sample,
    unbiased for point-to-plane ICP. But at sub-block seams the
    piecewise-planar model is a staircase: neighboring blocks' tilt
    and offset errors correlate by construction (both ~ the local fit
    residual, one-signed), and smoothing normals across seams (vertex-
    map normals were tried) manufactures mid-tilt pixels whose
    tilt x offset product sums coherently — ICP then walks
    ~1mm/iteration along the scene's weakest pose mode. Instead: drop
    any pixel whose 4-neighborhood hit a DIFFERENT block whose plane
    DISAGREES (normal tilt > ~3 deg or a depth step — corners,
    silhouettes, bad fits). Coplanar mid-wall seams agree to sub-mm
    and are kept, so coverage stays near the XLA raycast's.

    SILHOUETTE-SKIRT MASKING (``voxel_size`` given): block planes
    extend past real object edges (partial-block extrapolation is what
    gives the model its coverage on half-seen walls), and at
    silhouettes that extension paints object depth over background
    pixels — a ONE-SIGNED +2..5 voxel model-depth bias concentrated
    0-5 px outside silhouettes (measured at 128^3: median |err| 51 mm
    at 0-2 px from an edge vs 0.010 mm beyond 5 px; these skirt pixels
    alone steered ICP by several mm per frame). A skirt pixel always
    has much-farther geometry a few pixels away (the background its
    plane juts over), so: mask any pixel whose dilated neighborhood
    max depth exceeds its own by > 2 voxels. One-sided by
    construction — background pixels AT the edge see only nearer
    neighbors and are kept, matching what a TSDF marcher would render.
    """
    from housescan_tpu.kinfu import maps as mp

    depth = raw[mp.MD_DEPTH]
    normals = raw[mp.MD_N]
    bid = raw[RAW_BID]
    valid = depth > 0

    if raw.shape[0] > RAW_OCC and voxel_size is not None:
        # Occluder suppression (ops/raycast_tiles.py raw row 8): a
        # gate-failed block with crossing evidence is the ray's nearest
        # event -> there IS surface there the plane model can't
        # represent; the pixel is invalid. Plane hits within 2 voxels
        # keep priority so occluder spheres overlapping a neighboring
        # wall don't eat its seam pixels. Applied HERE (after any
        # cross-slab pmin combine) so sharded and single-chip runs
        # decide on the same global event set.
        valid = valid & (raw[RAW_OCC] > depth - 2.0 * voxel_size)

    same = valid
    for axis, shift in ((1, 1), (1, -1), (2, 1), (2, -1)):
        nb = jnp.roll(raw, shift, axis=axis)  # all rows in ONE roll
        agree = (jnp.sum(normals * nb[mp.MD_N], axis=0) > 0.9986) & (
            jnp.abs(depth - nb[mp.MD_DEPTH]) < 0.08
        )
        same = same & ((nb[RAW_BID] == bid) | agree)
    valid = same

    if voxel_size is not None:
        # Separable +-EDGE_PX box max-dilation of the hit depth map
        # (2 * EDGE_PX rolls; unhit pixels contribute 0 so open space
        # never flags an edge).
        dmax = depth
        acc = dmax
        for s in range(1, EDGE_PX + 1):
            acc = jnp.maximum(acc, jnp.roll(dmax, s, axis=0))
            acc = jnp.maximum(acc, jnp.roll(dmax, -s, axis=0))
        dmax = acc
        for s in range(1, EDGE_PX + 1):
            acc = jnp.maximum(acc, jnp.roll(dmax, s, axis=1))
            acc = jnp.maximum(acc, jnp.roll(dmax, -s, axis=1))
        valid = valid & (acc - depth <= 2.0 * voxel_size)

    masked = jnp.where(valid[None], raw, 0.0)
    return jnp.concatenate(
        [masked[: mp.MD_VALID], valid[None].astype(jnp.float32)], axis=0
    )


def raycast_pallas(
    vol: TsdfVolume,
    pose: jnp.ndarray,
    intr: Intrinsics,
    z_min: float = 0.3,
    interpret: bool = False,
) -> jnp.ndarray:
    """Full pipeline: extract sub-block planes, then plane-raycast.
    Returns (8, H, W) channel-major model maps (kinfu/maps.py)."""
    planes = extract_subblock_planes(vol, interpret=interpret)
    return raycast_planes(planes, pose, intr, vol, z_min=z_min, interpret=interpret)
