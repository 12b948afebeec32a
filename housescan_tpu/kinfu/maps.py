"""Channel-major (C, H, W) map layout for the tracking hot path.

Replaces the reference-style interleaved (H, W, 3) vertex/normal maps
(PCL KinFu's MapArr layout, SURVEY.md section 2b) everywhere the
per-frame loop touches full-resolution maps. On this TPU the interleaved
layout is poison twice over:

  * every elementwise op on an (H, W, 3) array runs with a 3-wide minor
    dimension — ~2% lane utilization on the 128-lane VPU, and every
    channel extraction (``m[..., 0]``) is a strided read;
  * strided slices (``[::2, ::2]`` downsampling) lower to near-scalar
    gathers on this backend (~9 ns/element — measured: downsampling one
    (480, 640, 3) map pyramid cost ~1.8 ms/frame, more than the whole
    19-iteration ICP).

Channel-major maps keep H, W in the minor-two dims (full VPU tiles) and
make packing/concatenation contiguous copies.

Row layouts (all float32):

  * live maps (6, h, w):  0-2 vertex xyz (camera frame),
                          3-5 normal xyz (camera frame, 0 = invalid)
  * model maps (8, h, w): 0 depth (projective, 0 = invalid),
                          1-3 vertex xyz (world),
                          4-6 normal xyz (world),
                          7 valid (1.0 / 0.0)
  * ICP packed (19, h, w): rows 0-5 live v+n, 6-8 model v, 9-11 model n,
                          12 valid, 13-15 du-gradient, 16-18 dv-gradient
                          (the ops/icp_pallas.py kernel's input layout)

Downsampling is exact point sampling (level pixel (i, j) = fine pixel
(2i, 2j), PCL's resize convention) computed as one-hot MATMULS on the
MXU instead of strided slices — bit-identical values, none of the
gather cost.
"""

from __future__ import annotations

from typing import List, Tuple

import jax
import jax.numpy as jnp

# Model map rows.
MD_DEPTH = 0
MD_V = slice(1, 4)
MD_N = slice(4, 7)
MD_VALID = 7
MODEL_ROWS = 8

# Live map rows.
LV_V = slice(0, 3)
LV_N = slice(3, 6)
LIVE_ROWS = 6


def _half_selector(n: int, dtype=jnp.float32) -> jnp.ndarray:
    """(n//2, n) one-hot rows selecting every even index."""
    rows = jax.lax.broadcasted_iota(jnp.int32, (n // 2, n), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (n // 2, n), 1)
    return (cols == 2 * rows).astype(dtype)


def halve_maps(m: jnp.ndarray) -> jnp.ndarray:
    """(C, h, w) -> (C, h//2, w//2) exact point sampling (pixel (2i, 2j)).

    On CPU a strided slice is cheap and exact; on the TPU backend it
    lowers to a near-scalar gather, so the selection runs as two one-hot
    matmuls on the MXU (precision='highest' keeps f32 multiplicands:
    each output element is 1.0 * x + zeros = x exactly, so both branches
    produce bit-identical results).
    """
    if jax.default_backend() == "cpu":
        # Slice to floor(n/2) so odd dims agree with the one-hot branch
        # below (plain ::2 would yield ceil(n/2) rows/cols).
        c, h, w = m.shape
        return m[:, : 2 * (h // 2) : 2, : 2 * (w // 2) : 2]
    c, h, w = m.shape
    sel_h = _half_selector(h, m.dtype)  # (h/2, h)
    sel_w = _half_selector(w, m.dtype)  # (w/2, w)
    x = jax.lax.dot_general(
        m, sel_w, (((2,), (1,)), ((), ())), precision="highest"
    )  # (c, h, w/2)
    x = jax.lax.dot_general(
        x, sel_h, (((1,), (1,)), ((), ())), precision="highest"
    )  # (c, w/2, h/2)
    return x.transpose(0, 2, 1)


def build_map_pyramid(maps: jnp.ndarray, levels: int) -> List[jnp.ndarray]:
    """[(C, h, w), (C, h/2, w/2), ...] — level 0 first (finest)."""
    out = [maps]
    for _ in range(1, levels):
        out.append(halve_maps(out[-1]))
    return out


def model_gradients(model: jnp.ndarray) -> jnp.ndarray:
    """Central-difference model vertex gradients, channel-major.

    ``model`` is an (8, h, w) model map; returns (6, h, w): rows 0-2 the
    du (along +u/columns) gradient, rows 3-5 dv. Masked to zero where
    either stencil neighbor is invalid (same semantics as
    kinfu/icp._model_gradients). ITERATION-INVARIANT per frame.
    """
    v = model[MD_V]
    ok = model[MD_VALID] > 0.5

    def sh(m, dy, dx):
        return jnp.roll(m, (-dy, -dx), (-2, -1))

    ok_u = sh(ok, 0, 1) & sh(ok, 0, -1)
    ok_v = sh(ok, 1, 0) & sh(ok, -1, 0)
    gu = jnp.where(ok_u[None], 0.5 * (sh(v, 0, 1) - sh(v, 0, -1)), 0.0)
    gv = jnp.where(ok_v[None], 0.5 * (sh(v, 1, 0) - sh(v, -1, 0)), 0.0)
    return jnp.concatenate([gu, gv], axis=0)


def pack_icp_inputs(
    live: jnp.ndarray,  # (6, h, w)
    model: jnp.ndarray,  # (8, h, w)
    grads: jnp.ndarray,  # (6, h, w) from model_gradients
    band_h: int,
    lane: int = 128,
) -> jnp.ndarray:
    """(19, hp, wp) zero-padded ICP kernel input (ops/icp_pallas.py).

    Three contiguous concats replace the old 19-slice interleaved
    restack. Row order matches the kernel: live v+n, model v, model n,
    valid, du, dv.
    """
    packed = jnp.concatenate([live, model[1:MODEL_ROWS], grads], axis=0)
    _, h, w = packed.shape
    hp = -(-h // band_h) * band_h
    wp = -(-w // lane) * lane
    if (hp, wp) != (h, w):
        packed = jnp.pad(packed, ((0, 0), (0, hp - h), (0, wp - w)))
    return packed


# ---- layout conversion (CPU/XLA fallback paths and tests only) -------


def model_to_hwc(model: jnp.ndarray) -> Tuple[jnp.ndarray, ...]:
    """(8, h, w) model maps -> (vertices (h,w,3), normals (h,w,3),
    valid (h,w) bool, depth (h,w)). Interleaving transposes — never in
    the TPU hot path."""
    vertices = jnp.moveaxis(model[MD_V], 0, -1)
    normals = jnp.moveaxis(model[MD_N], 0, -1)
    return vertices, normals, model[MD_VALID] > 0.5, model[MD_DEPTH]


def model_from_hwc(
    vertices: jnp.ndarray,
    normals: jnp.ndarray,
    valid: jnp.ndarray,
    depth: jnp.ndarray,
) -> jnp.ndarray:
    """Inverse of model_to_hwc."""
    return jnp.concatenate(
        [
            depth[None].astype(jnp.float32),
            jnp.moveaxis(vertices, -1, 0),
            jnp.moveaxis(normals, -1, 0),
            valid[None].astype(jnp.float32),
        ],
        axis=0,
    )


def live_to_hwc(live: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(6, h, w) live maps -> (vertices (h,w,3), normals (h,w,3))."""
    return (
        jnp.moveaxis(live[LV_V], 0, -1),
        jnp.moveaxis(live[LV_N], 0, -1),
    )


def live_from_hwc(vertices: jnp.ndarray, normals: jnp.ndarray) -> jnp.ndarray:
    return jnp.concatenate(
        [jnp.moveaxis(vertices, -1, 0), jnp.moveaxis(normals, -1, 0)], axis=0
    )
