"""Pallas bilateral depth filter.

The XLA bilateral (kinfu/preprocess.py) unrolls a (2r+1)^2 = 49-tap
shift-stack; even fused, several hundred ops pay this backend's per-op
issue latency every frame. Here the same arithmetic runs as ONE kernel:
the depth image lives in VMEM and every tap is a register-level
rotate + select, so the whole filter is a single program with no
per-op dispatch. Numerics are identical to the XLA path (same
Gaussian-spatial x biweight-range weights, same 0 = invalid convention,
same border masking).

Reference: PCL KinFu's bilateral CUDA kernel (SURVEY.md section 2b).
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(depth, out, *, radius, sigma_space, sigma_depth):
    hp, wp = depth.shape
    reg = depth[...]
    valid = reg > 0.0

    rows = jax.lax.broadcasted_iota(jnp.int32, (hp, wp), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (hp, wp), 1)

    inv_2ss = 0.5 / (sigma_space * sigma_space)
    inv_9sd2 = 1.0 / (9.0 * sigma_depth * sigma_depth)

    def shift(m, dy, dx):
        """m shifted so position p holds m[p - (dy, dx)], zero fill —
        mirrors preprocess._shift2d (pltpu.roll needs shifts >= 0)."""
        o = m
        if dy:
            o = pltpu.roll(o, dy % hp, 0)
        if dx:
            o = pltpu.roll(o, dx % wp, 1)
        keep = jnp.full((hp, wp), True)
        if dy > 0:
            keep &= rows >= dy
        elif dy < 0:
            keep &= rows < hp + dy
        if dx > 0:
            keep &= cols >= dx
        elif dx < 0:
            keep &= cols < wp + dx
        return jnp.where(keep, o, 0.0)

    weight_sum = jnp.zeros((hp, wp), jnp.float32)
    value_sum = jnp.zeros((hp, wp), jnp.float32)
    for dy in range(-radius, radius + 1):
        for dx in range(-radius, radius + 1):
            shifted = shift(reg, dy, dx)
            ok = (shifted > 0.0) & valid
            dd = shifted - reg
            # Biweight range kernel (see kinfu/preprocess.bilateral_filter):
            # 49 runtime transcendentals per pixel were most of this
            # kernel's VPU time; the polynomial matches the XLA path
            # bit-for-bit.
            wr = jnp.maximum(0.0, 1.0 - dd * dd * inv_9sd2)
            w = math.exp(-(dy * dy + dx * dx) * inv_2ss) * wr * wr
            w = jnp.where(ok, w, 0.0)
            weight_sum = weight_sum + w
            value_sum = value_sum + w * shifted
    out[...] = jnp.where(
        valid & (weight_sum > 0.0),
        value_sum / jnp.maximum(weight_sum, 1e-12),
        0.0,
    )


@partial(
    jax.jit,
    static_argnames=("radius", "sigma_space", "sigma_depth", "interpret"),
)
def bilateral_filter_pallas(
    depth: jnp.ndarray,
    radius: int = 3,
    sigma_space: float = 4.5,
    sigma_depth: float = 0.03,
    interpret: bool = False,
) -> jnp.ndarray:
    """Drop-in for kinfu.preprocess.bilateral_filter on TPU.

    Shift semantics match preprocess._shift2d exactly: a tap that falls
    outside the image contributes zero weight. The image is padded to
    (8, 128) tiles with zeros (= invalid), which the masks treat the
    same as out-of-image.
    """
    h, w = depth.shape
    hp = -(-h // 8) * 8
    wp = -(-w // 128) * 128
    d = depth.astype(jnp.float32)
    if (hp, wp) != (h, w):
        d = jnp.zeros((hp, wp), jnp.float32).at[:h, :w].set(d)

    out = pl.pallas_call(
        partial(
            _kernel,
            radius=radius,
            sigma_space=sigma_space,
            sigma_depth=sigma_depth,
        ),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((hp, wp), jnp.float32),
        interpret=interpret,
    )(d)
    return out[:h, :w]
