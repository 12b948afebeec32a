"""Fused 6x6 solve + twist exponential + pose compose as ONE kernel.

Each ICP Gauss-Newton iteration ends with: damped 6x6 solve, twist ->
SE(3) increment (Rodrigues), 4x4 compose. As XLA ops these are ~170
sequential scalar-sized tensor ops; on this backend every tiny op costs
~0.3-1us of issue latency, so the tail measures ~400us PER ITERATION
(19 iterations -> ~7ms, dwarfing the actual residual math). Fused into
one Pallas kernel the same arithmetic runs on the scalar core in ~1us;
only the kernel launch (~20us) remains.

Numerics match housescan_tpu.kinfu.icp._solve_increment +
_twist_to_proj exactly: the iterated-Tikhonov null-space filter
x = (A+lam I)^-1 A (A+lam I)^-1 b (lam = max(damping, null_threshold)
x scale — kills confident slides along unobservable pose directions on
bare-wall views, see _solve_increment's docstring; implemented here as
a second triangular solve reusing the same Cholesky factor), non-finite
guard, max-step clamp, exact Rodrigues (sin/cos via Taylor series —
|theta| <= max_step = 0.3, so a 6-term series is exact to f32).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _sin_taylor(t):
    t2 = t * t
    return t * (
        1.0 + t2 * (-1.0 / 6 + t2 * (1.0 / 120 + t2 * (-1.0 / 5040 + t2 / 362880)))
    )


def _cos_taylor(t):
    t2 = t * t
    return 1.0 + t2 * (
        -0.5 + t2 * (1.0 / 24 + t2 * (-1.0 / 720 + t2 * (1.0 / 40320)))
    )


def _solve_twist_math(a_flat, b_vec, pose_flat, damping, max_step,
                      null_threshold=1e-2):
    """Shared scalar math: returns the new 16-element pose row-major.

    ``a_flat``: 36 scalars (row-major 6x6), ``b_vec``: 6 scalars,
    ``pose_flat``: 16 scalars. Pure jnp scalar ops — traceable both
    inside the Pallas kernel and directly (CPU fallback/testing).
    """

    def a(i, j):
        return a_flat[i * 6 + j]

    # Scale-relative regularization on the diagonal: lam doubles as the
    # Tikhonov damping AND the null-space filter knee (icp.py
    # _solve_increment), so it is floored at null_threshold.
    scale = a(0, 0)
    for i in range(1, 6):
        scale = jnp.maximum(scale, jnp.abs(a(i, i)))
    scale = jnp.maximum(scale, 1e-12)
    # jnp.maximum: damping arrives as a traced SMEM scalar from the
    # fused whole-level ICP kernel (ops/icp_pallas.py params row).
    lam = jnp.maximum(damping, null_threshold) * scale

    # Unrolled Cholesky of A + lam*I. The 1e-30 clamp keeps the sqrt
    # finite, so failure must be flagged EXPLICITLY: a non-positive
    # pre-clamp diagonal means the damped system is not SPD (NaNs or a
    # broken normal matrix) and the step is garbage.
    L = [[None] * 6 for _ in range(6)]
    ok = None
    for i in range(6):
        for j in range(i + 1):
            s = a(i, j) + (lam if i == j else 0.0)
            for k in range(j):
                s = s - L[i][k] * L[j][k]
            if i == j:
                pos = s > 0.0
                ok = pos if ok is None else (ok & pos)
                L[i][j] = jnp.sqrt(jnp.maximum(s, 1e-30))
            else:
                L[i][j] = s / L[j][j]
    def chol_solve(rhs):
        y = [None] * 6
        for i in range(6):
            s = rhs[i]
            for k in range(i):
                s = s - L[i][k] * y[k]
            y[i] = s / L[i][i]
        x = [None] * 6
        for i in range(5, -1, -1):
            s = y[i]
            for k in range(i + 1, 6):
                s = s - L[k][i] * x[k]
            x[i] = s / L[i][i]
        return x

    # Iterated-Tikhonov null-space filter (see module docstring):
    # z = (A+lam I)^-1 b, x = (A+lam I)^-1 (A z).
    z = chol_solve(b_vec)
    az = [None] * 6
    for i in range(6):
        s = a(i, 0) * z[0]
        for k in range(1, 6):
            s = s + a(i, k) * z[k]
        az[i] = s
    x = chol_solve(az)

    for i in range(6):
        ok = ok & jnp.isfinite(x[i])
    x = [jnp.where(ok, xi, 0.0) for xi in x]

    nrm2 = x[0] * x[0]
    for i in range(1, 6):
        nrm2 = nrm2 + x[i] * x[i]
    nrm = jnp.sqrt(jnp.maximum(nrm2, 1e-24))
    # Sanity bound (matches icp._solve_increment): a pre-clamp step of
    # >1e3 rad/m only arises from a degenerate system (real GN steps are
    # bounded by max_step-scale physics) — keep the pose instead of
    # taking a max_step-clamped step in a garbage direction.
    ok = ok & (nrm <= 1e3)
    x = [jnp.where(ok, xi, 0.0) for xi in x]
    nrm = jnp.where(ok, nrm, 0.0)
    fac = jnp.where(nrm > max_step, max_step / nrm, 1.0)
    x = [xi * fac for xi in x]

    wx, wy, wz, tx, ty, tz = x
    theta = jnp.sqrt(jnp.maximum(wx * wx + wy * wy + wz * wz, 0.0))
    safe_t = jnp.maximum(theta, 1e-12)
    small = theta <= 1e-12
    kx = jnp.where(small, 0.0, wx / safe_t)
    ky = jnp.where(small, 0.0, wy / safe_t)
    kz = jnp.where(small, 0.0, wz / safe_t)
    s = _sin_taylor(theta)
    c = _cos_taylor(theta)
    one_c = 1.0 - c

    # r_col = I + s*K + (1-c)*K^2; the row-vector pose stores r_col.T.
    r00 = c + one_c * kx * kx
    r01 = s * (-kz) + one_c * kx * ky
    r02 = s * ky + one_c * kx * kz
    r10 = s * kz + one_c * ky * kx
    r11 = c + one_c * ky * ky
    r12 = s * (-kx) + one_c * ky * kz
    r20 = s * (-ky) + one_c * kz * kx
    r21 = s * kx + one_c * kz * ky
    r22 = c + one_c * kz * kz
    # inc (row-vector 4x4): inc[:3,:3] = r_col.T, inc[3,:3] = t.
    inc = [
        [r00, r10, r20, 0.0],
        [r01, r11, r21, 0.0],
        [r02, r12, r22, 0.0],
        [tx, ty, tz, 1.0],
    ]

    def p(i, j):
        return pose_flat[i * 4 + j]

    out = []
    for i in range(4):
        for j in range(4):
            s_ = p(i, 0) * inc[0][j]
            for k in range(1, 4):
                s_ = s_ + p(i, k) * inc[k][j]
            # Failed solve: keep the old pose.
            out.append(jnp.where(ok, s_, p(i, j)))
    # Step norm (post-clamp): lets callers stop iterating once converged.
    out.append(jnp.where(ok, nrm * fac, 0.0))
    return out


def _kernel(abp, out, *, damping, max_step):
    a_flat = [abp[0, i] for i in range(36)]
    b_vec = [abp[0, 36 + i] for i in range(6)]
    pose_flat = [abp[0, 42 + i] for i in range(16)]
    res = _solve_twist_math(a_flat, b_vec, pose_flat, damping, max_step)
    for i in range(17):
        out[0, i] = res[i]


@partial(jax.jit, static_argnames=("damping", "max_step", "interpret"))
def solve_twist_compose(
    pose: jnp.ndarray,  # (4, 4)
    a: jnp.ndarray,  # (6, 6)
    b: jnp.ndarray,  # (6,)
    damping: float = 3e-4,
    max_step: float = 0.3,
    interpret: bool = False,
) -> tuple:
    """(pose @ exp(solve(A + damping*scale*I, b)), step_norm) as one
    Pallas call; step_norm is the post-clamp twist magnitude (0 when the
    solve failed), the convergence signal for early exit."""
    abp = jnp.concatenate(
        [a.reshape(-1), b.reshape(-1), pose.reshape(-1)]
    ).reshape(1, 58)
    out = pl.pallas_call(
        partial(_kernel, damping=damping, max_step=max_step),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((1, 17), jnp.float32),
        interpret=interpret,
    )(abp)
    return out[0, :16].reshape(4, 4), out[0, 16]
