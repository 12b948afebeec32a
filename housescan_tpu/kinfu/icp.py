"""Projective point-to-plane ICP camera tracking.

TPU replacement for PCL KinFu's ICP CUDA kernels (SURVEY.md section 2b).
Per pyramid level (coarse to fine), a fixed number of Gauss-Newton
iterations: transform the live vertex map by the current pose estimate,
project into the previous camera, gather the raycast model vertex/normal
at that pixel (projective data association), form point-to-plane
residuals, and reduce the 6x6 normal equations A = J^T J, b = J^T r as
two matmuls over an (N, 6) Jacobian — the reduction the BASELINE.json
north star calls out, here hitting the MXU with full-precision
accumulation.

The incremental twist (alpha, beta, gamma, tx, ty, tz) is applied in
world frame: v' ~= v + omega x v + t (small-angle), exactly PCL KinFu's
linearization.
"""

from __future__ import annotations

from typing import NamedTuple, Sequence, Tuple

import jax
import jax.numpy as jnp

from housescan_tpu.geometry.transform import mm
from housescan_tpu.kinfu.camera import Intrinsics


class IcpResult(NamedTuple):
    pose: jnp.ndarray  # (4, 4) refined camera-to-world
    rmse: jnp.ndarray  # () final point-to-plane RMSE (meters)
    n_corr: jnp.ndarray  # () int32 final correspondence count


def _model_gradients(model_vertices: jnp.ndarray, model_valid: jnp.ndarray):
    """Central-difference model-map gradients for the linearized
    association, masked at invalid/seam neighbors.

    ITERATION-INVARIANT: the model maps are fixed while tracking a frame,
    so callers compute this once per level and close over it instead of
    paying ~10 full-map ops per GN iteration inside the loop."""

    def shift(m, dy, dx):
        return jnp.roll(m, (-dy, -dx), (0, 1))

    okf = model_valid
    ok_u = shift(okf, 0, 1) & shift(okf, 0, -1)
    ok_v = shift(okf, 1, 0) & shift(okf, -1, 0)
    gu = jnp.where(
        ok_u[..., None],
        0.5 * (shift(model_vertices, 0, 1) - shift(model_vertices, 0, -1)),
        0.0,
    )
    gv = jnp.where(
        ok_v[..., None],
        0.5 * (shift(model_vertices, 1, 0) - shift(model_vertices, -1, 0)),
        0.0,
    )
    return gu, gv


def _associate(
    model_vertices: jnp.ndarray,
    model_normals: jnp.ndarray,
    model_valid: jnp.ndarray,
    grads,  # (gu, gv) from _model_gradients
    u: jnp.ndarray,  # float projected column
    v: jnp.ndarray,  # float projected row
    window: int,
    row0=0,  # global row index of this map's first row (sharded slabs)
):
    """LINEARIZED projective association WITHOUT a gather.

    TPU XLA gathers run near-scalar speed (~9ns/element measured on
    v5e), and a (2w+1)^2 shift-stack costs hundreds of small ops per
    iteration (each ~0.5-1us of issue latency on this backend). Instead,
    the model-map lookup at the projected pixel is LINEARIZED around the
    pixel's own position: m(u, v) ~= m(p) + dm/du * (u - px) +
    dm/dv * (v - py), with central-difference gradients masked at
    invalid/seam neighbors. On planar surfaces (walls, floors, furniture
    faces — exactly what the plane raycast renders) the model vertex map
    is an exact linear function of the pixel, so within the gate the
    association is EXACT, sub-pixel, and ~20 vector ops total. Normals
    come from the pixel itself (piecewise-constant per fitted plane;
    disagreeing seams are already masked by the raycast).

    ``window == 0`` means a +-1.5 px gate (identity-class association on
    the finest level); otherwise |u - px| and |v - py| must be within
    ``window`` pixels — the same motion budget the old shift-stack
    covered, now without its op count.
    """
    h, w = u.shape
    gate = 1.5 if window == 0 else float(window)
    py = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0).astype(u.dtype) + row0
    px = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1).astype(u.dtype)
    du = u - px
    dv = v - py
    near = (jnp.abs(du) <= gate) & (jnp.abs(dv) <= gate)

    gu, gv = grads
    m_v = model_vertices + gu * du[..., None] + gv * dv[..., None]
    # Pixels whose extrapolation basis is missing keep the identity
    # association (still exact for point-to-plane on their own plane when
    # the flow is small); fully invalid pixels are dropped by m_ok.
    m_ok = model_valid & near
    return m_v, model_normals, m_ok


def _solve_increment(
    a: jnp.ndarray, b: jnp.ndarray, damping: float = 3e-4, max_step: float = 0.3,
    null_threshold: float = 1e-2,
):
    """Solve the 6x6 system with scale-relative Tikhonov damping and a
    NULL-SPACE gate.

    Both matter for degenerate geometry (a single flat wall fills the
    view — common mid-scan in real rooms): the normal matrix then has
    near-zero eigenvalues along the unconstrained directions. Damping
    alone is NOT enough: the unconstrained direction's gradient b_null
    is fed almost entirely by the raycast model's one-signed silhouette
    bias (PERFORMANCE.md), and the damped solve steps it by
    b_null/(damping*scale) — measured as a confident 20-40 mm/frame
    slide along a bare wall (rmse under 1 mm while the pose runs away).
    So the step uses the ITERATED-TIKHONOV spectral filter

        x = (A + lam I)^-1 A (A + lam I)^-1 b,   lam = null_threshold*scale

    whose per-eigendirection gain is w/(w+lam)^2: ~1/w (an undamped GN
    step) for observable directions w >> lam, and ~w/lam^2 -> 0 for
    unobservable ones — an unobservable direction simply does not move
    (PCL KinFu's condition check is the blunt ancestor of this — it
    freezes the whole pose; filtering per-direction keeps tracking the
    observable five). Unlike a hard eigenvalue gate this needs no
    eigendecomposition — one extra 6x6 matvec and a second triangular
    solve reusing the same factorization — so the fused Pallas scalar
    kernel (ops/solve6_pallas.py) applies the IDENTICAL formula.
    ``max_step`` caps any single twist update (radians / meters) as a
    backstop.

    Threshold choice (measured, bare-wall view in the flat synthetic
    room): the unobservable cluster sits at w/w_max <= 3e-4 and the
    observed directions at >= 4e-2 — lam at 1e-2 x scale splits the gap
    (null steps attenuated ~30x, dominant directions touched <2%).
    Plain damping at 1e-4-1e-2 was tried and failed: the bare-wall
    slide rode an eigenvalue of 2.8e-4 x w_max, where a damped solve
    still steps b_null/lam (a 12 cm step from the silhouette-bias
    gradient alone).
    """
    scale = jnp.maximum(jnp.max(jnp.abs(jnp.diagonal(a))), 1e-12)
    lam = jnp.maximum(damping, null_threshold) * scale
    a_d = a + lam * jnp.eye(6, dtype=a.dtype)
    z = jnp.linalg.solve(a_d, b)
    x = jnp.linalg.solve(a_d, mm(a, z))
    norm0 = jnp.linalg.norm(x)
    # >1e3 rad/m pre-clamp only arises from a degenerate system (e.g. an
    # all-zero A with nonzero b solves to a finite-but-huge step through
    # the damping floor); keep the pose rather than stepping max_step in
    # a garbage direction. Mirrored in ops/solve6_pallas.py.
    ok = jnp.all(jnp.isfinite(x)) & (norm0 <= 1e3)
    x = jnp.where(ok, x, 0.0)
    norm = jnp.linalg.norm(x)
    x = jnp.where(norm > max_step, x * (max_step / jnp.maximum(norm, 1e-12)), x)
    return x, ok


def _twist_to_proj(x: jnp.ndarray) -> jnp.ndarray:
    """(alpha, beta, gamma, tx, ty, tz) -> 4x4 row-vector world transform.

    Exact Rodrigues for the rotation (PCL uses the same linearization for
    the solve but composes an orthonormal rotation).
    """
    omega = x[:3]
    t = x[3:]
    theta = jnp.linalg.norm(omega)
    # Rodrigues via quaternion-free formula, safe at theta -> 0.
    k = jnp.where(theta > 1e-12, omega / jnp.maximum(theta, 1e-12), jnp.zeros(3, x.dtype))
    kx, ky, kz = k[0], k[1], k[2]
    zero = jnp.zeros((), x.dtype)
    skew = jnp.array(
        [[zero, -kz, ky], [kz, zero, -kx], [-ky, kx, zero]]
    )
    s, c = jnp.sin(theta), jnp.cos(theta)
    r_col = jnp.eye(3, dtype=x.dtype) + s * skew + (1 - c) * mm(skew, skew)
    # Row-vector form: p' = p @ r_col.T + t
    m = jnp.eye(4, dtype=x.dtype)
    m = m.at[:3, :3].set(r_col.T)
    m = m.at[3, :3].set(t)
    return m


def _normal_equations(
    pose: jnp.ndarray,
    live_vertices: jnp.ndarray,  # (H, W, 3) camera frame
    live_normals: jnp.ndarray,  # (H, W, 3) camera frame
    model_vertices: jnp.ndarray,  # (Hm, Wm, 3) world frame
    model_normals: jnp.ndarray,  # (Hm, Wm, 3) world frame
    model_valid: jnp.ndarray,  # (Hm, Wm)
    model_grads,  # (gu, gv) from _model_gradients
    prev_pose: jnp.ndarray,
    intr: Intrinsics,
    dist_threshold,
    angle_threshold: float,
    window: int = 0,
    row0=0,
):
    """One GN iteration's 6x6 normal equations (association + gates +
    robust weighting + MXU reduction), WITHOUT the solve.

    Shared verbatim by the single-chip level iteration below and the
    row-sharded psum'd variant (parallel/sharded.py
    fine_normal_equations): both paths therefore apply identical
    correspondence gates and weighting — one quality story. ``row0`` is
    the global image row of the map's first row, nonzero when the caller
    passes a row-sharded slab. Returns (a, b, n_corr, sq) where sq is
    the weighted squared-residual sum feeding the RMSE.
    """
    rot = pose[:3, :3]
    t = pose[3, :3]
    v_w = mm(live_vertices, rot) + t
    n_w = mm(live_normals, rot)
    # Require a real live normal: the discontinuity mask zeroes normals at
    # occlusion edges, and a zero normal would trivially pass the angle
    # test below.
    live_valid = (live_vertices[..., 2] > 0) & (
        jnp.sum(live_normals * live_normals, axis=-1) > 0.25
    )

    # Project into the PREVIOUS camera (projective data association).
    p_rot = prev_pose[:3, :3]
    p_t = prev_pose[3, :3]
    v_pc = mm(v_w - p_t, p_rot.T)
    z = v_pc[..., 2]
    safe_z = jnp.where(z > 1e-6, z, 1.0)
    u = intr.fx * v_pc[..., 0] / safe_z + intr.cx  # float (sub-pixel)
    v = intr.fy * v_pc[..., 1] / safe_z + intr.cy
    inb = (
        (z > 1e-6)
        & (u >= 0)
        & (u <= intr.width - 1)
        & (v >= 0)
        & (v <= intr.height - 1)
    )

    m_v, m_n, m_ok = _associate(
        model_vertices, model_normals, model_valid, model_grads, u, v, window,
        row0=row0,
    )

    diff = v_w - m_v
    dist_ok = jnp.sum(diff * diff, axis=-1) < dist_threshold * dist_threshold
    # sin(angle) between normals via cross product norm (PCL's test).
    cross = jnp.cross(n_w, m_n)
    angle_ok = jnp.sum(cross * cross, axis=-1) < jnp.sin(angle_threshold) ** 2
    corr = live_valid & inb & m_ok & dist_ok & angle_ok

    # Point-to-plane rows: g = [v_w x n_m, n_m], residual r = n_m . (m_v - v_w)
    g_rot = jnp.cross(v_w, m_n)
    g = jnp.concatenate([g_rot, m_n], axis=-1)  # (H, W, 6)
    r = jnp.sum(m_n * (m_v - v_w), axis=-1)  # (H, W)

    # Huber robust weighting: full weight within `huber_delta`, 1/|r|
    # beyond — bounds the influence of residual outliers the geometric
    # gates let through.
    huber_delta = 0.02
    w_rob = jnp.minimum(1.0, huber_delta / jnp.maximum(jnp.abs(r), 1e-9))
    # Incidence weighting: surfaces seen at grazing angles have the least
    # reliable TSDF (projective-depth obliquity) and raycast normals —
    # measured as a coherent multi-degree normal tilt on a grazing floor.
    # cos^2 of the model-pixel viewing angle downweights them smoothly.
    ray = m_v - p_t
    ray = ray / jnp.maximum(jnp.linalg.norm(ray, axis=-1, keepdims=True), 1e-9)
    incidence = jnp.maximum(-jnp.sum(m_n * ray, axis=-1), 0.0)
    w = corr.astype(v_w.dtype) * w_rob * incidence * incidence
    gw = (g * w[..., None]).reshape(-1, 6)
    rw = (r * w).reshape(-1)

    # The 6x6 reduction on the MXU with f32 accumulation.
    a = jnp.matmul(gw.T, gw, precision="highest")
    b = jnp.matmul(gw.T, rw, precision="highest")
    n_corr = jnp.sum(corr)
    sq = jnp.sum((r * w) ** 2)
    return a, b, n_corr, sq


def _icp_level_iteration(
    pose: jnp.ndarray,
    live_vertices: jnp.ndarray,  # (H, W, 3) camera frame
    live_normals: jnp.ndarray,  # (H, W, 3) camera frame
    model_vertices: jnp.ndarray,  # (Hm, Wm, 3) world frame
    model_normals: jnp.ndarray,  # (Hm, Wm, 3) world frame
    model_valid: jnp.ndarray,  # (Hm, Wm)
    model_grads,  # (gu, gv) from _model_gradients
    prev_pose: jnp.ndarray,
    intr: Intrinsics,
    dist_threshold: float,
    angle_threshold: float,
    window: int = 0,
    damping: float = 3e-4,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    a, b, n_corr, sq = _normal_equations(
        pose,
        live_vertices,
        live_normals,
        model_vertices,
        model_normals,
        model_valid,
        model_grads,
        prev_pose,
        intr,
        dist_threshold,
        angle_threshold,
        window=window,
    )

    if jax.default_backend() == "cpu":
        x, ok = _solve_increment(a, b, damping=damping)
        inc = _twist_to_proj(x)
        # Keep the old pose if the solve failed.
        new_pose = jnp.where(ok, mm(pose, inc), pose)
        step_norm = jnp.where(ok, jnp.linalg.norm(x), 0.0)
    else:
        # One fused Pallas call: as separate XLA ops this scalar tail
        # costs ~400us PER ITERATION on this backend (tiny-op issue
        # latency), dwarfing the residual math (ops/solve6_pallas.py).
        from housescan_tpu.ops.solve6_pallas import solve_twist_compose

        new_pose, step_norm = solve_twist_compose(pose, a, b, damping=damping)

    rmse = jnp.sqrt(sq / jnp.maximum(n_corr, 1))
    return new_pose, rmse, n_corr, step_norm


def icp_track(
    live_maps: Sequence[jnp.ndarray],
    model_maps: Sequence[jnp.ndarray],
    prev_pose: jnp.ndarray,
    intr: Intrinsics,
    iterations: Sequence[int] = (10, 5, 4),
    dist_threshold=0.10,
    angle_threshold: float = 0.5236,
    init_pose: jnp.ndarray = None,
    windows: Sequence[int] = (0, 2, 4),
    dampings: Sequence[float] = (3e-4, 3e-3, 1e-2),
    use_pallas: bool = False,
    interpret: bool = False,
    tight_threshold=None,
) -> IcpResult:
    """Track the camera for one frame over the pyramid.

    ``live_maps``/``model_maps`` are per-level CHANNEL-MAJOR packed maps
    (kinfu/maps.py: (6, h, w) live, (8, h, w) model), level 0 = finest.
    ``iterations`` is indexed BY LEVEL like PCL's {10, 5, 4}: entry 0 is
    the finest level's count, the last entry the coarsest's; levels run
    coarse to fine. ``dampings`` is indexed the same way: coarse levels
    see few pixels of mostly 1-2 walls and need MUCH heavier Tikhonov
    damping, or their near-null directions slide ~1mm per iteration
    (measured) and accumulate into tracking collapse. The initial
    estimate defaults to the previous pose (constant-position model).

    ``dist_threshold`` is a scalar or a per-level sequence (indexed like
    ``iterations``; traced values allowed). ``tight_threshold`` enables
    the ADAPTIVE gate: every level runs TIGHT by default and widens to
    its (loose) ``dist_threshold`` only when the correspondence count
    collapses below 10% of the visible model pixels, re-tightening
    after half the remaining budget. Why tight-first (all measured on
    the 128^3 synthetic orbit, frame-1 tracking error):

      * tight everywhere from the previous pose: 0.32 mm; loose coarse
        gates: 2.49 mm. The model's residual bias is a sparse
        geometry-scale one-signed silhouette tail; loose gates admit it
        at the COARSEST level and finer levels cannot recover
        (point-to-plane residuals are blind to the in-plane component,
        and re-association from the biased pose has its own fixed
        point at ~1.3 mm — annealing loose-then-tight was tried and
        converged there, not at 0.32).
      * tight-only converges from inter-frame offsets up to ~20 mm and
        collapses at 30 mm with a 50x correspondence-count drop (2710
        -> 57) — a crisp, cheap widening trigger for fast motion.
    """
    from housescan_tpu.kinfu import maps as mp

    n_levels = len(live_maps)
    pose = prev_pose if init_pose is None else init_pose
    rmse = jnp.asarray(0.0, jnp.float32)
    n_corr = jnp.asarray(0, jnp.int32)
    for level in range(n_levels - 1, -1, -1):
        iters = iterations[level] if len(iterations) == n_levels else iterations[-1]
        if iters == 0:
            continue
        win = windows[level] if len(windows) == n_levels else windows[-1]
        damp = dampings[level] if len(dampings) == n_levels else dampings[-1]
        if isinstance(dist_threshold, (tuple, list)):
            dist = (
                dist_threshold[level]
                if len(dist_threshold) == n_levels
                else dist_threshold[-1]
            )
        else:
            dist = dist_threshold
        lvl_intr = intr.level(level)

        if use_pallas:
            # One fused launch per level: every GN iteration (assoc +
            # residual + 6x6 reduce + solve + compose) runs inside a
            # single kernel with the pose in SMEM — the XLA loop pays
            # ~150-600us of op-issue latency PER ITERATION on this
            # backend (ops/icp_pallas.py). Gradients are iteration-
            # invariant: once per level, channel-major.
            from housescan_tpu.ops.icp_pallas import BAND_H, icp_level_pallas

            packed = mp.pack_icp_inputs(
                live_maps[level],
                model_maps[level],
                mp.model_gradients(model_maps[level]),
                band_h=BAND_H,
            )
            pose, lvl_rmse, lvl_corr = icp_level_pallas(
                packed,
                pose,
                prev_pose,
                lvl_intr,
                n_iters=iters,
                window=win,
                dist_threshold=dist,
                angle_threshold=angle_threshold,
                damping=damp,
                interpret=interpret,
                tight_threshold=tight_threshold,
            )
            use = lvl_corr > 0
            rmse = jnp.where(use, lvl_rmse, rmse)
            n_corr = jnp.where(use, lvl_corr, n_corr)
            continue

        # XLA fallback (CPU tests / non-tileable shapes): unpack to the
        # interleaved maps _icp_level_iteration expects. Layout
        # transposes are fine off the TPU hot path.
        lv, ln = mp.live_to_hwc(live_maps[level])
        mv, mn, mok, _ = mp.model_to_hwc(model_maps[level])
        grads = _model_gradients(mv, mok)

        # Iterate until a HEALTHY TIGHT iteration's twist increment is
        # negligible (the usual case after 3-5 iterations) or the
        # level's budget runs out. Adaptive gate state machine mirrors
        # ops/icp_pallas.py: tight by default; a correspondence-count
        # collapse widens the gate for half the remaining budget.
        mok_total = jnp.sum(mok.astype(jnp.float32))

        def cond(carry, _iters=iters):
            i, _, _, _, _, done = carry
            return (i < _iters) & ~done

        def body(carry, _lv=lv, _ln=ln, _mv=mv, _mn=mn, _mok=mok,
                 _win=win, _intr=lvl_intr, _damp=damp, _grads=grads,
                 _dist=dist, _iters=iters):
            i, p, _, _, widen_until, _ = carry
            if tight_threshold is None:
                gate_d = _dist
            else:
                gate_d = jnp.where(i < widen_until, _dist, tight_threshold)
            p2, rm, nc, norm = _icp_level_iteration(
                p,
                _lv,
                _ln,
                _mv,
                _mn,
                _mok,
                _grads,
                prev_pose,
                _intr,
                gate_d,
                angle_threshold,
                window=_win,
                damping=_damp,
            )
            was_tight = i >= widen_until
            if tight_threshold is None:
                healthy = jnp.asarray(True)
            else:
                healthy = nc.astype(jnp.float32) >= 0.1 * mok_total
            widen2 = jnp.where(
                (~healthy) & was_tight, i + 1 + (_iters - i) // 2, widen_until
            )
            done = (norm <= 1e-5) & healthy & was_tight
            return i + 1, p2, rm, nc, widen2, done

        _, pose, lvl_rmse, lvl_corr, _, _ = jax.lax.while_loop(
            cond,
            body,
            (
                jnp.asarray(0, jnp.int32),
                pose,
                jnp.asarray(0.0, jnp.float32),
                jnp.asarray(0, jnp.int32),
                jnp.asarray(0, jnp.int32),
                jnp.asarray(False),
            ),
        )
        # Report diagnostics from the FINEST level that actually had
        # correspondences (identity association at level 0 contributes
        # only when the projective flow is sub-pixel, by design).
        use = lvl_corr > 0
        rmse = jnp.where(use, lvl_rmse, rmse)
        n_corr = jnp.where(use, lvl_corr, n_corr)
    return IcpResult(pose, rmse, n_corr)


