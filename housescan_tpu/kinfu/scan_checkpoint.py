"""Mid-scan checkpoint/resume for the KinFu fusion state.

The reference's signature resilience feature was state-preserving
restart (ref Main.hs:1195-1260: `State` survives reload in a
Foreign.Store slot, guarded by a Generics structural fingerprint of the
type, ref :1207-1238). Scene checkpoints (io/checkpoint.py) cover the
room-assembly stage; this module covers the SCAN stage: the full
KinFuState pytree (packed TSDF volume, persistent surface planes, pose,
model maps) round-trips through one compressed npz, so a long scan can
resume after interruption instead of re-fusing from frame 0.

The fingerprint idea maps over directly: the manifest records a
structural hash of the state layout (field names + array shapes/dtypes
modulo resolution) and intrinsics; a mismatched resume is refused
instead of producing silently corrupt fusion (the same failure the
reference's fingerprint guarded against, ref Main.hs:1213-1215).
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Optional, Tuple, Union

import jax.numpy as jnp
import numpy as np

from housescan_tpu.kinfu.camera import Intrinsics
from housescan_tpu.kinfu.pipeline import KinFuState
from housescan_tpu.kinfu.tsdf import TsdfVolume

# v1: KinFuState with a velocity field, no trajectory.
# v2: velocity dropped; accumulated per-frame poses stored so a resumed
#     scan writes the same trajectory.npz as an uninterrupted one.
# v3: model maps stored channel-major packed (8, H, W) (kinfu/maps.py)
#     instead of three interleaved arrays; v2 checkpoints migrate.
# v4: last_tracked tracking-loss flag added (kinfu/pipeline.py);
#     v1-v3 checkpoints migrate with last_tracked=True.
SCAN_SCHEMA_VERSION = 4


def _state_fingerprint(state: KinFuState) -> str:
    parts = [f"v{SCAN_SCHEMA_VERSION}"]
    for name in KinFuState._fields:
        leaf = getattr(state, name)
        if name == "volume":
            parts.append(
                "volume:" + ",".join(TsdfVolume._fields)
                + f":{leaf.data.ndim}d:{leaf.data.dtype}"
            )
        else:
            arr = np.asarray(leaf)
            parts.append(f"{name}:{arr.ndim}d:{arr.dtype}")
    return "|".join(parts)


def save_scan_state(
    state: KinFuState,
    frame_index: int,
    intr: Intrinsics,
    path: Union[str, Path],
    trajectory: Optional[np.ndarray] = None,
) -> Path:
    """Write a resumable scan checkpoint (one .npz).

    ``trajectory`` is the (frame_index, 4, 4) stack of per-frame poses
    accumulated so far; persisting it keeps a resumed scan's
    trajectory.npz identical to an uninterrupted one (frame k at row k).
    """
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    manifest = {
        "schema_version": SCAN_SCHEMA_VERSION,
        "fingerprint": _state_fingerprint(state),
        "frame_index": int(frame_index),
        "intrinsics": {
            "width": intr.width,
            "height": intr.height,
            "fx": intr.fx,
            "fy": intr.fy,
            "cx": intr.cx,
            "cy": intr.cy,
        },
    }
    arrays = {
        "volume_data": np.asarray(state.volume.data),
        "volume_origin": np.asarray(state.volume.origin),
        "volume_voxel_size": np.asarray(state.volume.voxel_size),
        "volume_trunc": np.asarray(state.volume.trunc),
        "planes": np.asarray(state.planes),
        "pose": np.asarray(state.pose),
        "model_maps": np.asarray(state.model_maps),
        "model_pose": np.asarray(state.model_pose),
        "state_frame_index": np.asarray(state.frame_index),
        "last_rmse": np.asarray(state.last_rmse),
        "last_corr": np.asarray(state.last_corr),
        "last_tracked": np.asarray(state.last_tracked),
        "trajectory": (
            np.zeros((0, 4, 4), np.float32)
            if trajectory is None
            else np.asarray(trajectory, np.float32)
        ),
    }
    np.savez_compressed(path, manifest=json.dumps(manifest), **arrays)
    return path


def load_scan_state(
    path: Union[str, Path], intr: Optional[Intrinsics] = None
) -> Tuple[KinFuState, int, np.ndarray]:
    """Load a scan checkpoint; returns (state, next_frame_index,
    trajectory) where trajectory is the (next_frame_index, 4, 4) pose
    stack accumulated before the checkpoint (empty for migrated v1
    checkpoints, which did not store it).

    Refuses checkpoints from a different schema version, state layout,
    or camera intrinsics (the structural-fingerprint guard). v1
    checkpoints migrate in place (their extra velocity field is
    dropped).
    """
    with np.load(Path(path), allow_pickle=False) as z:
        manifest = json.loads(str(z["manifest"]))
        if manifest["schema_version"] not in (1, 2, 3, SCAN_SCHEMA_VERSION):
            raise ValueError(
                f"scan checkpoint schema v{manifest['schema_version']} != "
                f"supported v{SCAN_SCHEMA_VERSION}"
            )
        if intr is not None:
            mi = manifest["intrinsics"]
            got = (mi["width"], mi["height"], mi["fx"], mi["fy"], mi["cx"], mi["cy"])
            want = (intr.width, intr.height, intr.fx, intr.fy, intr.cx, intr.cy)
            if got != want:
                raise ValueError(
                    f"scan checkpoint intrinsics {got} do not match the "
                    f"stream's {want}"
                )
        version = manifest["schema_version"]
        # Structural validation for every version: v4 gets the exact
        # fingerprint check below; v1-v3 predate the fingerprint, so a
        # stale or layout-divergent file is caught by verifying the
        # arrays that version's layout must contain before migrating.
        required = [
            "volume_data", "volume_origin", "volume_voxel_size",
            "volume_trunc", "planes", "pose", "model_pose",
            "state_frame_index", "last_rmse", "last_corr",
        ]
        required += (
            ["model_maps"]
            if version >= 3
            else ["model_vertices", "model_normals", "model_valid"]
        )
        if version >= 2:
            required.append("trajectory")
        missing = [k for k in required if k not in z.files]
        if missing:
            raise ValueError(
                f"v{version} scan checkpoint is missing arrays {missing} "
                "(stale or layout-divergent file; refusing unsafe resume)"
            )
        vol = TsdfVolume(
            data=jnp.asarray(z["volume_data"]),
            origin=jnp.asarray(z["volume_origin"]),
            voxel_size=jnp.asarray(z["volume_voxel_size"]),
            trunc=jnp.asarray(z["volume_trunc"]),
        )
        if version >= 3:
            model_maps = jnp.asarray(z["model_maps"])
        else:
            # v1/v2 migration: pack the three interleaved model arrays
            # (the depth row is not stored in old checkpoints; it is
            # only consumed by exports, never by the tracker, so zeros
            # are safe).
            from housescan_tpu.kinfu import maps as mp

            model_maps = mp.model_from_hwc(
                jnp.asarray(z["model_vertices"]),
                jnp.asarray(z["model_normals"]),
                jnp.asarray(z["model_valid"]),
                jnp.zeros(z["model_valid"].shape, jnp.float32),
            )
        state = KinFuState(
            volume=vol,
            planes=jnp.asarray(z["planes"]),
            pose=jnp.asarray(z["pose"]),
            model_maps=model_maps,
            model_pose=jnp.asarray(z["model_pose"]),
            frame_index=jnp.asarray(z["state_frame_index"]),
            last_rmse=jnp.asarray(z["last_rmse"]),
            last_corr=jnp.asarray(z["last_corr"]),
            # v1-v3 migration: the flag did not exist; a checkpoint was
            # only ever written after successfully fused frames.
            last_tracked=(
                jnp.asarray(z["last_tracked"])
                if version == SCAN_SCHEMA_VERSION
                else jnp.asarray(True)
            ),
        )
        if version == SCAN_SCHEMA_VERSION:
            if _state_fingerprint(state) != manifest["fingerprint"]:
                raise ValueError(
                    "scan checkpoint layout does not match the current "
                    "KinFuState schema (refusing unsafe resume)"
                )
            trajectory = np.asarray(z["trajectory"], np.float32)
        elif version in (2, 3):
            trajectory = np.asarray(z["trajectory"], np.float32)
        else:
            # v1: same arrays plus a velocity field we drop; the stored
            # fingerprint names the old layout, so validate structurally
            # by array presence instead. No trajectory.
            if "velocity" not in z.files:
                raise ValueError("v1 scan checkpoint missing velocity field")
            trajectory = np.zeros((0, 4, 4), np.float32)
        return state, int(manifest["frame_index"]), trajectory
