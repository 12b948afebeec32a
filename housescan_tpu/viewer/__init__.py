from housescan_tpu.viewer.scene import PickResult, pick, visible_objects
from housescan_tpu.viewer.render import frame_scene, look_at_pose, render_scene

__all__ = [
    "PickResult",
    "pick",
    "visible_objects",
    "render_scene",
    "look_at_pose",
    "frame_scene",
]
