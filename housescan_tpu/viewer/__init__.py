from housescan_tpu.viewer.scene import PickResult, pick, visible_objects
from housescan_tpu.viewer.render import render_scene

__all__ = ["PickResult", "pick", "visible_objects", "render_scene"]
