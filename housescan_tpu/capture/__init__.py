from housescan_tpu.capture.replay import DepthStream, ReplaySource, record_stream

__all__ = ["DepthStream", "ReplaySource", "record_stream"]
