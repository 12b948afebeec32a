from housescan_tpu.cli.main import main

__all__ = ["main"]
