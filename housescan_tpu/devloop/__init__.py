from housescan_tpu.devloop.reload import (
    get_state,
    reload_framework,
    run_watched,
    store_state,
)

__all__ = ["get_state", "store_state", "reload_framework", "run_watched"]
