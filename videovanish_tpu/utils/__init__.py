from videovanish_tpu.utils.observability import (
    get_logger, stage_timer, trace_annotation, start_profile, stop_profile,
)

__all__ = ["get_logger", "stage_timer", "trace_annotation",
           "start_profile", "stop_profile"]
