from videovanish_tpu.video.io import (
    load_video_frames_from_path,
    write_video_frames_to_path,
)

__all__ = ["load_video_frames_from_path", "write_video_frames_to_path"]
