"""run_sam2_on_frames — interactive mask generation + video propagation.

Signature, annotation schema, coordinate handling, and colored-mask
rendering match the reference exactly (sam2_masker.py:43-177): normalized
[0..1] or absolute pixel coords, clicks batched per (frame, obj), rects
as xywh -> xyxy, logits thresholded at 0, per-object HSV colors with
higher obj_id overwriting lower. The predictor underneath is the
TPU-native streaming SAM2 (models/sam2/predictor.py) instead of the
torch fork.

Coordinate ambiguity (kept deliberately, reference sam2_masker.py:91-98):
a value in [0, 1] is ALWAYS treated as normalized, so an absolute pixel
coordinate of 0 or 1 px is indistinguishable from a normalized edge
coordinate. GUI-produced annotations are always normalized, so this only
affects hand-written absolute-pixel JSON at the 1-px border.
"""
from __future__ import annotations

import numpy as np

from videovanish_tpu.core.prog import null_prog
from videovanish_tpu.pipeline.colors import render_colored_masks

predictor = None  # lazy global, like the reference (sam2_masker.py:22)


def _get_predictor():
    global predictor
    if predictor is None:
        from videovanish_tpu.models.sam2 import build_sam2_video_predictor
        from videovanish_tpu.pipeline.infill import _get_config
        predictor = build_sam2_video_predictor(config=_get_config().sam2)
    return predictor


def reset_predictor() -> None:
    global predictor
    predictor = None


def run_sam2_on_frames(frames_rgb, annotations, device=None, prog=None):
    """Segment annotated objects and propagate through the video.

    frames_rgb: list of (H,W,3) RGB uint8 frames.
    annotations: {"keyframes": [{"frame_idx", "pos_clicks": [{x,y,obj}],
                  "neg_clicks": [...], "rects": [{x,y,w,h,obj}]}]}
    device: accepted for reference API parity; ignored (jax picks TPU).
    Returns list of (H,W,3) uint8 colored-mask frames (black background).
    """
    prog = prog or null_prog
    assert isinstance(frames_rgb, (list, tuple)) and len(frames_rgb) > 0, \
        "frames must be a non-empty list"
    H0, W0 = frames_rgb[0].shape[:2]

    prog(1, "Setting up sam2")
    pred = _get_predictor()

    prog(25, "Loading frames in to sam2")
    state = pred.init_state(video_path=frames_rgb)

    # ---- coordinate helpers: accept normalized [0..1] or absolute px ----
    def _to_px_x(x):
        return float(x) * W0 if 0.0 <= x <= 1.0 else float(x)

    def _to_px_y(y):
        return float(y) * H0 if 0.0 <= y <= 1.0 else float(y)

    def denorm_point(x, y):
        return np.array([_to_px_x(x), _to_px_y(y)], dtype=np.float32)

    def denorm_rect(x, y, w, h):
        x1, y1 = _to_px_x(x), _to_px_y(y)
        x2 = _to_px_x(x + w) if 0.0 <= w <= 1.0 else (x1 + float(w))
        y2 = _to_px_y(y + h) if 0.0 <= h <= 1.0 else (y1 + float(h))
        return np.array([min(x1, x2), min(y1, y2), max(x1, x2), max(y1, y2)],
                        dtype=np.float32)

    keyframes = sorted(annotations.get("keyframes", []),
                       key=lambda k: int(k["frame_idx"]))
    for kf in keyframes:
        frame_idx = int(kf["frame_idx"])
        clicks_by_obj: dict[int, dict] = {}

        def _add_click(obj_id, x, y, label):
            d = clicks_by_obj.setdefault(int(obj_id), {"pts": [], "labels": []})
            d["pts"].append(denorm_point(x, y))
            d["labels"].append(label)

        for c in kf.get("pos_clicks", []):
            _add_click(c.get("obj", 1), c["x"], c["y"], 1)
        for c in kf.get("neg_clicks", []):
            _add_click(c.get("obj", 1), c["x"], c["y"], 0)

        for obj_id, d in clicks_by_obj.items():
            pred.add_new_points_or_box(
                inference_state=state,
                frame_idx=frame_idx,
                obj_id=int(obj_id),
                points=np.vstack(d["pts"]).astype(np.float32),
                labels=np.array(d["labels"], dtype=np.int32),
            )
        for r in kf.get("rects", []):
            pred.add_new_points_or_box(
                inference_state=state,
                frame_idx=frame_idx,
                obj_id=int(r.get("obj", 1)),
                box=denorm_rect(r["x"], r["y"], r["w"], r["h"]),
            )

    prog(45, "Infering masks with sam2")
    video_segments = {}
    # binary masks thresholded on device: 4x fewer bytes per frame over
    # the host link than f32 logits (same >0 threshold as the reference,
    # sam2_masker.py:145)
    for out_frame_idx, out_obj_ids, out_masks in \
            pred.propagate_in_video(state, yield_binary=True):
        video_segments[out_frame_idx] = {
            int(obj_id): np.asarray(out_masks[i] > 0)
            for i, obj_id in enumerate(out_obj_ids)
        }

    prog(80, "Creating color mask from sam2 data")
    mask_frames = [
        render_colored_masks(video_segments.get(idx, {}), H0, W0)
        for idx in range(len(frames_rgb))
    ]
    return mask_frames
