"""SAM2 model family: Hiera shapes, window partition roundtrip, and the
streaming predictor end-to-end through the reference 4-call API with the
tiny config (BASELINE.json config-2 smoke analog)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from videovanish_tpu.config import tiny_config
from videovanish_tpu.models.sam2.hiera import (
    window_partition, window_unpartition,
)


def test_window_partition_roundtrip(rng):
    x = jnp.asarray(rng.standard_normal((2, 10, 14, 8)).astype(np.float32))
    w, hw_pad = window_partition(x, 4)
    back = window_unpartition(w, 4, hw_pad, (10, 14))
    np.testing.assert_allclose(np.asarray(back), np.asarray(x))


class TestPredictorTiny:
    @pytest.fixture(scope="class")
    def predictor(self):
        from videovanish_tpu.models.sam2.predictor import (
            build_sam2_video_predictor,
        )
        return build_sam2_video_predictor(config=tiny_config().sam2)

    @pytest.fixture(scope="class")
    def video(self):
        rng = np.random.default_rng(3)
        T, H, W = 6, 96, 128
        frames = []
        for t in range(T):
            f = (rng.random((H, W, 3)) * 80).astype(np.uint8)
            f[30:60, 40 + 4 * t:70 + 4 * t] = 220  # bright moving square
            frames.append(f)
        return frames

    def test_full_streaming_api(self, predictor, video):
        H, W = video[0].shape[:2]
        state = predictor.init_state(video_path=video)
        fidx, obj_ids, logits = predictor.add_new_points_or_box(
            inference_state=state, frame_idx=0, obj_id=1,
            points=np.array([[55.0, 45.0]], np.float32),
            labels=np.array([1], np.int32))
        assert fidx == 0 and obj_ids == [1]
        assert logits.shape == (1, H, W)

        # box for a second object
        predictor.add_new_points_or_box(
            inference_state=state, frame_idx=0, obj_id=2,
            box=np.array([5.0, 5.0, 30.0, 30.0], np.float32))

        outs = list(predictor.propagate_in_video(state))
        assert len(outs) == len(video)
        frame_idxs = [o[0] for o in outs]
        assert frame_idxs == list(range(len(video)))
        t0, ids, masks = outs[0]
        assert ids == [1, 2]
        assert len(masks) == 2 and masks[0].shape == (H, W)
        assert masks[0].dtype == np.float32

    def test_propagation_deterministic(self, predictor, video):
        def run():
            state = predictor.init_state(video_path=video)
            predictor.add_new_points_or_box(
                inference_state=state, frame_idx=1, obj_id=1,
                points=np.array([[60.0, 45.0]], np.float32),
                labels=np.array([1], np.int32))
            return [m[0] for _, _, m in predictor.propagate_in_video(state)]

        a, b = run(), run()
        for x, y in zip(a, b):
            np.testing.assert_array_equal(x, y)

    def test_propagation_starts_at_first_prompt(self, predictor, video):
        state = predictor.init_state(video_path=video)
        predictor.add_new_points_or_box(
            inference_state=state, frame_idx=2, obj_id=1,
            points=np.array([[60.0, 45.0]], np.float32),
            labels=np.array([1], np.int32))
        outs = list(predictor.propagate_in_video(state))
        assert [o[0] for o in outs] == [2, 3, 4, 5]

    def test_no_prompts_yields_nothing(self, predictor, video):
        state = predictor.init_state(video_path=video)
        assert list(predictor.propagate_in_video(state)) == []


def test_masker_pipeline_tiny(rng):
    """run_sam2_on_frames end-to-end with the reference annotation schema."""
    from videovanish_tpu.pipeline import infill
    from videovanish_tpu.config import tiny_config
    from videovanish_tpu.pipeline import masker
    infill.set_config(tiny_config())
    masker.reset_predictor()
    try:
        T, H, W = 4, 64, 96
        frames = [(rng.random((H, W, 3)) * 100).astype(np.uint8)
                  for _ in range(T)]
        ann = {"keyframes": [{
            "frame_idx": 0,
            "pos_clicks": [{"x": 0.5, "y": 0.5, "obj": 1}],
            "neg_clicks": [{"x": 0.1, "y": 0.1, "obj": 1}],
            "rects": [{"x": 0.1, "y": 0.1, "w": 0.3, "h": 0.3, "obj": 2}],
        }]}
        out = masker.run_sam2_on_frames(frames, ann)
        assert len(out) == T and out[0].shape == (H, W, 3)
        assert out[0].dtype == np.uint8
    finally:
        infill.set_config(None)
        masker.reset_predictor()


def test_reverse_propagation(rng):
    from videovanish_tpu.models.sam2.predictor import (
        build_sam2_video_predictor,
    )
    pred = build_sam2_video_predictor(config=tiny_config().sam2)
    T, H, W = 5, 64, 64
    frames = [(rng.random((H, W, 3)) * 100).astype(np.uint8)
              for _ in range(T)]
    state = pred.init_state(video_path=frames)
    pred.add_new_points_or_box(
        inference_state=state, frame_idx=3, obj_id=1,
        points=np.array([[30.0, 30.0]], np.float32),
        labels=np.array([1], np.int32))
    outs = list(pred.propagate_in_video(state, reverse=True))
    assert [o[0] for o in outs] == [3, 2, 1, 0]


def test_propagation_across_chunk_boundary(rng):
    """Propagation batch-encodes frames in ENCODE_CHUNK-sized uploads;
    cross the boundary (T > chunk) and check every frame comes back in
    order with finite masks, and that a T=chunk+2 run equals a re-run
    (the padded last chunk must not leak into earlier frames)."""
    from videovanish_tpu.models.sam2.predictor import (
        ENCODE_CHUNK, build_sam2_video_predictor,
    )
    pred = build_sam2_video_predictor(config=tiny_config().sam2)
    T = ENCODE_CHUNK + 2
    frames = [(rng.random((48, 64, 3)) * 120).astype(np.uint8)
              for _ in range(T)]
    state = pred.init_state(video_path=frames)
    pred.add_new_points_or_box(
        inference_state=state, frame_idx=0, obj_id=1,
        points=np.array([[30.0, 20.0]], np.float32),
        labels=np.array([1], np.int32))
    outs = list(pred.propagate_in_video(state))
    assert [o[0] for o in outs] == list(range(T))
    assert all(np.isfinite(m[0]).all() for _, _, m in outs)


def test_yuv_wire_features_close_to_rgb(rng):
    """The yuv420 wire (2x fewer upload bytes) must encode to features
    close to the exact-RGB path: chroma subsampling is the only delta
    and the backbone should not amplify it."""
    from videovanish_tpu.models.sam2.predictor import (
        build_sam2_video_predictor,
    )
    pred = build_sam2_video_predictor(config=tiny_config().sam2)
    # smooth image + a sharp edge (worst case for 2x2 chroma pooling)
    H, W = 64, 96
    yy, xx = np.mgrid[0:H, 0:W].astype(np.float32)
    img = np.stack([xx / W * 255, yy / H * 255,
                    (xx + yy) / (H + W) * 255], -1)
    img[20:40, 30:60] = [200.0, 40.0, 90.0]
    img = img.astype(np.uint8)[None]
    fns = pred._fns(H, W)
    encode_rgb, encode_yuv = fns[0], fns[3]
    from videovanish_tpu.ops.colorspace import rgb_to_yuv420_host
    a = encode_rgb(pred.params, img)
    b = encode_yuv(pred.params, rgb_to_yuv420_host(img))
    for fa, fb in zip(a, b):
        fa, fb = np.asarray(fa), np.asarray(fb)
        rel = np.linalg.norm(fa - fb) / (np.linalg.norm(fa) + 1e-8)
        assert rel < 0.05, rel


def test_nstep_ckpt_sets_inference_steps():
    from videovanish_tpu.models.diffueraser import DiffuEraser
    m = DiffuEraser(config=tiny_config().diffueraser, ckpt="4-Step")
    assert m.cfg.num_inference_steps == 4
    m2 = DiffuEraser(config=tiny_config().diffueraser, ckpt="2-Step")
    assert m2.cfg.num_inference_steps == 2


def test_clear_old_points_replaces_clicks(rng):
    from videovanish_tpu.models.sam2.predictor import (
        build_sam2_video_predictor,
    )
    pred = build_sam2_video_predictor(config=tiny_config().sam2)
    frames = [(rng.random((48, 64, 3)) * 100).astype(np.uint8)
              for _ in range(2)]
    state = pred.init_state(video_path=frames)
    pred.add_new_points_or_box(
        inference_state=state, frame_idx=0, obj_id=1,
        points=np.array([[10.0, 10.0]], np.float32),
        labels=np.array([1], np.int32))
    pred.add_new_points_or_box(
        inference_state=state, frame_idx=0, obj_id=1,
        points=np.array([[30.0, 30.0]], np.float32),
        labels=np.array([1], np.int32))
    e = state["prompts"][0][1]
    # one click kept (replaced), stored in model coords (scaled by S/W0)
    scale_x = tiny_config().sam2.image_size / 64
    assert len(e["pts"]) == 1 and e["pts"][0][0] == 30.0 * scale_x
    # a box coexists with clicks; a second box replaces the first
    pred.add_new_points_or_box(
        inference_state=state, frame_idx=0, obj_id=1,
        box=np.array([1.0, 1.0, 20.0, 20.0], np.float32))
    pred.add_new_points_or_box(
        inference_state=state, frame_idx=0, obj_id=1,
        box=np.array([2.0, 2.0, 22.0, 22.0], np.float32))
    e = state["prompts"][0][1]
    assert sorted(e["labels"]) == [1, 2, 3]


class TestRope:
    def test_rope_preserves_norm_and_relativity(self, rng):
        import jax.numpy as jnp
        from videovanish_tpu.ops.rope import apply_rope, axial_rope_tables
        side, D = 4, 8
        sin, cos = axial_rope_tables(side, side, D)
        x = rng.standard_normal((1, 2, side * side, D)).astype(np.float32)
        r = np.asarray(apply_rope(jnp.asarray(x), jnp.asarray(sin),
                                  jnp.asarray(cos)))
        # rotation preserves the norm of every token vector
        np.testing.assert_allclose(np.linalg.norm(r, axis=-1),
                                   np.linalg.norm(x, axis=-1), rtol=1e-5)
        # relative property: <rope(q), rope(k)> depends only on coordinate
        # delta — same-delta pairs along x give identical dot products
        q = rng.standard_normal((D,)).astype(np.float32)
        k = rng.standard_normal((D,)).astype(np.float32)
        def rot(v, pos):
            return np.asarray(apply_rope(
                jnp.asarray(v[None]), jnp.asarray(sin[pos:pos+1]),
                jnp.asarray(cos[pos:pos+1])))[0]
        # positions 0,1 and 1,2 (same row, delta 1 in x)
        d01 = rot(q, 0) @ rot(k, 1)
        d12 = rot(q, 1) @ rot(k, 2)
        np.testing.assert_allclose(d01, d12, rtol=1e-4)

    def test_predictor_with_rope_runs(self, rng):
        from videovanish_tpu.models.sam2.predictor import (
            build_sam2_video_predictor,
        )
        pred = build_sam2_video_predictor(config=tiny_config().sam2)
        frames = [(rng.random((48, 64, 3)) * 120).astype(np.uint8)
                  for _ in range(3)]
        st = pred.init_state(video_path=frames)
        pred.add_new_points_or_box(
            inference_state=st, frame_idx=0, obj_id=1,
            points=np.array([[30.0, 20.0]], np.float32),
            labels=np.array([1], np.int32))
        outs = list(pred.propagate_in_video(st))
        assert len(outs) == 3
        assert all(np.isfinite(m[0]).all() for _, _, m in outs)
