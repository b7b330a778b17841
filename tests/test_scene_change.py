"""Scene-change detection inserts keyframes at cuts."""

import numpy as np

from tpu_vp9.api import Vp9Encoder
from tpu_vp9.config import EncoderConfig, PredStructure
from tpu_vp9.utils.yuv import Frame420


def cut_sequence():
    rng = np.random.default_rng(0)
    a = rng.integers(0, 120, (96, 128)).astype(np.uint8)
    b = rng.integers(135, 255, (96, 128)).astype(np.uint8)  # hard cut
    frames = []
    for t in range(6):
        y = (a if t < 3 else b).copy()
        y[0, 0] = t  # tiny change so frames differ
        frames.append(Frame420(y=y, u=np.full((48, 64), 128, np.uint8),
                               v=np.full((48, 64), 128, np.uint8)))
    return frames


def test_cut_inserts_keyframe():
    enc = Vp9Encoder()
    enc.set_parameter(EncoderConfig(source_width=128, source_height=96,
                                    frame_rate=30, qp=40, enc_mode=8,
                                    intra_period=255,
        pred_structure=PredStructure.LOW_DELAY_P,
        hierarchical_levels=0))
    enc.init()
    kinds = []
    for fr in cut_sequence():
        enc.send_picture(fr)
        kinds.append(enc.get_packet().is_keyframe)
    assert kinds[0] is True
    assert kinds[3] is True  # the cut
    assert kinds[1] is False and kinds[2] is False


def test_no_false_cuts_on_still():
    enc = Vp9Encoder()
    enc.set_parameter(EncoderConfig(source_width=128, source_height=96,
                                    frame_rate=30, qp=40, enc_mode=8,
                                    intra_period=255,
        pred_structure=PredStructure.LOW_DELAY_P,
        hierarchical_levels=0))
    enc.init()
    rng = np.random.default_rng(1)
    base = rng.integers(0, 255, (96, 128)).astype(np.uint8)
    kinds = []
    for t in range(5):
        y = base.copy()
        y[t, t] = 255 - y[t, t]
        enc.send_picture(Frame420(y=y, u=np.full((48, 64), 128, np.uint8),
                                  v=np.full((48, 64), 128, np.uint8)))
        kinds.append(enc.get_packet().is_keyframe)
    assert kinds == [True, False, False, False, False]


def test_fade_not_cut():
    """Luminance ramps must NOT trigger (FADE_TH rejection,
    EbPictureDecisionProcess.c:281)."""
    from tpu_vp9.pipeline.picture_decision import SceneChangeDetector

    rng = np.random.default_rng(2)
    base = rng.integers(0, 200, (192, 256)).astype(np.int16)
    det = SceneChangeDetector()
    fired = []
    for t in range(12):
        y = np.clip(base + 2 * t, 0, 255).astype(np.uint8)  # slow fade
        fired.append(det.is_scene_change(y))
    assert not any(fired)


def test_noise_insertion_not_cut():
    """Noise appearing on a high-variance scene rides the noisy-scene
    threshold (NOISE_VARIANCE_TH gate) and must not cut."""
    from tpu_vp9.pipeline.picture_decision import SceneChangeDetector

    rng = np.random.default_rng(3)
    base = rng.integers(0, 255, (192, 256)).astype(np.int16)
    det = SceneChangeDetector()
    fired = []
    for t in range(8):
        noise = rng.integers(-6, 7, base.shape) if t >= 4 else 0
        y = np.clip(base + noise, 0, 255).astype(np.uint8)
        fired.append(det.is_scene_change(y))
    assert not any(fired)


def test_regional_cut_triggers():
    """A true full-frame content change trips the 50% region count."""
    from tpu_vp9.pipeline.picture_decision import SceneChangeDetector

    rng = np.random.default_rng(4)
    a = rng.integers(0, 110, (192, 256)).astype(np.uint8)
    b = rng.integers(140, 255, (192, 256)).astype(np.uint8)
    det = SceneChangeDetector()
    assert det.is_scene_change(a) is False
    assert det.is_scene_change(a) is False
    assert det.is_scene_change(b) is True
