"""Picture analysis + source-based-ops tests."""

import numpy as np

from tpu_vp9.pipeline.picture_analysis import (
    PictureStats, analyze_picture, block_mean_variance,
    build_decimation_pyramid, decimate2, denoise_weak,
    estimate_noise_level, luma_histogram, skin_grass_maps,
)
from tpu_vp9.utils.yuv import Frame420, synthetic_frames


def test_decimation_pyramid_shapes():
    y = np.arange(64 * 96, dtype=np.uint8).reshape(64, 96)
    full, quarter, sixteenth = build_decimation_pyramid(y)
    assert quarter.shape == (32, 48) and sixteenth.shape == (16, 24)
    flat = np.full((16, 16), 77, np.uint8)
    assert (decimate2(flat) == 77).all()


def test_block_mean_variance():
    y = np.zeros((32, 32), np.uint8)
    y[:16, :16] = 100
    y[16:, 16:] = np.tile([0, 200], (16, 8))
    mean, var = block_mean_variance(y, 16)
    assert mean.shape == (2, 2)
    assert mean[0, 0] == 100 and var[0, 0] == 0
    assert var[1, 1] > 5000


def test_noise_estimate_and_denoise():
    rng = np.random.default_rng(0)
    clean = np.full((64, 64), 128, np.uint8)
    assert estimate_noise_level(clean) < 0.5
    noisy = np.clip(clean.astype(np.int16)
                    + rng.integers(-10, 11, clean.shape), 0, 255) \
        .astype(np.uint8)
    assert estimate_noise_level(noisy) > 2.0
    den = denoise_weak(noisy)
    assert den.shape == noisy.shape
    assert den.astype(np.int32).var() < noisy.astype(np.int32).var()


def test_histogram_and_skin():
    y = np.full((32, 32), 255, np.uint8)
    h = luma_histogram(y)
    assert h.sum() == 32 * 32 and h[-1] == 32 * 32
    u = np.full((16, 16), 110, np.uint8)
    v = np.full((16, 16), 150, np.uint8)
    sk, gr = skin_grass_maps(y, u, v, 16)
    assert (sk == 1.0).all()  # u=110,v=150 is inside the skin box


def test_analyze_picture_and_lambda_map():
    fr = list(synthetic_frames(128, 96, 1, seed=0))[0]
    stats = analyze_picture(fr)
    assert isinstance(stats, PictureStats)
    lam = stats.sb_lambda_map()
    assert lam.shape == (96 // 64 or 1, 128 // 64)
    assert (lam >= 0.7).all() and (lam <= 1.4).all()


def test_qpm_stream_still_bitexact():
    """QPM modulates encoder-side lambda only: streams stay conformant."""
    import io

    from tpu_vp9.api import Vp9Encoder
    from tpu_vp9.bitstream.ivf import write_ivf_frame, write_ivf_header
    from tpu_vp9.config import EncoderConfig
    from tpu_vp9.decoder.decoder import decode_ivf

    frames = list(synthetic_frames(128, 96, 6, seed=1, motion=True))
    cfg = EncoderConfig(source_width=128, source_height=96, qp=42,
                        enc_mode=4, hierarchical_levels=2)
    enc = Vp9Encoder()
    enc.set_parameter(cfg)
    enc.init()
    assert enc._sig.qpm
    enc._ra.keep_recon = True
    for f in frames:
        enc.send_picture(f)
    enc.flush()
    buf = io.BytesIO()
    write_ivf_header(buf, 128, 96, 30, 1)
    while True:
        p = enc.get_packet()
        if p is None:
            break
        write_ivf_frame(buf, p.data, p.pts)
    buf.seek(0)
    mism = 0
    for i, (y, u, v, h) in enumerate(decode_ivf(buf)):
        ry, ru, rv = enc._ra.recon_log[i]
        mism += int((y != ry).sum() + (u != ru).sum() + (v != rv).sum())
    assert mism == 0


def test_denoise_strong_smooths_more_than_weak():
    from tpu_vp9.pipeline.picture_analysis import (
        denoise_strong, denoise_weak, estimate_noise_level,
    )

    rng = np.random.default_rng(4)
    base = np.full((64, 64), 120, np.uint8)
    noisy = np.clip(base.astype(np.int32)
                    + rng.integers(-40, 41, base.shape), 0, 255
                    ).astype(np.uint8)
    nw = estimate_noise_level(denoise_weak(noisy))
    ns = estimate_noise_level(denoise_strong(noisy))
    n0 = estimate_noise_level(noisy)
    assert ns < nw < n0
    assert denoise_strong(noisy).dtype == np.uint8


def test_aura_map_flags_isolated_activity():
    from tpu_vp9.pipeline.picture_analysis import aura_map

    var16 = np.full((8, 8), 10.0)
    var16[3, 4] = 5000.0  # isolated busy block in flat surroundings
    m = aura_map(var16)
    assert m[3, 4]
    assert m.sum() == 1
    # a uniformly busy picture has no aura
    assert not aura_map(np.full((8, 8), 5000.0)).any()


def test_dark_density_and_high_contrast():
    from tpu_vp9.pipeline.picture_analysis import (
        dark_area_density, high_contrast_maps,
    )

    y = np.full((64, 64), 200, np.uint8)
    y[:16, :16] = 10  # one dark block
    d = dark_area_density(y)
    assert d[0, 0] == 1.0 and d[1, 1] == 0.0
    y2 = np.full((64, 64), 100, np.uint8)
    y2[16:32, 16:24] = 255
    y2[16:32, 24:32] = 0  # high dynamic range block
    sp, tm = high_contrast_maps(y2)
    assert sp[1, 1] and not sp[0, 0]
    assert not tm.any()
    _, tm2 = high_contrast_maps(y2, prev_y=np.zeros_like(y2))
    assert tm2.any()


def test_analyze_picture_populates_classifier_maps():
    from tpu_vp9.pipeline.picture_analysis import analyze_picture
    from tpu_vp9.utils.yuv import synthetic_frames

    fr = list(synthetic_frames(64, 64, 1, seed=0))[0]
    stats = analyze_picture(fr)
    assert stats.aura16 is not None and stats.aura16.shape == (4, 4)
    assert stats.dark16 is not None
    assert stats.hc_spatial16 is not None
    lam = stats.sb_lambda_map()
    assert lam.shape == (1, 1) and 0.7 <= float(lam[0, 0]) <= 1.4
