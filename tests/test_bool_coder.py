"""Round-trip and edge-case tests for the boolean range coder."""

import numpy as np
import pytest

from tpu_vp9.bitstream.bool_coder import BoolDecoder, BoolEncoder


def roundtrip(bits, probs):
    enc = BoolEncoder()
    for b, p in zip(bits, probs):
        enc.put_bit(int(b), int(p))
    data = enc.finalize()
    dec = BoolDecoder(data)
    out = [dec.read_bit(int(p)) for p in probs]
    return data, out


def test_empty_partition():
    enc = BoolEncoder()
    data = enc.finalize()
    assert len(data) >= 1
    BoolDecoder(data)  # clear bit decodes as 0


def test_simple_roundtrip():
    bits = [0, 1, 1, 0, 1, 0, 0, 0, 1, 1]
    probs = [128] * 10
    _, out = roundtrip(bits, probs)
    assert out == bits


@pytest.mark.parametrize("seed", range(5))
def test_random_roundtrip(seed):
    rng = np.random.default_rng(seed)
    n = 5000
    probs = rng.integers(1, 256, size=n)
    bits = (rng.random(n) * 256 > probs).astype(int)  # biased per prob
    _, out = roundtrip(bits, probs)
    assert out == bits.tolist()


def test_skewed_probs_carry_paths():
    # Long runs of likely symbols stress the carry/0xff propagation.
    n = 4000
    bits = [0] * n
    probs = [255] * n
    _, out = roundtrip(bits, probs)
    assert out == bits
    bits = [1] * n
    probs = [1] * n
    _, out = roundtrip(bits, probs)
    assert out == bits


def test_literals():
    enc = BoolEncoder()
    values = [(0, 1), (1, 1), (255, 8), (1234, 11), (0, 4), (63, 6)]
    for v, b in values:
        enc.put_literal(v, b)
    dec = BoolDecoder(enc.finalize())
    for v, b in values:
        assert dec.read_literal(b) == v


def test_first_byte_below_0x80():
    # Clear bit guarantees the first byte can't look like a marker.
    rng = np.random.default_rng(42)
    for _ in range(20):
        n = int(rng.integers(1, 200))
        bits = rng.integers(0, 2, size=n)
        probs = rng.integers(1, 256, size=n)
        data, _ = roundtrip(bits, probs)
        assert data[0] < 0x80


def test_no_superframe_marker_collision():
    # Final byte must never look like a superframe marker (0b110xxxxx).
    rng = np.random.default_rng(7)
    for _ in range(50):
        n = int(rng.integers(1, 400))
        bits = rng.integers(0, 2, size=n)
        probs = rng.integers(1, 256, size=n)
        data, _ = roundtrip(bits, probs)
        assert (data[-1] & 0xE0) != 0xC0


def test_compression_ratio_sanity():
    # Encoding highly predictable bits must cost well under 1 bit each.
    n = 8000
    enc = BoolEncoder()
    for _ in range(n):
        enc.put_bit(0, 250)
    data = enc.finalize()
    assert len(data) * 8 < n * 0.2
