"""Bit-accurate simulation of libvpx's vpx_reader + VP9 compressed-header
parse, for debugging conformance mismatches against the system libvpx.

The arithmetic mirrors vpx_dsp/bitreader.h (LOTS_OF_BITS bookkeeping
included) so `has_error()` matches libvpx's overrun detection exactly.
"""

BD_VALUE_SIZE = 64
LOTS_OF_BITS = 0x40000000
NORM = [0] * 256
for _i in range(1, 256):
    n = 0
    v = _i
    while v < 128:
        v <<= 1
        n += 1
    NORM[_i] = n


class VpxReader:
    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.value = 0
        self.count = -8
        self.range = 255
        self.fill()
        # vpx_reader_init reads one marker bit (must be 0)
        self.marker_error = self.read(128) != 0

    def fill(self):
        # faithful port of vpx_reader_fill's slow path (the fast path is
        # an equivalent 64-bit-load optimization)
        bits_left = (len(self.data) - self.pos) * 8
        shift = BD_VALUE_SIZE - 8 - (self.count + 8)
        bits_over = shift + 8 - bits_left
        loop_end = 0
        if bits_over >= 0:
            self.count += LOTS_OF_BITS
            loop_end = bits_over
        if bits_over < 0 or bits_left:
            while shift >= loop_end:
                self.count += 8
                self.value |= self.data[self.pos] << shift
                self.pos += 1
                shift -= 8

    def read(self, prob: int) -> int:
        split = (self.range * prob + (256 - prob)) >> 8
        if self.count < 0:
            self.fill()
        bigsplit = split << (BD_VALUE_SIZE - 8)
        if self.value >= bigsplit:
            self.range -= split
            self.value -= bigsplit
            bit = 1
        else:
            self.range = split
            bit = 0
        shift = NORM[self.range]
        self.value = (self.value << shift) & ((1 << BD_VALUE_SIZE) - 1)
        self.count -= shift
        self.range <<= shift
        return bit

    def read_bit(self):
        return self.read(128)

    def read_literal(self, bits):
        v = 0
        for _ in range(bits):
            v = (v << 1) | self.read_bit()
        return v

    def has_error(self):
        return BD_VALUE_SIZE < self.count < LOTS_OF_BITS


def decode_uniform(r):
    m = 65
    v = r.read_literal(7)
    return v if v < m else (v << 1) - m + r.read_bit()


def decode_term_subexp(r):
    if not r.read_bit():
        return r.read_literal(4)
    if not r.read_bit():
        return r.read_literal(4) + 16
    if not r.read_bit():
        return r.read_literal(5) + 32
    return decode_uniform(r) + 64


def diff_update(r, trace, name, prob=252):
    if r.read(prob):
        d = decode_term_subexp(r)
        trace.append((name, d, r.pos))
        return d
    return None


def mv_update(r, trace, name):
    # update_mv_probs: flag @252, then 7-bit literal (NOT subexp)
    if r.read(252):
        v = (r.read_literal(7) << 1) | 1
        trace.append((name, v, r.pos))
        return v
    return None


def read_compressed_header(data: bytes, *, lossless, intra_only,
                           interp_switchable, sign_bias, allow_hp,
                           trace=None):
    """Returns (trace, reference_mode, tx_mode, has_error).

    sign_bias must be the 3 REFERENCE-frame biases only (LAST, GOLDEN,
    ALTREF — what libvpx's is_compound_reference_allowed compares); do
    not pass a 4-entry array including the INTRA_FRAME slot, or an
    all-bias-1 input would wrongly enable compound parsing.  It must
    also already reflect setup_past_independence: error-resilient
    frames zero the biases, so pass (0, 0, 0) for those.
    """
    sign_bias = tuple(sign_bias)
    assert len(sign_bias) == 3, "pass LAST/GOLDEN/ALTREF biases only"
    r = VpxReader(data)
    tr = trace if trace is not None else []
    if lossless:
        tx_mode = 0
    else:
        tx_mode = r.read_literal(2)
        if tx_mode == 3:
            tx_mode += r.read_bit()
    if tx_mode == 4:  # TX_MODE_SELECT
        for n in (2 * 1, 2 * 2, 2 * 3):
            for i in range(n):
                diff_update(r, tr, f"txp{n}.{i}")
    max_tx = min(tx_mode, 3)
    for ts in range(max_tx + 1):
        if r.read_bit():
            for pt in range(2):
                for ref in range(2):
                    for band in range(6):
                        for ctx in range(6 if band else 3):
                            for node in range(3):
                                diff_update(
                                    r, tr,
                                    f"coef{ts}.{pt}{ref}{band}{ctx}{node}")
    for i in range(3):
        diff_update(r, tr, f"skip{i}")
    reference_mode = 0
    if not intra_only:
        for i in range(7 * 3):
            diff_update(r, tr, f"inter_mode{i}")
        if interp_switchable:
            for i in range(4 * 2):
                diff_update(r, tr, f"interp{i}")
        for i in range(4):
            diff_update(r, tr, f"intra_inter{i}")
        if len(set(sign_bias)) > 1:
            if r.read_bit():
                reference_mode = 2 if r.read_bit() else 1
        if reference_mode == 2:
            for i in range(5):
                diff_update(r, tr, f"comp_inter{i}")
        if reference_mode != 1:
            for i in range(10):
                diff_update(r, tr, f"single_ref{i}")
        if reference_mode != 0:
            for i in range(5):
                diff_update(r, tr, f"comp_ref{i}")
        for i in range(4 * 9):
            diff_update(r, tr, f"y_mode{i}")
        for i in range(16 * 3):
            diff_update(r, tr, f"partition{i}")
        for i in range(3):
            mv_update(r, tr, f"mvjoint{i}")
        for c in range(2):
            mv_update(r, tr, f"mvsign{c}")
            for i in range(10):
                mv_update(r, tr, f"mvclass{c}.{i}")
            mv_update(r, tr, f"mvclass0_{c}")
            for i in range(10):
                mv_update(r, tr, f"mvbits{c}.{i}")
        for c in range(2):
            for i in range(6):
                mv_update(r, tr, f"mvclass0fp{c}.{i}")
            for i in range(3):
                mv_update(r, tr, f"mvfp{c}.{i}")
        if allow_hp:
            for c in range(2):
                mv_update(r, tr, f"mvhp{c}.0")
                mv_update(r, tr, f"mvhp{c}.1")
    # marker-bit rejection is part of libvpx's reader init (first bool
    # bit must decode 0), so surface it in the error flag
    return tr, reference_mode, tx_mode, r.has_error() or r.marker_error
