"""Native FLAC codec — pure stdlib + numpy, no external audio libs.

Closes the audio half of the compressed-codec contract the way
``jpegcodec.py`` closed images: a clean-room encoder/decoder pair for
the FLAC bitstream (magic + STREAMINFO metadata, frame headers with
CRC-8, subframes CONSTANT / VERBATIM / FIXED(0-4) / LPC(1-32) with
wasted-bits, Rice-coded residual partitions in both 4- and 5-bit
parameter variants incl. the escape code, stereo decorrelation
left/side / right/side / mid/side, frame CRC-16), written from the
public FLAC format specification. Exotic variants refuse loudly:
12/20-bit sample sizes raise NotImplementedError; reserved/corrupt
structures raise ValueError.

Reference parity: the reference engine (exit99/easy-etl) has no media
path at all — this belongs to the multimodal extension family
(BASELINE.json north star). The Spark-side plumbing
(multimodal.synth_flac_audio / flac_window_energy) mirrors the WAV
path: Arrow-batched mapInPandas, per-partition, zero shuffle.

Scale: decode is per-blob CPU inside a mapInPandas batch — throughput
scales with executor cores; nothing here ever shuffles or collects.
"""

from __future__ import annotations

import struct

import numpy as np

_SYNC = 0x3FFE  # 14-bit frame sync

#: sample-rate codes 1-11 (0 = use STREAMINFO; 12-14 = inline; 15 bad)
_RATES = {
    1: 88200, 2: 176400, 3: 192000, 4: 8000, 5: 16000, 6: 22050,
    7: 24000, 8: 32000, 9: 44100, 10: 48000, 11: 96000,
}

#: fixed-predictor coefficients by order (residual = s[n] - prediction)
_FIXED = {
    0: [],
    1: [1],
    2: [2, -1],
    3: [3, -3, 1],
    4: [4, -6, 4, -1],
}


def _make_crc_tables():
    t8, t16 = [], []
    for b in range(256):
        c = b
        for _ in range(8):
            c = ((c << 1) ^ 0x07) & 0xFF if c & 0x80 else (c << 1) & 0xFF
        t8.append(c)
        c = b << 8
        for _ in range(8):
            c = ((c << 1) ^ 0x8005) & 0xFFFF if c & 0x8000 else (c << 1) & 0xFFFF
        t16.append(c)
    return tuple(t8), tuple(t16)


_CRC8_TABLE, _CRC16_TABLE = _make_crc_tables()


def _crc8(data: bytes) -> int:
    """CRC-8, poly 0x07, init 0 (FLAC frame-header CRC); table-driven
    (one lookup per byte — the bit loop was the decode bottleneck)."""
    crc = 0
    t = _CRC8_TABLE
    for b in data:
        crc = t[crc ^ b]
    return crc


def _crc16(data: bytes) -> int:
    """CRC-16, poly 0x8005, init 0 (FLAC whole-frame CRC); table-driven."""
    crc = 0
    t = _CRC16_TABLE
    for b in data:
        crc = ((crc << 8) & 0xFF00) ^ t[((crc >> 8) ^ b) & 0xFF]
    return crc


def _sext(v: int, bits: int) -> int:
    return v - (1 << bits) if v >= 1 << (bits - 1) else v


def _utf8_number(n: int) -> bytes:
    """FLAC's UTF-8-style coded frame/sample number (up to 36 bits)."""
    if n < 0x80:
        return bytes([n])
    out = []
    nbytes = 2
    # k-byte form carries 5k+1 payload bits (lead 7-k + 6 per cont.)
    while n >= (1 << (5 * nbytes + 1)) and nbytes < 7:
        nbytes += 1
    for i in range(nbytes - 1):
        out.append(0x80 | (n & 0x3F))
        n >>= 6
    lead_mask = (0xFF00 >> nbytes) & 0xFF
    out.append(lead_mask | n)
    return bytes(reversed(out))


class _BitWriter:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, bits: int) -> None:
        value &= (1 << bits) - 1
        self.acc = (self.acc << bits) | value
        self.nbits += bits
        while self.nbits >= 8:
            self.nbits -= 8
            self.buf.append((self.acc >> self.nbits) & 0xFF)
        self.acc &= (1 << self.nbits) - 1

    def write_unary(self, q: int) -> None:
        while q >= 32:
            self.write(0, 32)
            q -= 32
        self.write(1, q + 1)  # q zero bits then a one

    def align(self) -> None:
        if self.nbits:
            self.write(0, 8 - self.nbits)

    def bytes(self) -> bytes:
        assert self.nbits == 0
        return bytes(self.buf)


class _BitReader:
    def __init__(self, data: bytes, pos: int = 0):
        self.data = data
        self.bitpos = pos * 8

    def read(self, bits: int) -> int:
        end = self.bitpos + bits
        if end > len(self.data) * 8:
            raise ValueError("truncated FLAC stream")
        v = 0
        bp = self.bitpos
        while bits:
            byte = self.data[bp >> 3]
            avail = 8 - (bp & 7)
            take = min(avail, bits)
            shift = avail - take
            v = (v << take) | ((byte >> shift) & ((1 << take) - 1))
            bp += take
            bits -= take
        self.bitpos = bp
        return v

    def read_unary(self) -> int:
        q = 0
        while True:
            if self.bitpos >= len(self.data) * 8:
                raise ValueError("truncated FLAC stream")
            if self.read(1):
                return q
            q += 1

    def read_utf8_number(self) -> int:
        b0 = self.read(8)
        if b0 < 0x80:
            return b0
        n = 0
        mask = 0x40
        while b0 & mask:
            n += 1
            mask >>= 1
        if n == 0:
            raise ValueError("invalid FLAC UTF-8 coded number")
        v = b0 & (mask - 1)
        for _ in range(n):
            c = self.read(8)
            if c & 0xC0 != 0x80:
                raise ValueError("invalid FLAC UTF-8 coded number")
            v = (v << 6) | (c & 0x3F)
        return v

    def align(self) -> None:
        self.bitpos = (self.bitpos + 7) & ~7

    @property
    def bytepos(self) -> int:
        return self.bitpos >> 3


#: toggle for the vectorized decode paths (tests flip it to prove the
#: numpy fast paths are bit-identical to the scalar reference reader)
_VECTORIZED = True


class _FastBits:
    """Whole-stream bit plane for the vectorized decode paths: one
    np.unpackbits per file (MSB-first, matching _BitReader), the sorted
    positions of all 1-bits (the Rice unary terminators live in here),
    and a batched fixed-width gather. Memory: 8 bytes-of-bools per input
    byte — a 5 MB FLAC costs ~40 MB transient, far under executor
    batch headroom."""

    def __init__(self, data: bytes):
        self.bits = np.unpackbits(np.frombuffer(data, dtype=np.uint8))
        self.ones = np.flatnonzero(self.bits).astype(np.int64)

    def read_uint_vec(self, pos: np.ndarray, nbits: int) -> np.ndarray:
        """values[i] = the ``nbits``-wide big-endian uint at bit
        position pos[i]."""
        if nbits == 0 or len(pos) == 0:
            return np.zeros(len(pos), dtype=np.int64)
        idx = pos[:, None] + np.arange(nbits, dtype=np.int64)
        if idx[-1, -1] >= len(self.bits):
            raise ValueError("truncated FLAC stream")
        weights = np.left_shift(
            np.int64(1), np.arange(nbits - 1, -1, -1, dtype=np.int64)
        )
        return self.bits[idx].astype(np.int64) @ weights

    def rice_decode(self, bitpos: int, cnt: int, k: int):
        """Decode ``cnt`` Rice(k) codes starting at ``bitpos``; returns
        (residuals, new_bitpos). FULLY vectorized — no per-code python:

        1. slice the 1-bit positions the partition can possibly touch
           (every consumed 1 is a terminator or sits in a payload, so
           cnt*(k+1)+1 positions bound the partition);
        2. nxt[i] = index of the first 1 at least k+1 bits after 1 #i
           — one searchsorted over the slice. Code c's terminator is
           the c-th element of nxt's orbit from the first 1;
        3. enumerate the orbit for ALL codes at once by pointer
           doubling: J_l = nxt applied 2^l times, then each code
           composes the jump tables along the bits of its index —
           O(log cnt) vectorized passes instead of cnt python steps;
        4. quotients/payloads/zigzag are arithmetic on the terminator
           array (payload bits batch-gathered from the bit plane)."""
        if cnt == 0:
            return np.empty(0, dtype=np.int64), bitpos
        ones = self.ones
        lo = int(np.searchsorted(ones, bitpos))
        local = ones[lo : lo + cnt * (k + 1) + 1]
        m = len(local)
        if m == 0:
            raise ValueError("truncated FLAC stream")
        # nxt over the slice, with a self-absorbing sentinel at index m
        nxt = np.searchsorted(local, local + (1 + k)).astype(np.int64)
        nxt = np.append(nxt, m)
        idx = np.zeros(cnt, dtype=np.int64)  # orbit position of each code
        steps = np.arange(cnt, dtype=np.int64)
        jump = nxt
        bit = 1
        while bit < cnt:
            take = (steps & bit).astype(bool)
            if take.any():
                idx[take] = jump[idx[take]]
            jump = jump[jump]  # sentinel m maps to itself, so this is total
            bit <<= 1
        if (idx >= m).any():
            raise ValueError("truncated FLAC stream")
        t = local[idx]
        starts = np.empty(cnt, dtype=np.int64)
        starts[0] = bitpos
        starts[1:] = t[:-1] + 1 + k
        q = t - starts
        z = q << k
        if k:
            z |= self.read_uint_vec(t + 1, k)
        return (z >> 1) ^ -(z & 1), int(t[-1] + 1 + k)

    def raw_decode(self, bitpos: int, cnt: int, raw: int):
        """Decode ``cnt`` raw signed ``raw``-bit values (the Rice
        escape partition); returns (values, new_bitpos)."""
        if cnt == 0 or raw == 0:
            return np.zeros(cnt, dtype=np.int64), bitpos + cnt * raw
        pos = bitpos + np.arange(cnt, dtype=np.int64) * raw
        v = self.read_uint_vec(pos, raw)
        v = np.where(v >= np.int64(1) << (raw - 1), v - (np.int64(1) << raw), v)
        return v, bitpos + cnt * raw


# ----------------------------------------------------------------------
# Encoder
# ----------------------------------------------------------------------

def _rice_cost(zig: np.ndarray, k: int) -> int:
    return int((zig >> k).sum()) + len(zig) * (k + 1)


def _write_residual(w: _BitWriter, res: np.ndarray) -> None:
    """Rice method 0 (4-bit params), partition order 0, with the raw
    escape when unary blowup would be worse."""
    w.write(0, 2)  # method: rice, 4-bit params
    w.write(0, 4)  # partition order 0
    zig = np.where(res >= 0, res.astype(np.int64) * 2, -2 * res.astype(np.int64) - 1)
    best_k, best_c = 0, None
    for k in range(15):
        c = _rice_cost(zig, k)
        if best_c is None or c < best_c:
            best_k, best_c = k, c
    raw_bits = max(int(zig.max(initial=0)).bit_length() + 1, 1)
    if best_c > len(zig) * raw_bits + 9:
        w.write(0xF, 4)  # escape
        w.write(raw_bits, 5)
        for r in res:
            w.write(int(r), raw_bits)
        return
    w.write(best_k, 4)
    for z in zig:
        z = int(z)
        w.write_unary(z >> best_k)
        if best_k:
            w.write(z & ((1 << best_k) - 1), best_k)


def _encode_subframe(w: _BitWriter, s: np.ndarray, bps: int, mode: str,
                     max_fixed_order: int) -> None:
    s = s.astype(np.int64)
    if mode == "verbatim":
        w.write(0, 1); w.write(0x01, 6); w.write(0, 1)
        for v in s:
            w.write(int(v), bps)
        return
    if mode == "auto" and len(s) and (s == s[0]).all():
        w.write(0, 1); w.write(0x00, 6); w.write(0, 1)
        w.write(int(s[0]), bps)
        return
    if mode == "lpc":
        # order-2 LPC numerically identical to the fixed-2 predictor:
        # coefs [2, -1] scaled by 1<<shift — exercises the full
        # quantized-LPC decode path with exact reconstruction (shift 12
        # keeps 2<<shift inside the 15-bit signed coefficient range)
        order, shift, precision = 2, 12, 15
        coefs = [2 << shift, -(1 << shift)]
        if len(s) <= order:
            w.write(0, 1); w.write(0x01, 6); w.write(0, 1)
            for v in s:
                w.write(int(v), bps)
            return
        res = s[order:] - ((coefs[0] * s[1:-1] + coefs[1] * s[:-2]) >> shift)
        w.write(0, 1); w.write(0x20 | (order - 1), 6); w.write(0, 1)
        for v in s[:order]:
            w.write(int(v), bps)
        w.write(precision - 1, 4)
        w.write(shift, 5)
        for c in coefs:
            w.write(c, precision)
        _write_residual(w, res)
        return
    # fixed predictor: best order by absolute-residual sum
    best_order, best_res, best_sum = 0, s, None
    for order in range(min(max_fixed_order, 4) + 1):
        if len(s) <= order:
            break
        res = s.copy()
        for _ in range(order):
            res = np.diff(res)
        tot = int(np.abs(res).sum())
        if best_sum is None or tot < best_sum:
            best_order, best_res, best_sum = order, res, tot
    w.write(0, 1); w.write(0x08 | best_order, 6); w.write(0, 1)
    for v in s[:best_order]:
        w.write(int(v), bps)
    _write_residual(w, best_res)


def encode_flac(samples, sample_rate: int = 16000, bits: int = 16,
                block_size: int = 4096, stereo: str = "independent",
                subframe: str = "auto", max_fixed_order: int = 2) -> bytes:
    """(n,) or (n, channels) integer samples → a real FLAC stream.

    ``stereo``: independent | left_side | right_side | mid_side
    (decorrelation modes; 2-channel input only). ``subframe``: auto
    (constant/fixed) | verbatim | lpc (fixed-2-equivalent quantized
    LPC). The fixture generator for :func:`decode_flac`."""
    if bits not in (8, 16, 24):
        raise NotImplementedError(f"{bits}-bit FLAC encode not supported")
    a = np.asarray(samples, dtype=np.int64)
    if a.ndim == 1:
        a = a[:, None]
    n, ch = a.shape
    if ch > 8:
        raise ValueError("FLAC supports at most 8 channels")
    if stereo != "independent" and ch != 2:
        raise ValueError("stereo decorrelation needs exactly 2 channels")

    # STREAMINFO
    si = _BitWriter()
    si.write(max(block_size, 16), 16)
    si.write(max(block_size, 16), 16)
    si.write(0, 24); si.write(0, 24)  # min/max frame size unknown
    si.write(sample_rate, 20)
    si.write(ch - 1, 3)
    si.write(bits - 1, 5)
    si.write(n, 36)
    for _ in range(16):
        si.write(0, 8)  # md5 unset (decoder does per-frame CRC16)
    out = bytearray(b"fLaC")
    out.append(0x80)  # last-metadata-block flag + type 0 (STREAMINFO)
    out += struct.pack(">I", len(si.bytes()))[1:]  # 24-bit length
    out += si.bytes()

    sr_bits = {8: 0b001, 16: 0b100, 24: 0b110}[bits]
    for fi, start in enumerate(range(0, n, block_size)):
        blk = a[start : start + block_size]
        bs = len(blk)
        w = _BitWriter()
        w.write(_SYNC, 14)
        w.write(0, 1)  # mandatory zero
        w.write(0, 1)  # fixed-blocksize strategy
        # block size code (prefer the tabled powers, else inline)
        if bs == 192:
            bs_code, bs_inline = 0b0001, None
        elif bs in (576, 1152, 2304, 4608):
            bs_code, bs_inline = 0b0010 + (bs // 576).bit_length() - 1, None
        elif bs in (256, 512, 1024, 2048, 4096, 8192, 16384, 32768):
            bs_code, bs_inline = 0b1000 + (bs // 256).bit_length() - 1, None
        elif bs <= 256:
            bs_code, bs_inline = 0b0110, ("u8", bs - 1)
        else:
            bs_code, bs_inline = 0b0111, ("u16", bs - 1)
        w.write(bs_code, 4)
        w.write(0, 4)  # sample rate: from STREAMINFO
        chan_code = {"independent": ch - 1, "left_side": 8,
                     "right_side": 9, "mid_side": 10}[stereo]
        w.write(chan_code, 4)
        w.write(sr_bits, 3)
        w.write(0, 1)  # reserved
        for b in _utf8_number(fi):
            w.write(b, 8)
        if bs_inline is not None:
            w.write(bs_inline[1], 8 if bs_inline[0] == "u8" else 16)
        w.write(_crc8(bytes(w.buf)), 8)

        if stereo == "independent":
            chans = [(blk[:, c], bits) for c in range(ch)]
        else:
            left = blk[:, 0]
            right = blk[:, 1]
            side = left - right
            if stereo == "left_side":
                chans = [(left, bits), (side, bits + 1)]
            elif stereo == "right_side":
                chans = [(side, bits + 1), (right, bits)]
            else:  # mid_side
                mid = (left + right) >> 1
                chans = [(mid, bits), (side, bits + 1)]
        for sig, ch_bps in chans:
            _encode_subframe(w, sig, ch_bps, subframe, max_fixed_order)
        w.align()
        frame = bytes(w.buf)
        out += frame + struct.pack(">H", _crc16(frame))
    return bytes(out)


# ----------------------------------------------------------------------
# Decoder
# ----------------------------------------------------------------------

def _read_residual(
    r: _BitReader, n: int, order: int, fast: "_FastBits | None" = None
) -> np.ndarray:
    method = r.read(2)
    if method > 1:
        raise ValueError("reserved FLAC residual coding method")
    pbits = 4 if method == 0 else 5
    escape = (1 << pbits) - 1
    porder = r.read(4)
    nparts = 1 << porder
    if n % nparts:
        raise ValueError("invalid FLAC rice partition order")
    out = np.empty(n - order, dtype=np.int64)
    idx = 0
    for p in range(nparts):
        cnt = n // nparts - (order if p == 0 else 0)
        if cnt < 0:
            raise ValueError("invalid FLAC rice partition order")
        param = r.read(pbits)
        if param == escape:
            raw = r.read(5)
            if fast is not None:
                out[idx : idx + cnt], r.bitpos = fast.raw_decode(
                    r.bitpos, cnt, raw
                )
                idx += cnt
                continue
            for _ in range(cnt):
                out[idx] = _sext(r.read(raw), raw) if raw else 0
                idx += 1
        else:
            if fast is not None:
                out[idx : idx + cnt], r.bitpos = fast.rice_decode(
                    r.bitpos, cnt, param
                )
                idx += cnt
                continue
            for _ in range(cnt):
                q = r.read_unary()
                z = (q << param) | (r.read(param) if param else 0)
                out[idx] = (z >> 1) ^ -(z & 1)  # un-zigzag
                idx += 1
    return out


def _undiff(res: np.ndarray, warm: list, order: int, n: int) -> np.ndarray:
    """Invert the order-``order`` finite difference exactly: the FIXED
    predictors are Δ^order, so reconstruction is ``order`` integer
    cumsums seeded from the successive differences of the warmup —
    replacing the per-sample python recurrence with O(order) numpy
    passes (int64-exact)."""
    s = np.empty(n, dtype=np.int64)
    s[:order] = warm
    if order == 0:
        return res.copy()
    # d[j] = last value of the j-th difference of the warmup samples
    d = [np.array(warm, dtype=np.int64)]
    for _ in range(order - 1):
        d.append(np.diff(d[-1]))
    cur = res
    for j in range(order - 1, -1, -1):
        cur = d[j][-1] + np.cumsum(cur)
    s[order:] = cur
    return s


def _read_subframe(
    r: _BitReader, n: int, bps: int, fast: "_FastBits | None" = None
) -> np.ndarray:
    if r.read(1):
        raise ValueError("invalid FLAC subframe padding bit")
    t = r.read(6)
    wasted = 0
    if r.read(1):
        wasted = r.read_unary() + 1
        bps -= wasted
    if t == 0x00:  # CONSTANT
        v = _sext(r.read(bps), bps)
        s = np.full(n, v, dtype=np.int64)
    elif t == 0x01:  # VERBATIM
        if fast is not None and bps:
            pos = r.bitpos + np.arange(n, dtype=np.int64) * bps
            v = fast.read_uint_vec(pos, bps)
            s = np.where(v >= np.int64(1) << (bps - 1), v - (np.int64(1) << bps), v)
            r.bitpos += n * bps
        else:
            s = np.fromiter(
                (_sext(r.read(bps), bps) for _ in range(n)), dtype=np.int64, count=n
            )
    elif 0x08 <= t <= 0x0C:  # FIXED order 0-4
        order = t & 0x07
        warm = [_sext(r.read(bps), bps) for _ in range(order)]
        res = _read_residual(r, n, order, fast)
        s = _undiff(res, warm, order, n)
    elif t >= 0x20:  # LPC, order 1-32
        order = (t & 0x1F) + 1
        warm = [_sext(r.read(bps), bps) for _ in range(order)]
        prec = r.read(4)
        if prec == 0xF:
            raise ValueError("invalid FLAC LPC precision")
        prec += 1
        shift = r.read(5)
        coefs = [_sext(r.read(prec), prec) for _ in range(order)]
        res = _read_residual(r, n, order, fast)
        s = np.empty(n, dtype=np.int64)
        s[:order] = warm
        for i in range(order, n):
            acc = 0
            for j, c in enumerate(coefs):
                acc += c * s[i - 1 - j]
            s[i] = res[i - order] + (acc >> shift)
    else:
        raise ValueError(f"reserved FLAC subframe type {t:#04x}")
    return s << wasted


def decode_flac(data: bytes):
    """REAL FLAC decode: metadata walk (STREAMINFO required), frame
    loop with CRC-8 header and CRC-16 frame verification, all four
    subframe types, both Rice methods + escape, all three stereo
    decorrelation modes. Returns (samples, sample_rate) with samples
    int64 of shape (n_frames, channels).

    Refusals: 12/20-bit sample sizes raise NotImplementedError (the
    supported depths are 8/16/24); reserved codes, bad CRCs, and
    truncation raise ValueError."""
    if data[:4] != b"fLaC":
        raise ValueError("not a FLAC payload (no fLaC magic)")
    pos = 4
    info = None
    while True:
        if pos + 4 > len(data):
            raise ValueError("truncated FLAC metadata")
        hdr = data[pos]
        last, btype = hdr & 0x80, hdr & 0x7F
        (ln,) = struct.unpack(">I", b"\x00" + data[pos + 1 : pos + 4])
        body = data[pos + 4 : pos + 4 + ln]
        if btype == 0:
            if ln < 34:
                raise ValueError("short FLAC STREAMINFO")
            r = _BitReader(body)
            r.read(16); r.read(16); r.read(24); r.read(24)
            rate = r.read(20)
            nch = r.read(3) + 1
            bps = r.read(5) + 1
            total = r.read(36)
            info = (rate, nch, bps, total)
        pos += 4 + ln
        if last:
            break
    if info is None:
        raise ValueError("FLAC stream missing STREAMINFO")
    rate, nch, si_bps, total = info
    if si_bps not in (8, 16, 24):
        raise NotImplementedError(
            f"{si_bps}-bit FLAC not supported (8/16/24 only)"
        )

    fast = _FastBits(data) if _VECTORIZED else None
    blocks = []
    while pos < len(data):
        frame_start = pos
        r = _BitReader(data, pos)
        if r.read(14) != _SYNC:
            raise ValueError("lost FLAC frame sync")
        if r.read(1):
            raise ValueError("invalid FLAC frame reserved bit")
        r.read(1)  # blocking strategy
        bs_code = r.read(4)
        sr_code = r.read(4)
        chan_code = r.read(4)
        ss_code = r.read(3)
        if r.read(1):
            raise ValueError("invalid FLAC frame reserved bit")
        r.read_utf8_number()
        if bs_code == 0:
            raise ValueError("reserved FLAC block size code")
        elif bs_code == 1:
            bs = 192
        elif bs_code <= 5:
            bs = 576 << (bs_code - 2)
        elif bs_code == 6:
            bs = r.read(8) + 1
        elif bs_code == 7:
            bs = r.read(16) + 1
        else:
            bs = 256 << (bs_code - 8)
        if sr_code == 0:
            pass
        elif sr_code in _RATES:
            if _RATES[sr_code] != rate:
                raise ValueError("FLAC frame sample rate contradicts STREAMINFO")
        elif sr_code == 12:
            r.read(8)
        elif sr_code in (13, 14):
            r.read(16)
        else:
            raise ValueError("invalid FLAC sample rate code")
        if ss_code == 0:
            bps = si_bps
        elif ss_code in (1, 4, 6):
            bps = {1: 8, 4: 16, 6: 24}[ss_code]
            if bps != si_bps:
                raise ValueError("FLAC frame bit depth contradicts STREAMINFO")
        elif ss_code in (2, 5):
            raise NotImplementedError(
                f"{12 if ss_code == 2 else 20}-bit FLAC not supported (8/16/24 only)"
            )
        else:
            raise ValueError("reserved FLAC sample size code")
        header_len = r.bytepos - frame_start
        if _crc8(data[frame_start : frame_start + header_len]) != data[
            frame_start + header_len
        ]:
            raise ValueError("FLAC frame header CRC-8 mismatch")
        r.read(8)  # consume the CRC byte

        if chan_code <= 7:
            if chan_code + 1 != nch:
                raise ValueError("FLAC frame channel count contradicts STREAMINFO")
            sigs = [_read_subframe(r, bs, bps, fast) for _ in range(nch)]
            block = np.stack(sigs, axis=1)
        elif chan_code in (8, 9, 10):
            if nch != 2:
                raise ValueError("FLAC stereo decorrelation in non-stereo stream")
            bps_pair = {
                8: (bps, bps + 1),   # left/side
                9: (bps + 1, bps),   # side/right
                10: (bps, bps + 1),  # mid/side
            }[chan_code]
            c0 = _read_subframe(r, bs, bps_pair[0], fast)
            c1 = _read_subframe(r, bs, bps_pair[1], fast)
            if chan_code == 8:
                left, right = c0, c0 - c1
            elif chan_code == 9:
                left, right = c1 + c0, c1
            else:
                mid, side = c0, c1
                m2 = (mid << 1) | (side & 1)
                left, right = (m2 + side) >> 1, (m2 - side) >> 1
            block = np.stack([left, right], axis=1)
        else:
            raise ValueError(f"reserved FLAC channel assignment {chan_code}")
        r.align()
        body_end = r.bytepos
        if body_end + 2 > len(data):
            raise ValueError("truncated FLAC stream")
        (crc,) = struct.unpack(">H", data[body_end : body_end + 2])
        if _crc16(data[frame_start:body_end]) != crc:
            raise ValueError("FLAC frame CRC-16 mismatch")
        blocks.append(block)
        pos = body_end + 2

    if not blocks:
        raise ValueError("FLAC stream has no frames")
    samples = np.concatenate(blocks, axis=0)
    if total:
        samples = samples[:total]
    return samples, rate
