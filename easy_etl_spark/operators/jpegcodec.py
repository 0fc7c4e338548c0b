"""Baseline JPEG codec in pure numpy + stdlib — no external image
libraries, closing the last multimodal-format contract gap
(VERDICT r3 item 8).

Decoder (`decode_jpeg`): baseline sequential DCT (SOF0) — marker walk
(APPn/COM skipped, DQT/DHT/DRI/SOS honored), canonical Huffman decode
with byte-unstuffing and restart-marker handling, dequantization,
inverse zigzag, float64 matrix IDCT, level shift + clamp, chroma
upsampling for sampling factors 1 and 2 (4:4:4 / 4:2:2 / 4:2:0), and
JFIF YCbCr→RGB. Greyscale (1 component) and color (3 components)
supported; progressive (SOF2), arithmetic coding, 12-bit and
hierarchical modes refuse loudly.

Encoder (`encode_jpeg`): the fixture generator — greyscale or 4:4:4
color, level shift, float64 matrix forward DCT, quantization with
floor(x/q + 0.5) rounding (floor-based on purpose: replayable as
integer SQL by the pixel oracle), zigzag, DC-difference + AC
run-length coding, and canonical single-length Huffman tables built
in-code (all 12 DC categories at 4 bits, all 162 AC symbols at
8 bits — spec-valid, declared in DHT like any table, so the decoder
exercises the same table-driven path real JPEGs use).

Determinism note for the oracle: an 8x8 block of CONSTANT even value v
survives the entire pipeline exactly — DCT puts everything in DC
(8·(v−128)), quantization by q_dc=16 halves it with a floor-rounding
that is boundary-safe for even levels, and the IDCT returns the value
bit-exactly after the final floor(x+0.5) clamp. synth_jpeg_images
(operators/multimodal.py) builds corpora of such blocks so a DuckDB
oracle can replay the decoded pixel sums as pure integer SQL; any
marker/Huffman/dequant/IDCT bug breaks the equality. Lossy behavior on
arbitrary images is pinned by round-trip tolerance pytests instead.

Scale posture: identical to the PNG codec — runs inside mapInPandas
Arrow batches, per-partition, zero shuffle; a production deployment
swaps in a C codec behind the same decode_image dispatch.
"""

from __future__ import annotations

import struct

import numpy as np

# ----------------------------------------------------------------------
# shared constants
# ----------------------------------------------------------------------

#: zigzag scan order: ZIGZAG[i] = (row, col) of the i-th coefficient
ZIGZAG = []
for s in range(15):
    ks = range(max(0, s - 7), min(s, 7) + 1)
    for k in (ks if s % 2 else reversed(ks)):
        ZIGZAG.append((k, s - k))

#: default quantization tables (parametric, not Annex K): mild ramp
#: with q[0,0]=16 — the DC step the constant-block oracle replays
_QT_LUMA = np.array([[16 + 4 * (u + v) for v in range(8)] for u in range(8)], dtype=np.int32)
_QT_CHROMA = np.array([[16 + 6 * (u + v) for v in range(8)] for u in range(8)], dtype=np.int32)

#: 8x8 DCT-II basis: F = M @ B @ M.T ; B = M.T @ F @ M
_M = np.zeros((8, 8))
for u in range(8):
    cu = (1 / np.sqrt(2)) if u == 0 else 1.0
    for x in range(8):
        _M[u, x] = 0.5 * cu * np.cos((2 * x + 1) * u * np.pi / 16)


def _fdct(block: np.ndarray) -> np.ndarray:
    return _M @ block @ _M.T


def _idct(coef: np.ndarray) -> np.ndarray:
    return _M.T @ coef @ _M


# ----------------------------------------------------------------------
# canonical Huffman tables
# ----------------------------------------------------------------------

def _canonical_codes(bits: list[int], symbols: list[int]) -> dict[int, tuple[int, int]]:
    """JPEG canonical code assignment: symbol -> (code, length)."""
    out, code, k = {}, 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[symbols[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


#: encoder tables: every DC category at 4 bits, every AC symbol at 8
_DC_SYMBOLS = list(range(12))
_DC_BITS = [0, 0, 0, 12] + [0] * 12
_AC_SYMBOLS = sorted({(r << 4) | s for r in range(16) for s in range(1, 11)} | {0x00, 0xF0})
_AC_BITS = [0] * 7 + [len(_AC_SYMBOLS)] + [0] * 8
_DC_ENC = _canonical_codes(_DC_BITS, _DC_SYMBOLS)
_AC_ENC = _canonical_codes(_AC_BITS, _AC_SYMBOLS)


# ----------------------------------------------------------------------
# bit I/O
# ----------------------------------------------------------------------

class _BitWriter:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            byte = (self.acc >> (self.nbits - 8)) & 0xFF
            self.buf.append(byte)
            if byte == 0xFF:  # byte stuffing
                self.buf.append(0x00)
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> bytes:
        if self.nbits:
            self.write(0x7F, 8 - self.nbits)  # pad with 1s per spec
        return bytes(self.buf)


class _BitReader:
    """Reads the entropy-coded segment: un-stuffs 0xFF00, stops at any
    real marker (leaving the position on the 0xFF)."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> None:
        b = self.data[self.pos]
        if b == 0xFF:
            nxt = self.data[self.pos + 1]
            if nxt == 0x00:
                self.pos += 2
            else:
                raise _MarkerHit(self.pos)  # restart or segment end
        else:
            self.pos += 1
        self.acc = (self.acc << 8) | b
        self.nbits += 8

    def read_bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def align(self) -> None:
        self.acc, self.nbits = 0, 0


class _MarkerHit(Exception):
    def __init__(self, pos: int):
        self.pos = pos


def _receive_extend(reader: _BitReader, size: int) -> int:
    """JPEG magnitude coding: size bits -> signed value."""
    if size == 0:
        return 0
    v = reader.read_bits(size)
    if v < (1 << (size - 1)):  # negative range
        v -= (1 << size) - 1
    return v


def _magnitude(v: int) -> tuple[int, int]:
    """signed value -> (size, size-bit code)."""
    if v == 0:
        return 0, 0
    size = int(v).bit_length() if v > 0 else int(-v).bit_length()
    code = v if v >= 0 else v + (1 << size) - 1
    return size, code


# ----------------------------------------------------------------------
# encoder
# ----------------------------------------------------------------------

def _seg(marker: int, payload: bytes) -> bytes:
    return struct.pack(">HH", marker, len(payload) + 2) + payload


def _encode_plane_blocks(plane: np.ndarray, qt: np.ndarray):
    """Pad a component plane to 8-multiples (edge replication) and
    yield quantized zigzag coefficient lists per block, row-major."""
    h, w = plane.shape
    ph, pw = -(-h // 8) * 8, -(-w // 8) * 8
    padded = np.empty((ph, pw), dtype=np.float64)
    padded[:h, :w] = plane
    padded[h:, :w] = plane[-1:, :]
    padded[:, w:] = padded[:, w - 1 : w]
    padded -= 128.0  # level shift
    for by in range(ph // 8):
        for bx in range(pw // 8):
            coef = _fdct(padded[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8])
            # floor(x/q + 0.5): deterministic, SQL-replayable rounding
            q = np.floor(coef / qt + 0.5).astype(np.int64)
            yield [int(q[r, c]) for (r, c) in ZIGZAG]


def _entropy_encode(writer: _BitWriter, zz: list[int], pred: int) -> int:
    """One block: DC difference + AC run-length, canonical tables."""
    diff = zz[0] - pred
    size, code = _magnitude(diff)
    dcode, dlen = _DC_ENC[size]
    writer.write(dcode, dlen)
    if size:
        writer.write(code, size)
    run = 0
    last_nz = max((i for i in range(1, 64) if zz[i]), default=0)
    for i in range(1, last_nz + 1):
        if zz[i] == 0:
            run += 1
            continue
        while run > 15:
            zcode, zlen = _AC_ENC[0xF0]  # ZRL: 16 zeros
            writer.write(zcode, zlen)
            run -= 16
        size, code = _magnitude(zz[i])
        acode, alen = _AC_ENC[(run << 4) | size]
        writer.write(acode, alen)
        writer.write(code, size)
        run = 0
    if last_nz < 63:
        ecode, elen = _AC_ENC[0x00]  # EOB
        writer.write(ecode, elen)
    return zz[0]


def _dht_payload(cls: int, ident: int, bits: list[int], symbols: list[int]) -> bytes:
    return bytes([cls << 4 | ident]) + bytes(bits) + bytes(symbols)


def encode_jpeg(pixels) -> bytes:
    """(h, w) greyscale or (h, w, 3) RGB uint8 → baseline JPEG (SOF0,
    4:4:4, canonical in-code Huffman tables, parametric quant tables).
    Built for fixtures and tests — compression ratio is deliberately
    traded for table simplicity; the bitstream is fully spec-valid."""
    a = np.asarray(pixels, dtype=np.uint8)
    grey = a.ndim == 2
    h, w = a.shape[:2]
    if grey:
        planes = [a.astype(np.float64)]
    else:
        r, g, b = (a[:, :, i].astype(np.float64) for i in range(3))
        y = np.floor(0.299 * r + 0.587 * g + 0.114 * b + 0.5)
        cb = np.floor(-0.168736 * r - 0.331264 * g + 0.5 * b + 128.5)
        cr = np.floor(0.5 * r - 0.418688 * g - 0.081312 * b + 128.5)
        planes = [y, np.clip(cb, 0, 255), np.clip(cr, 0, 255)]
    qts = [_QT_LUMA] if grey else [_QT_LUMA, _QT_CHROMA]

    out = bytearray(b"\xff\xd8")  # SOI
    for tid, qt in enumerate(qts):
        zz = bytes(int(qt[r, c]) for (r, c) in ZIGZAG)
        out += _seg(0xFFDB, bytes([tid]) + zz)  # DQT, 8-bit precision
    ncomp = 1 if grey else 3
    sof = bytes([8]) + struct.pack(">HH", h, w) + bytes([ncomp])
    for ci in range(ncomp):
        sof += bytes([ci + 1, 0x11, 0 if ci == 0 else (0 if grey else 1)])
    out += _seg(0xFFC0, sof)  # SOF0 baseline, all factors 1x1
    out += _seg(0xFFC4, _dht_payload(0, 0, _DC_BITS, _DC_SYMBOLS))
    out += _seg(0xFFC4, _dht_payload(1, 0, _AC_BITS, _AC_SYMBOLS))
    sos = bytes([ncomp])
    for ci in range(ncomp):
        sos += bytes([ci + 1, 0x00])  # DC table 0, AC table 0
    sos += bytes([0, 63, 0])
    out += _seg(0xFFDA, sos)

    # 4:4:4, all sampling 1x1 -> MCU = one block per component,
    # interleaved in component order
    writer = _BitWriter()
    block_iters = [list(_encode_plane_blocks(p, qts[min(i, len(qts) - 1)]))
                   for i, p in enumerate(planes)]
    preds = [0] * ncomp
    for bi in range(len(block_iters[0])):
        for ci in range(ncomp):
            preds[ci] = _entropy_encode(writer, block_iters[ci][bi], preds[ci])
    out += writer.flush()
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# ----------------------------------------------------------------------
# decoder
# ----------------------------------------------------------------------

def _build_decode_table(bits: list[int], symbols: list[int]) -> dict[tuple[int, int], int]:
    enc = _canonical_codes(bits, symbols)
    return {(length, code): sym for sym, (code, length) in enc.items()}


def _read_huffman(reader: _BitReader, table: dict[tuple[int, int], int]) -> int:
    code, length = 0, 0
    while length <= 16:
        code = (code << 1) | reader.read_bit()
        length += 1
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid JPEG Huffman code")


def decode_jpeg(data: bytes) -> np.ndarray:
    """Baseline JPEG → (h, w, C) uint8, C = 1 (greyscale) or 3 (RGB).
    See module docstring for supported scope; unsupported modes raise
    NotImplementedError, corrupt streams raise ValueError."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload (no SOI)")
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    dc_tables: dict[int, dict] = {}
    ac_tables: dict[int, dict] = {}
    frame = None
    restart_interval = 0

    while pos < len(data):
        if data[pos] != 0xFF:
            raise ValueError(f"expected marker at offset {pos}")
        marker = data[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            break
        if marker in (0x01,) or 0xD0 <= marker <= 0xD7:
            continue  # standalone markers
        (seglen,) = struct.unpack_from(">H", data, pos)
        payload = data[pos + 2 : pos + seglen]
        pos += seglen
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(payload):
                pq, tq = payload[p] >> 4, payload[p] & 0x0F
                if pq != 0:
                    raise NotImplementedError("16-bit quant tables not supported")
                qt = np.zeros((8, 8), dtype=np.int32)
                for i, (r, c) in enumerate(ZIGZAG):
                    qt[r, c] = payload[p + 1 + i]
                qtables[tq] = qt
                p += 65
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(payload):
                cls, ident = payload[p] >> 4, payload[p] & 0x0F
                bits = list(payload[p + 1 : p + 17])
                nsym = sum(bits)
                symbols = list(payload[p + 17 : p + 17 + nsym])
                table = _build_decode_table(bits, symbols)
                (dc_tables if cls == 0 else ac_tables)[ident] = table
                p += 17 + nsym
        elif marker == 0xC0 or marker == 0xC1:  # SOF0/1: baseline ok
            precision = payload[0]
            if precision != 8:
                raise NotImplementedError(f"{precision}-bit JPEG not supported")
            fh, fw = struct.unpack_from(">HH", payload, 1)
            ncomp = payload[5]
            comps = []
            for ci in range(ncomp):
                cid, hv, tq = payload[6 + ci * 3 : 9 + ci * 3]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0x0F, "tq": tq})
            frame = {"h": fh, "w": fw, "comps": comps}
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                "only baseline sequential DCT (SOF0/SOF1) is supported"
            )
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack_from(">H", payload, 0)
        elif marker == 0xDA:  # SOS — entropy-coded data follows
            if frame is None:
                raise ValueError("SOS before SOF")
            ns = payload[0]
            scan = []
            for ci in range(ns):
                cs, tt = payload[1 + ci * 2 : 3 + ci * 2]
                comp = next(c for c in frame["comps"] if c["id"] == cs)
                scan.append((comp, dc_tables[tt >> 4], ac_tables[tt & 0x0F]))
            pixels = _decode_scan(data, pos, frame, scan, qtables, restart_interval)
            return pixels
    raise ValueError("JPEG stream ended without a scan")


def _decode_scan(data, pos, frame, scan, qtables, restart_interval):
    fh, fw = frame["h"], frame["w"]
    comps = [s[0] for s in scan]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    if any(c["h"] not in (1, 2) or c["v"] not in (1, 2) for c in comps):
        raise NotImplementedError("sampling factors beyond 2 not supported")
    mcux = -(-fw // (8 * hmax))
    mcuy = -(-fh // (8 * vmax))
    planes = [
        np.zeros((mcuy * c["v"] * 8, mcux * c["h"] * 8), dtype=np.float64)
        for c in comps
    ]
    reader = _BitReader(data, pos)
    preds = [0] * len(comps)
    mcu_count = 0
    # a well-formed scan never raises inside this loop: the reader only
    # meets a marker (or end-of-data) mid-MCU when the entropy segment
    # is truncated/corrupt — surface that as the documented ValueError
    # rather than the internal _MarkerHit / a raw IndexError
    try:
        for my in range(mcuy):
            for mx in range(mcux):
                if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                    # expect RSTn: align, consume marker, reset predictors
                    reader.align()
                    p = reader.pos
                    if data[p] == 0xFF and 0xD0 <= data[p + 1] <= 0xD7:
                        reader.pos = p + 2
                        preds = [0] * len(comps)
                    else:
                        raise ValueError("missing restart marker")
                for ci, (comp, dct, act) in enumerate(scan):
                    qt = qtables[comp["tq"]]
                    for v in range(comp["v"]):
                        for h_ in range(comp["h"]):
                            block, preds[ci] = _decode_block(reader, dct, act, preds[ci])
                            coef = np.zeros((8, 8), dtype=np.float64)
                            for i, (r, c) in enumerate(ZIGZAG):
                                coef[r, c] = block[i] * qt[r, c]
                            out = _idct(coef) + 128.0
                            py = (my * comp["v"] + v) * 8
                            px = (mx * comp["h"] + h_) * 8
                            planes[ci][py : py + 8, px : px + 8] = out
                mcu_count += 1
    except (_MarkerHit, IndexError) as exc:
        raise ValueError("truncated JPEG entropy data") from exc

    # upsample to full MCU-grid resolution, crop to (fh, fw)
    full = []
    for ci, comp in enumerate(comps):
        p = planes[ci]
        if comp["h"] < hmax:
            p = np.repeat(p, hmax // comp["h"], axis=1)
        if comp["v"] < vmax:
            p = np.repeat(p, vmax // comp["v"], axis=0)
        full.append(p[:fh, :fw])
    if len(full) == 1:
        y = np.clip(np.floor(full[0] + 0.5), 0, 255).astype(np.uint8)
        return y[:, :, None]
    y, cb, cr = full[0], full[1] - 128.0, full[2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    rgb = np.stack([r, g, b], axis=2)
    return np.clip(np.floor(rgb + 0.5), 0, 255).astype(np.uint8)


def _decode_block(reader: _BitReader, dct, act, pred):
    zz = [0] * 64
    size = _read_huffman(reader, dct)
    pred = pred + _receive_extend(reader, size)
    zz[0] = pred
    k = 1
    while k < 64:
        rs = _read_huffman(reader, act)
        run, size = rs >> 4, rs & 0x0F
        if size == 0:
            if run == 15:  # ZRL
                k += 16
                continue
            break  # EOB
        k += run
        if k > 63:
            raise ValueError("AC coefficient index out of range")
        zz[k] = _receive_extend(reader, size)
        k += 1
    return zz, pred
