"""Native FLAC codec (operators/flaccodec.py): exact round-trips over
every subframe type / bit depth / stereo mode, loud refusals on the
unsupported corners, and the Spark windowed-energy plumbing."""

from __future__ import annotations

import numpy as np
import pytest

from easy_etl_spark.operators.flaccodec import _crc8, decode_flac, encode_flac

RNG = np.random.RandomState(1234)


def _roundtrip(samples, **kw):
    data = encode_flac(samples, **kw)
    dec, rate = decode_flac(data)
    a = np.asarray(samples)
    if a.ndim == 1:
        a = a[:, None]
    assert dec.shape == a.shape
    assert (dec == a).all()
    return data


def test_roundtrip_fixed_predictors_and_multi_frame():
    i = np.arange(500, dtype="int64")
    saw = ((7 * 31 + i * 17) % 65536) - 32768
    data = _roundtrip(saw, block_size=192)
    # the linear ramp must actually compress (fixed predictor + Rice)
    assert len(data) < saw.size  # << 2 bytes/sample raw


def test_roundtrip_constant_verbatim_lpc():
    _roundtrip(np.full(300, -123), block_size=4096)  # CONSTANT
    noise = RNG.randint(-32768, 32768, 700)
    _roundtrip(noise, subframe="verbatim", block_size=256)
    ramp = np.cumsum(RNG.randint(-3, 4, 1000))
    _roundtrip(ramp, subframe="lpc", block_size=333)  # quantized LPC


def test_roundtrip_bit_depths():
    _roundtrip(RNG.randint(-128, 128, 333), bits=8, block_size=100)
    _roundtrip(RNG.randint(-32768, 32768, 400), bits=16, block_size=256)
    _roundtrip(RNG.randint(-(1 << 23), 1 << 23, 400), bits=24, block_size=256)


def test_roundtrip_stereo_decorrelation_modes():
    st = np.stack(
        [RNG.randint(-32768, 32768, 400), RNG.randint(-32768, 32768, 400)], axis=1
    )
    for mode in ("independent", "left_side", "right_side", "mid_side"):
        _roundtrip(st, stereo=mode, block_size=128)
    # correlated stereo: side channel near-zero -> decorrelation wins
    base = np.cumsum(RNG.randint(-50, 51, 2000))
    corr = np.stack([base, base + RNG.randint(-2, 3, 2000)], axis=1)
    ind = encode_flac(corr, stereo="independent", block_size=512)
    ms = encode_flac(corr, stereo="mid_side", block_size=512)
    assert len(ms) < len(ind)


def test_roundtrip_many_frames_utf8_numbers():
    # >128 frames exercises multi-byte UTF-8-coded frame numbers
    _roundtrip(RNG.randint(-100, 100, 16 * 130), block_size=16)


def test_refuses_non_flac_and_truncation():
    with pytest.raises(ValueError, match="fLaC magic"):
        decode_flac(b"RIFFnot-a-flac")
    data = encode_flac(np.arange(100), block_size=256)
    with pytest.raises(ValueError):
        decode_flac(data[:30])
    with pytest.raises(ValueError):
        decode_flac(data[:-10])


_FRAME0 = 4 + 4 + 34  # magic + metadata block header + STREAMINFO


def _patch_header(data: bytes, byte3: int) -> bytes:
    """Rewrite byte 3 of the first frame header (channel/sample-size
    bits) and fix up the header CRC-8 so the refusal under test fires
    instead of the CRC check."""
    buf = bytearray(data)
    buf[_FRAME0 + 3] = byte3
    # header = 4 fixed bytes + 1 UTF-8 byte (frame 0); CRC-8 follows
    buf[_FRAME0 + 5] = _crc8(bytes(buf[_FRAME0 : _FRAME0 + 5]))
    return bytes(buf)


def test_refuses_12_and_20_bit_depths():
    data = encode_flac(np.arange(300), block_size=256)  # tabled size: no inline bytes
    b3 = data[_FRAME0 + 3]
    with pytest.raises(NotImplementedError, match="12-bit"):
        decode_flac(_patch_header(data, (b3 & 0xF1) | (0b010 << 1)))
    with pytest.raises(NotImplementedError, match="20-bit"):
        decode_flac(_patch_header(data, (b3 & 0xF1) | (0b101 << 1)))


def test_refuses_reserved_channel_assignment():
    data = encode_flac(np.arange(300), block_size=256)
    b3 = data[_FRAME0 + 3]
    with pytest.raises(ValueError, match="reserved FLAC channel assignment"):
        decode_flac(_patch_header(data, (0b1011 << 4) | (b3 & 0x0F)))


def test_crc_mismatches_raise():
    data = bytearray(encode_flac(np.arange(300), block_size=256))
    bad_hdr = bytearray(data)
    bad_hdr[_FRAME0 + 4] ^= 0x01  # frame number byte: breaks header CRC-8
    with pytest.raises(ValueError, match="CRC-8"):
        decode_flac(bytes(bad_hdr))
    bad_tail = bytearray(data)
    bad_tail[-1] ^= 0xFF  # frame CRC-16 itself
    with pytest.raises(ValueError, match="CRC-16"):
        decode_flac(bytes(bad_tail))


def test_encode_refuses_unsupported_depths():
    with pytest.raises(NotImplementedError):
        encode_flac(np.arange(10), bits=12)
    with pytest.raises(NotImplementedError):
        encode_flac(np.arange(10), bits=32)


def test_flac_window_energy_matches_wav_decode_path(spark, sf_dir):
    """The Spark FLAC plumbing must produce the same windowed energies
    as decoding locally — and the same numbers the SQL oracle replays
    from the sample formula."""
    from easy_etl_spark.operators.multimodal import (
        flac_window_energy,
        synth_flac_audio,
    )
    from easy_etl_spark.session import load_table

    docs = load_table(spark, sf_dir, "documents")
    media = synth_flac_audio(docs, max_docs=8)
    got = {
        (r.doc_id, r.win): (r.n_samples, r.energy, r.peak)
        for r in flac_window_energy(media, window=64).collect()
    }
    assert got, "no windows produced"
    for doc_id in range(min(8, 1 + max(k[0] for k in got))):
        n = 192 + 64 * (doc_id % 4)
        i = np.arange(n, dtype="int64")
        v = ((doc_id * 37 + i * 23) % 65536) - 32768
        for w in range((n + 63) // 64):
            chunk = v[w * 64 : (w + 1) * 64]
            sq = chunk * chunk
            assert got[(doc_id, w)] == (len(chunk), int(sq.sum()), int(sq.max()))


# ----------------------------------------------------------------------
# Property-based bit-level coverage
# ----------------------------------------------------------------------

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_HSET = dict(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)


@settings(**_HSET)
@given(
    n=st.integers(min_value=0, max_value=(1 << 36) - 1),
)
def test_utf8_number_roundtrip_property(n):
    from easy_etl_spark.operators.flaccodec import _BitReader, _utf8_number

    data = _utf8_number(n)
    assert _BitReader(data).read_utf8_number() == n


@settings(**_HSET)
@given(
    samples=st.lists(
        st.integers(min_value=-32768, max_value=32767), min_size=1, max_size=400
    ),
    block_size=st.sampled_from([16, 100, 192, 256, 333]),
    subframe=st.sampled_from(["auto", "verbatim", "lpc"]),
)
def test_flac_roundtrip_property_mono16(samples, block_size, subframe):
    import numpy as np

    s = np.array(samples, dtype=np.int64)
    data = encode_flac(s, block_size=block_size, subframe=subframe)
    dec, _ = decode_flac(data)
    assert (dec[:, 0] == s).all()


@settings(**_HSET)
@given(
    left=st.lists(
        st.integers(min_value=-32768, max_value=32767), min_size=4, max_size=120
    ),
    stereo=st.sampled_from(["independent", "left_side", "right_side", "mid_side"]),
)
def test_flac_roundtrip_property_stereo(left, stereo):
    import numpy as np

    l = np.array(left, dtype=np.int64)
    r = (l // 2) - 7  # correlated but not equal
    st2 = np.stack([l, r], axis=1)
    dec, _ = decode_flac(encode_flac(st2, stereo=stereo, block_size=64))
    assert (dec == st2).all()


def test_vectorized_decode_bit_identical_to_scalar(monkeypatch):
    """The numpy fast paths (Rice chain walk, payload gather, raw
    escape, verbatim gather, cumsum un-difference) must reproduce the
    scalar reference reader bit-for-bit on streams exercising every
    path."""
    import easy_etl_spark.operators.flaccodec as fc

    rng = np.random.RandomState(77)
    streams = [
        encode_flac(np.cumsum(rng.randint(-9, 10, 1500)), block_size=192),
        encode_flac(rng.randint(-32768, 32768, 900), block_size=256),  # escapes
        encode_flac(np.cumsum(rng.randint(-3, 4, 800)), subframe="lpc",
                    block_size=128),
        encode_flac(rng.randint(-32768, 32768, 400), subframe="verbatim",
                    block_size=100),
        encode_flac(
            np.stack([np.cumsum(rng.randint(-5, 6, 600))] * 2, axis=1)
            + rng.randint(-2, 3, (600, 2)),
            stereo="mid_side", block_size=150,
        ),
    ]
    for i, data in enumerate(streams):
        fast_out, _ = decode_flac(data)
        monkeypatch.setattr(fc, "_VECTORIZED", False)
        slow_out, _ = decode_flac(data)
        monkeypatch.setattr(fc, "_VECTORIZED", True)
        assert (fast_out == slow_out).all(), f"stream {i} diverged"
