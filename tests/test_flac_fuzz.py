"""Adversarial inputs for the native FLAC decoder (native/flac_decoder.cpp).

The decoder parses untrusted files; every malformed input must surface as
a clean Python ValueError (nonzero return code), never a crash, hang, or
unbounded allocation.  (The reference leans on libsndfile, which is
hardened; owning the decoder means owning its robustness.)
"""

import os
import struct

import numpy as np
import pytest

from one_peace_tpu.data.flac import decode_flac_bytes

ASSET = "/root/reference/assets/cow.flac"

pytestmark = pytest.mark.skipif(not os.path.exists(ASSET),
                                reason="reference FLAC asset unavailable")


def _valid_bytes() -> bytes:
    with open(ASSET, "rb") as fh:
        return fh.read()


def test_valid_file_still_decodes():
    wav, sr = decode_flac_bytes(_valid_bytes())
    assert sr > 0 and len(wav) > 0
    assert np.isfinite(wav).all()


def test_truncations_raise_cleanly():
    data = _valid_bytes()
    # truncate at a spread of byte positions incl. inside metadata and
    # mid-frame; success is acceptable only for near-full files
    for frac in (0.0, 0.001, 0.01, 0.05, 0.2, 0.5, 0.9, 0.999):
        cut = data[: max(1, int(len(data) * frac))]
        try:
            wav, sr = decode_flac_bytes(cut)
            assert np.isfinite(wav).all()
        except ValueError:
            pass  # clean failure is the expected outcome


def test_random_corruption_never_crashes():
    data = bytearray(_valid_bytes())
    rs = np.random.RandomState(0)
    for trial in range(60):
        corrupted = bytearray(data)
        for _ in range(rs.randint(1, 8)):
            corrupted[rs.randint(len(corrupted))] = rs.randint(256)
        try:
            wav, _ = decode_flac_bytes(bytes(corrupted))
            assert np.isfinite(np.nan_to_num(wav)).all()
        except ValueError:
            pass


def test_random_garbage_rejected():
    rs = np.random.RandomState(1)
    for n in (0, 1, 3, 4, 64, 4096):
        blob = bytes(rs.randint(0, 256, n, dtype=np.uint8))
        with pytest.raises(ValueError):
            decode_flac_bytes(blob)
    # correct magic + garbage body
    with pytest.raises(ValueError):
        decode_flac_bytes(b"fLaC" + bytes(rs.randint(0, 256, 256,
                                                     dtype=np.uint8)))


def _streaminfo(sample_rate=16000, channels=1, bps=16, total=0,
                last=True) -> bytes:
    """Minimal STREAMINFO metadata block."""
    body = bytearray(34)
    # min/max block size, min/max frame size: zeros
    body[10] = (sample_rate >> 12) & 0xFF
    body[11] = (sample_rate >> 4) & 0xFF
    body[12] = ((sample_rate & 0xF) << 4) | (((channels - 1) & 0x7) << 1) \
        | (((bps - 1) >> 4) & 1)
    body[13] = (((bps - 1) & 0xF) << 4) | ((total >> 32) & 0xF)
    body[14] = (total >> 24) & 0xFF
    body[15] = (total >> 16) & 0xFF
    body[16] = (total >> 8) & 0xFF
    body[17] = total & 0xFF
    header = bytes([(0x80 if last else 0) | 0, 0, 0, 34])
    return header + bytes(body)


def test_frame_channel_count_exceeding_streaminfo_rejected():
    """A frame header claiming 8 channels against a mono STREAMINFO must
    be rejected (the channel buffers are sized from STREAMINFO)."""
    frame = bytearray()
    # sync 0b11111111111110 + reserved(0) + blocking(0)
    frame += bytes([0xFF, 0xF8])
    # bs_code=8(256) sr_code=5(16k) -> 0x85 ; ch_code=7(8ch) bps=16(code 4) res 0
    frame += bytes([0x85, 0x78])
    frame += bytes([0x00])  # utf8 frame number 0
    frame += bytes([0x00])  # header crc
    frame += bytes(64)  # would-be subframe bits
    blob = b"fLaC" + _streaminfo(channels=1) + bytes(frame)
    with pytest.raises(ValueError):
        decode_flac_bytes(blob)


def test_huge_total_samples_no_oom():
    """STREAMINFO declaring 2^36-ish samples over a tiny stream must not
    pre-allocate by trusting the header."""
    blob = b"fLaC" + _streaminfo(total=(1 << 36) - 1)
    # no frames follow -> decodes to empty, quickly, without a giant alloc
    wav, sr = decode_flac_bytes(blob)
    assert len(wav) == 0 and sr == 16000


def test_zero_bps_streaminfo_rejected():
    with pytest.raises(ValueError):
        # craft bps bits = 0 -> bps field decodes to 1? set channels=0 too
        blob = b"fLaC" + bytes([0x80, 0, 0, 34]) + bytes(34)
        decode_flac_bytes(blob)


def test_metadata_length_overflow_rejected():
    """Metadata block length pointing past EOF."""
    bad = b"fLaC" + bytes([0x00, 0xFF, 0xFF, 0xFF]) + b"\x00" * 8
    with pytest.raises(ValueError):
        decode_flac_bytes(bad)
