"""FLAC codec tests (late r7): lossless round-trips through the pure-
Python encoder/decoder, plus hand-assembled bitstream vectors for the
decode paths the subset encoder never emits — LPC prediction, 5-bit
rice, partition orders, raw-bits escapes, wasted bits — so the decoder
is pinned to the spec independently of the encoder."""

from __future__ import annotations

import struct

import pytest

from realtime_market_data_pipeline_spark.operators import flac


def test_flac_roundtrip_modes():
    """Every encoder mode round-trips sample-exact with the STREAMINFO
    MD5 verifying (the strongest whole-file integrity check)."""
    left = [(i * 37) % 4000 - 2000 for i in range(400)]
    right = [(i * i) % 3000 - 1500 for i in range(400)]
    cases = [
        ([[100] * 300], dict(block_size=128)),            # CONSTANT
        ([[((7 * 31 + i * 17) % 65536) - 32768 for i in range(500)]],
         dict(block_size=192)),                           # FIXED + rice
        ([left, right], dict(block_size=256)),            # stereo indep
        ([left, right], dict(block_size=256, mid_side=True)),
        ([[i % 256 - 128 for i in range(200)]],
         dict(block_size=64, bps=8)),
        ([[(i * 100003) % (1 << 23) - (1 << 22) for i in range(200)]],
         dict(block_size=64, bps=24)),
    ]
    for channels, kw in cases:
        p = flac.encode_flac(channels, **kw)
        d = flac.decode_flac(p)
        assert d["md5_ok"] is True, kw
        assert d["n_samples"] == len(channels[0])
        assert d["n_channels"] == len(channels)
        assert flac.decode_flac_samples(p) == channels, kw
        allsamp = [s for ch in channels for s in ch]
        assert d["sample_sum"] == sum(allsamp)
        assert d["sample_peak"] == max(abs(s) for s in allsamp)


def test_flac_crc_rejects_corruption():
    p = bytearray(
        flac.encode_flac([[(i * 13) % 2000 - 1000 for i in range(128)]])
    )
    # flip a bit inside the audio frame (past the 4+4+34 byte headers)
    p[60] ^= 0x10
    with pytest.raises(ValueError, match="CRC"):
        flac.decode_flac(bytes(p))


def test_flac_lpc_rice5_partitions_escape_hand_vector():
    """Hand-assembled mono frame covering what the encoder never emits:
    an LPC subframe (order 1, precision 12, shift 2, coefficient 3),
    a 5-bit rice residual (method 1) at partition order 1, with
    partition 0 rice-coded (param 2) and partition 1 using the raw-bits
    escape (5-bit verbatim residuals). Expected samples follow the spec
    recursion s[i] = e[i] + ((3*s[i-1]) >> 2) from warmup 1000."""
    n = 8
    resid = [5, -3, 0, -7, 6, 0, -1]
    expected = [1000]
    for e in resid:
        expected.append(e + ((3 * expected[-1]) >> 2))

    si = flac._BitsW()
    si.write(n, 16)
    si.write(n, 16)
    si.write(0, 24)
    si.write(0, 24)
    si.write(8000, 20)
    si.write(0, 3)   # 1 channel
    si.write(15, 5)  # 16 bps
    si.write(n, 36)
    body = bytes(si.out) + b"\x00" * 16  # MD5 unknown
    payload = bytearray(b"fLaC")
    payload += bytes([0x80]) + len(body).to_bytes(3, "big") + body

    bw = flac._BitsW()
    bw.write(0x3FFE, 14)
    bw.write(0, 2)
    bw.write(6, 4)   # blocksize: 8-bit at end
    bw.write(0, 4)   # rate from STREAMINFO
    bw.write(0, 4)   # 1 channel
    bw.write(0, 3)   # bps from STREAMINFO
    bw.write(0, 1)
    bw.write(0, 8)   # frame number 0 (UTF-8 single byte)
    bw.write(n - 1, 8)
    hdr = bytes(bw.out)
    bw.write(flac._crc8(hdr), 8)
    # subframe: pad 0, type LPC order 1 (100000), no wasted bits
    bw.write(0, 1)
    bw.write(32, 6)
    bw.write(0, 1)
    bw.write(expected[0] & 0xFFFF, 16)  # warmup
    bw.write(11, 4)                     # precision-1 -> 12 bits
    bw.write(2, 5)                      # shift
    bw.write(3, 12)                     # coefficient
    bw.write(1, 2)                      # residual method 1 (rice5)
    bw.write(1, 4)                      # partition order 1
    # partition 0: 3 residuals, rice param 2
    bw.write(2, 5)
    for e in resid[:3]:
        u = (abs(e) << 1) - (1 if e < 0 else 0)
        bw.write_unary(u >> 2)
        bw.write(u & 3, 2)
    # partition 1: raw-bits escape, 5 bits each
    bw.write(31, 5)
    bw.write(5, 5)
    for e in resid[3:]:
        bw.write(e & 0x1F, 5)
    bw.align()
    frame = bytes(bw.out)
    payload += frame + struct.pack(">H", flac._crc16(frame))

    d = flac.decode_flac(bytes(payload))
    assert d["n_samples"] == n
    assert flac.decode_flac_samples(bytes(payload)) == [expected]
    assert d["sample_sum"] == sum(expected)
    assert d["md5_ok"] is None  # MD5 unknown in STREAMINFO


def test_flac_wasted_bits_and_verbatim_hand_vector():
    """VERBATIM subframe with 2 wasted bits: stored samples are the
    true samples >> 2 at bps-2 width; the decoder must shift back."""
    n = 4
    true = [-8, 12, 400, -1024]  # all divisible by 4
    si = flac._BitsW()
    si.write(n, 16)
    si.write(n, 16)
    si.write(0, 24)
    si.write(0, 24)
    si.write(8000, 20)
    si.write(0, 3)
    si.write(15, 5)
    si.write(n, 36)
    body = bytes(si.out) + b"\x00" * 16
    payload = bytearray(b"fLaC")
    payload += bytes([0x80]) + len(body).to_bytes(3, "big") + body

    bw = flac._BitsW()
    bw.write(0x3FFE, 14)
    bw.write(0, 2)
    bw.write(6, 4)
    bw.write(0, 4)
    bw.write(0, 4)
    bw.write(0, 3)
    bw.write(0, 1)
    bw.write(0, 8)
    bw.write(n - 1, 8)
    hdr = bytes(bw.out)
    bw.write(flac._crc8(hdr), 8)
    bw.write(0, 1)
    bw.write(1, 6)   # VERBATIM
    bw.write(1, 1)   # wasted-bits flag
    bw.write(1, 2)   # unary 2 -> '01' (k = 1 + 1)
    for s in true:
        bw.write((s >> 2) & 0x3FFF, 14)  # bps 16 - 2 wasted
    bw.align()
    frame = bytes(bw.out)
    payload += frame + struct.pack(">H", flac._crc16(frame))
    assert flac.decode_flac_samples(bytes(payload)) == [true]
