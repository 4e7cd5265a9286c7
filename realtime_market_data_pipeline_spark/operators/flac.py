"""Pure-Python FLAC codec (the xiph.org free lossless audio format),
stdlib only — the compressed-audio twin of operators/jpeg.py.

mp3/ogg-vorbis are perceptual codecs that genuinely need external
libraries, but FLAC — the interchange format speech/audio training
corpora actually ship — is pure integer arithmetic and implements
cleanly without one:

- **Decoder** (`decode_flac`): fLaC marker + metadata-block walk
  (STREAMINFO parsed, others skipped), then per-frame: header parse
  with CRC-8 verification (poly 0x07) and UTF-8-coded frame numbers,
  subframe decode for all four types — CONSTANT, VERBATIM, FIXED
  orders 0-4, and LPC (quantized-coefficient linear prediction with
  signed shift) — rice-coded residuals in both 4-bit and 5-bit
  parameter variants with partition orders and raw-bits escapes,
  wasted-bits unpacking, left/side, right/side and mid/side stereo
  decorrelation, and whole-frame CRC-16 (poly 0x8005) verification.
  Lossless by construction: output samples are bit-exact.
- **Encoder** (`encode_flac`): a spec-valid subset for planting
  deterministic test media — 8/16/24-bit PCM, mono or stereo
  (independent or mid/side), CONSTANT subframes for constant blocks,
  FIXED order 0-2 subframes with single-partition rice residuals
  otherwise, correct CRC-8/CRC-16 and a real MD5 of the unencoded
  samples in STREAMINFO. Any conformant FLAC reader decodes its
  output; round-trips through the decoder are sample-exact.

Reference parity note: the reference repo has no media path; this
extends the engine's multimodal surface (same brief as JPEG/PNG/AVI).
"""

from __future__ import annotations

import hashlib
import struct


def _crc8(data: bytes) -> int:
    crc = 0
    for b in data:
        crc ^= b
        for _ in range(8):
            crc = ((crc << 1) ^ 0x07) & 0xFF if crc & 0x80 else (crc << 1) & 0xFF
    return crc


def _crc16(data: bytes) -> int:
    crc = 0
    for b in data:
        crc ^= b << 8
        for _ in range(8):
            crc = (
                ((crc << 1) ^ 0x8005) & 0xFFFF
                if crc & 0x8000
                else (crc << 1) & 0xFFFF
            )
    return crc


class _Bits:
    """MSB-first bit reader over bytes, tracking byte position for the
    frame-level CRC slices."""

    def __init__(self, buf: bytes, pos: int = 0) -> None:
        self.buf = buf
        self.pos = pos  # byte position of the NEXT unread byte
        self.acc = 0
        self.n = 0

    def read(self, k: int) -> int:
        while self.n < k:
            if self.pos >= len(self.buf):
                raise ValueError("FLAC bitstream truncated")
            self.acc = (self.acc << 8) | self.buf[self.pos]
            self.pos += 1
            self.n += 8
        self.n -= k
        v = (self.acc >> self.n) & ((1 << k) - 1)
        self.acc &= (1 << self.n) - 1
        return v

    def read_signed(self, k: int) -> int:
        v = self.read(k)
        return v - (1 << k) if v >= (1 << (k - 1)) else v

    def read_unary(self) -> int:
        q = 0
        while self.read(1) == 0:
            q += 1
        return q

    def align(self) -> None:
        self.acc = 0
        self.n = 0


class _BitsW:
    """MSB-first bit writer."""

    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, v: int, k: int) -> None:
        self.acc = (self.acc << k) | (v & ((1 << k) - 1))
        self.n += k
        while self.n >= 8:
            self.n -= 8
            self.out.append((self.acc >> self.n) & 0xFF)
        self.acc &= (1 << self.n) - 1

    def write_unary(self, q: int) -> None:
        while q >= 32:
            self.write(0, 32)
            q -= 32
        self.write(1, q + 1)

    def align(self) -> None:
        if self.n:
            self.write(0, 8 - self.n)


_FIXED_COEFS = {
    0: [],
    1: [1],
    2: [2, -1],
    3: [3, -3, 1],
    4: [4, -6, 4, -1],
}

_BLOCKSIZE_TABLE = {
    1: 192, 2: 576, 3: 1152, 4: 2304, 5: 4608,
    8: 256, 9: 512, 10: 1024, 11: 2048, 12: 4096,
    13: 8192, 14: 16384, 15: 32768,
}

_SAMPLE_SIZE_TABLE = {1: 8, 2: 12, 4: 16, 5: 20, 6: 24, 7: 32}


def _read_utf8_number(r: _Bits) -> int:
    """FLAC's extended UTF-8 coded number (frame/sample index)."""
    b0 = r.read(8)
    if b0 < 0x80:
        return b0
    n = 0
    mask = 0x80
    while b0 & mask:
        n += 1
        mask >>= 1
    if n < 2 or n > 7:
        raise ValueError("invalid UTF-8 coded number")
    v = b0 & (mask - 1)
    for _ in range(n - 1):
        c = r.read(8)
        if c & 0xC0 != 0x80:
            raise ValueError("invalid UTF-8 continuation")
        v = (v << 6) | (c & 0x3F)
    return v


def _write_utf8_number(bw: _BitsW, v: int) -> None:
    if v < 0x80:
        bw.write(v, 8)
        return
    # minimal multi-byte form
    for n in range(2, 8):
        if v < (1 << (5 * n + 1)):
            break
    lead = (0xFF << (8 - n)) & 0xFF
    shifts = 6 * (n - 1)
    bw.write(lead | (v >> shifts), 8)
    for i in range(n - 1):
        shifts -= 6
        bw.write(0x80 | ((v >> shifts) & 0x3F), 8)


def _decode_residual(r: _Bits, n: int, order: int) -> list[int]:
    """Rice-coded residual (RESIDUAL_CODING_METHOD_PARTITIONED_RICE /
    _RICE2): partitions, per-partition parameter, raw-bits escape,
    zigzag rice decode."""
    method = r.read(2)
    if method > 1:
        raise NotImplementedError(f"residual coding method {method}")
    plen = 4 if method == 0 else 5
    escape = (1 << plen) - 1
    po = r.read(4)
    nparts = 1 << po
    if n % nparts:
        raise ValueError("blocksize not divisible by rice partitions")
    out: list[int] = []
    for p in range(nparts):
        cnt = n // nparts - (order if p == 0 else 0)
        if cnt < 0:
            raise ValueError("rice partition underflow")
        param = r.read(plen)
        if param == escape:
            raw = r.read(5)
            for _ in range(cnt):
                out.append(r.read_signed(raw) if raw else 0)
        else:
            for _ in range(cnt):
                q = r.read_unary()
                u = (q << param) | (r.read(param) if param else 0)
                out.append((u >> 1) ^ -(u & 1))  # zigzag
    return out


def _decode_subframe(r: _Bits, n: int, bps: int) -> list[int]:
    if r.read(1):
        raise ValueError("subframe padding bit set")
    ftype = r.read(6)
    wasted = 0
    if r.read(1):
        wasted = 1 + r.read_unary()
        bps -= wasted
    if ftype == 0:  # CONSTANT
        v = r.read_signed(bps)
        samples = [v] * n
    elif ftype == 1:  # VERBATIM
        samples = [r.read_signed(bps) for _ in range(n)]
    elif 8 <= ftype <= 12:  # FIXED order 0-4
        order = ftype - 8
        samples = [r.read_signed(bps) for _ in range(order)]
        resid = _decode_residual(r, n, order)
        coefs = _FIXED_COEFS[order]
        for e in resid:
            pred = sum(
                c * samples[-1 - j] for j, c in enumerate(coefs)
            )
            samples.append(e + pred)
    elif ftype >= 32:  # LPC order 1-32
        order = ftype - 31
        samples = [r.read_signed(bps) for _ in range(order)]
        prec = r.read(4) + 1
        if prec == 16:
            raise ValueError("invalid LPC precision escape")
        shift = r.read_signed(5)
        if shift < 0:
            raise ValueError("negative LPC shift")
        coefs = [r.read_signed(prec) for _ in range(order)]
        resid = _decode_residual(r, n, order)
        for e in resid:
            acc = sum(c * samples[-1 - j] for j, c in enumerate(coefs))
            samples.append(e + (acc >> shift))
    else:
        raise ValueError(f"reserved subframe type {ftype}")
    if wasted:
        samples = [s << wasted for s in samples]
    return samples


def _decode_flac_core(payload: bytes):
    """Single decode pass: returns (sample_rate, n_channels, bps,
    md5_declared, channels, n_samples) with every frame CRC verified."""
    if payload[:4] != b"fLaC":
        raise NotImplementedError(
            "only native FLAC decodes here (no ogg-flac container)"
        )
    pos = 4
    streaminfo = None
    while True:
        if pos + 4 > len(payload):
            raise ValueError("FLAC metadata truncated")
        hdr = payload[pos]
        last = hdr >> 7
        btype = hdr & 0x7F
        (length,) = struct.unpack(">I", b"\x00" + payload[pos + 1 : pos + 4])
        body = payload[pos + 4 : pos + 4 + length]
        if btype == 0:
            if length != 34:
                raise ValueError("bad STREAMINFO length")
            r = _Bits(body)
            r.read(16)  # min blocksize
            r.read(16)  # max blocksize
            r.read(24)
            r.read(24)
            rate = r.read(20)
            nch = r.read(3) + 1
            bps = r.read(5) + 1
            total = r.read(36)
            md5 = body[18:34]
            streaminfo = (rate, nch, bps, total, md5)
        elif btype == 127:
            raise ValueError("invalid metadata block type")
        pos += 4 + length
        if last:
            break
    if streaminfo is None:
        raise ValueError("FLAC missing STREAMINFO")
    rate, nch, bps, total, md5 = streaminfo

    channels_out: list[list[int]] = [[] for _ in range(nch)]
    n_samples = 0
    while pos < len(payload):
        frame_start = pos
        r = _Bits(payload, pos)
        sync = r.read(14)
        if sync != 0x3FFE:
            raise ValueError(f"bad frame sync at {frame_start}")
        if r.read(1):
            raise ValueError("frame reserved bit set")
        r.read(1)  # blocking strategy
        bs_code = r.read(4)
        sr_code = r.read(4)
        ch_code = r.read(4)
        ss_code = r.read(3)
        if r.read(1):
            raise ValueError("frame reserved bit set")
        _read_utf8_number(r)
        if bs_code == 0:
            raise ValueError("reserved blocksize code")
        elif bs_code == 6:
            n = r.read(8) + 1
        elif bs_code == 7:
            n = r.read(16) + 1
        else:
            n = _BLOCKSIZE_TABLE[bs_code]
        if sr_code == 12:
            r.read(8)
        elif sr_code in (13, 14):
            r.read(16)
        elif sr_code == 15:
            raise ValueError("invalid sample rate code")
        if ss_code == 0:
            fbps = bps
        elif ss_code == 3:
            raise ValueError("reserved sample size code")
        else:
            fbps = _SAMPLE_SIZE_TABLE[ss_code]
        hdr_crc = r.read(8)
        if _crc8(payload[frame_start : r.pos - 1]) != hdr_crc:
            raise ValueError("frame header CRC-8 mismatch")

        if ch_code < 8:
            fch = ch_code + 1
            if fch != nch:
                raise ValueError("frame/streaminfo channel mismatch")
            chans = [
                _decode_subframe(r, n, fbps) for _ in range(fch)
            ]
        elif ch_code in (8, 9, 10):
            if nch != 2:
                raise ValueError("stereo decorrelation in non-stereo stream")
            if ch_code == 8:  # left/side
                left = _decode_subframe(r, n, fbps)
                side = _decode_subframe(r, n, fbps + 1)
                chans = [left, [l - s for l, s in zip(left, side)]]
            elif ch_code == 9:  # right/side
                side = _decode_subframe(r, n, fbps + 1)
                right = _decode_subframe(r, n, fbps)
                chans = [[rr + s for rr, s in zip(right, side)], right]
            else:  # mid/side
                mid = _decode_subframe(r, n, fbps)
                side = _decode_subframe(r, n, fbps + 1)
                left, rightc = [], []
                for m, s in zip(mid, side):
                    m = (m << 1) | (s & 1)
                    left.append((m + s) >> 1)
                    rightc.append((m - s) >> 1)
                chans = [left, rightc]
        else:
            raise ValueError(f"reserved channel assignment {ch_code}")
        r.align()
        foot_crc = struct.unpack_from(">H", payload, r.pos)[0]
        if _crc16(payload[frame_start : r.pos]) != foot_crc:
            raise ValueError("frame CRC-16 mismatch")
        pos = r.pos + 2
        for ci in range(nch):
            channels_out[ci].extend(chans[ci])
        n_samples += n

    return rate, nch, bps, md5, channels_out, n_samples


def decode_flac(payload: bytes) -> dict:
    """Decode a native-FLAC stream. Returns {"format", "sample_rate",
    "n_channels", "bits_per_sample", "n_samples", "sample_sum",
    "sample_peak", "md5_ok"} — n_samples counts frames' samples per
    channel; sum/peak fold over every channel's samples; md5_ok
    verifies the decoded audio against STREAMINFO's signature when one
    is present (the strongest possible whole-file check). Raw
    struct/index errors from corrupted structures are normalized to
    ValueError (two-exception contract for untrusted bytes)."""
    try:
        rate, nch, bps, md5, channels_out, n_samples = _decode_flac_core(
            payload
        )
    except (struct.error, IndexError, KeyError) as e:
        raise ValueError(f"malformed FLAC ({type(e).__name__}: {e})") from e
    md5_ok = None
    if md5 != b"\x00" * 16:
        width = (bps + 7) // 8
        h = hashlib.md5()
        for i in range(n_samples):
            for ci in range(nch):
                h.update(
                    (channels_out[ci][i] & ((1 << (8 * width)) - 1)).to_bytes(
                        width, "little"
                    )
                )
        md5_ok = h.digest() == md5
    allsamp = [s for ch in channels_out for s in ch]
    return {
        "format": "flac",
        "sample_rate": rate,
        "n_channels": nch,
        "bits_per_sample": bps,
        "n_samples": n_samples,
        "sample_sum": sum(allsamp),
        "sample_peak": max((abs(s) for s in allsamp), default=0),
        "md5_ok": md5_ok,
    }


def decode_flac_samples(payload: bytes) -> list[list[int]]:
    """Raster twin of decode_flac: per-channel decoded sample lists."""
    try:
        return _decode_flac_core(payload)[4]
    except (struct.error, IndexError, KeyError) as e:
        raise ValueError(f"malformed FLAC ({type(e).__name__}: {e})") from e


def decode_flac_samples_rate(payload: bytes) -> tuple[list[list[int]], int]:
    """Per-channel samples PLUS the sample rate from ONE decode pass —
    the hot-path entry for DSP consumers (audio fingerprinting mixes to
    mono and needs the rate next to the samples; calling decode_flac +
    decode_flac_samples separately decodes the whole stream twice)."""
    try:
        rate, _nch, _bps, _md5, channels_out, _n = _decode_flac_core(payload)
    except (struct.error, IndexError, KeyError) as e:
        raise ValueError(f"malformed FLAC ({type(e).__name__}: {e})") from e
    return channels_out, rate


def _encode_subframe(bw: _BitsW, samples: list[int], bps: int) -> None:
    """Pick CONSTANT for constant blocks, else FIXED with the best of
    orders 0-2 under a single-partition rice residual."""
    bw.write(0, 1)  # padding
    if all(s == samples[0] for s in samples):
        bw.write(0, 6)  # CONSTANT
        bw.write(0, 1)  # no wasted bits
        bw.write(samples[0] & ((1 << bps) - 1), bps)
        return
    best = None
    for order in (0, 1, 2):
        if len(samples) <= order:
            continue
        coefs = _FIXED_COEFS[order]
        resid = [
            samples[i]
            - sum(c * samples[i - 1 - j] for j, c in enumerate(coefs))
            for i in range(order, len(samples))
        ]
        cost = sum(abs(e) for e in resid)
        if best is None or cost < best[2]:
            best = (order, resid, cost)
    order, resid, _ = best
    bw.write(8 + order, 6)  # FIXED order
    bw.write(0, 1)  # no wasted bits
    mask = (1 << bps) - 1
    for s in samples[:order]:
        bw.write(s & mask, bps)
    # single-partition 4-bit rice; param from mean magnitude
    mean = sum(abs(e) for e in resid) // max(len(resid), 1) + 1
    param = min(max(mean.bit_length(), 0), 14)
    bw.write(0, 2)  # method 0
    bw.write(0, 4)  # partition order 0
    bw.write(param, 4)
    for e in resid:
        u = (abs(e) << 1) - (1 if e < 0 else 0)  # zigzag
        q, rem = u >> param, u & ((1 << param) - 1)
        bw.write_unary(q)
        if param:
            bw.write(rem, param)


def encode_flac(
    channels: list[list[int]],
    sample_rate: int = 8000,
    bps: int = 16,
    block_size: int = 256,
    mid_side: bool = False,
) -> bytes:
    """Encode per-channel sample lists (1 or 2 channels, equal lengths)
    as a spec-valid native FLAC stream: STREAMINFO with a real MD5 of
    the unencoded audio, fixed-blocksize frames (8- or 16-bit
    end-of-header blocksize code as the frame size requires),
    CONSTANT/FIXED subframes with rice residuals, optional mid/side
    stereo decorrelation, correct CRC-8/CRC-16."""
    nch = len(channels)
    if nch not in (1, 2):
        raise ValueError("1 or 2 channels only")
    if not 1 <= block_size <= 65535:
        # STREAMINFO carries 16-bit min/max blocksize fields and the
        # 16-bit end-of-header code stores n-1; beyond that the old
        # 8-bit write silently wrapped and corrupted the stream.
        raise ValueError("block_size must be in [1, 65535]")
    total = len(channels[0])
    if any(len(c) != total for c in channels):
        raise ValueError("channel length mismatch")
    if mid_side and nch != 2:
        raise ValueError("mid_side needs stereo")
    width = (bps + 7) // 8
    h = hashlib.md5()
    for i in range(total):
        for ch in channels:
            h.update((ch[i] & ((1 << (8 * width)) - 1)).to_bytes(width, "little"))
    si = _BitsW()
    si.write(block_size, 16)
    si.write(block_size, 16)
    si.write(0, 24)
    si.write(0, 24)
    si.write(sample_rate, 20)
    si.write(nch - 1, 3)
    si.write(bps - 1, 5)
    si.write(total, 36)
    body = bytes(si.out) + h.digest()
    out = bytearray(b"fLaC")
    out += bytes([0x80]) + len(body).to_bytes(3, "big") + body

    frame_no = 0
    for start in range(0, total, block_size):
        blocks = [ch[start : start + block_size] for ch in channels]
        n = len(blocks[0])
        bw = _BitsW()
        bw.write(0x3FFE, 14)
        bw.write(0, 1)
        bw.write(0, 1)  # fixed blocksize stream
        bs_code = 6 if n <= 256 else 7  # 8- vs 16-bit end-of-header size
        bw.write(bs_code, 4)
        bw.write(0, 4)  # sample rate: from STREAMINFO
        ch_code = 10 if mid_side else nch - 1
        bw.write(ch_code, 4)
        bw.write(0, 3)  # sample size: from STREAMINFO
        bw.write(0, 1)
        _write_utf8_number(bw, frame_no)
        bw.write(n - 1, 8 if bs_code == 6 else 16)
        assert bw.n == 0
        hdr = bytes(bw.out)
        bw.write(_crc8(hdr), 8)
        if mid_side:
            mids = [(l + r_) >> 1 for l, r_ in zip(*blocks)]
            sides = [l - r_ for l, r_ in zip(*blocks)]
            _encode_subframe(bw, mids, bps)
            _encode_subframe(bw, sides, bps + 1)
        else:
            for blk in blocks:
                _encode_subframe(bw, blk, bps)
        bw.align()
        frame = bytes(bw.out)
        out += frame + struct.pack(">H", _crc16(frame))
        frame_no += 1
    return bytes(out)
