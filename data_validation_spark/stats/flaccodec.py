"""Pure-Python FLAC codec (RFC 9639 / flac format spec, public).

Closes most of the compressed-audio seam in ``multimodal.decode_audio``:
this image has no soundfile/libsndfile, so FLAC payloads were previously
sniffable but not decodable. Scope:

* ``decode(data) -> (int16-or-int32 samples [n, channels], rate)`` —
  subframe types CONSTANT / VERBATIM / FIXED(0-4) / LPC(1-32), partitioned
  Rice residuals (both 4- and 5-bit parameter widths + raw escapes),
  wasted bits, all four channel assignments (independent, left/side,
  right/side, mid/side), 8/12/16/20/24-bit samples, frame-header CRC-8 and
  frame CRC-16 verified.
* ``encode(samples, rate, ...)`` — real (lossless) encoder used for
  fixtures: CONSTANT/FIXED(0-2) subframes chosen per channel, Rice or
  raw-escape residuals, independent / left-side / mid-side stereo.

Because FLAC is lossless, the roundtrip test pins the whole stack
bit-exactly: ``decode(encode(x)) == x`` for any int16 signal — there is no
quantization to hide an off-by-one. The Rice layer is additionally pinned
by a hand-computed bit-level golden in ``tests/test_flaccodec.py``.

MP3/Ogg remain behind the soundfile seam (perceptual codecs are out of
scope for an integrity-checking engine; FLAC/WAV are the archival formats
a training corpus would carry).
"""

from __future__ import annotations

import struct
from typing import Optional

import numpy as np

# ----------------------------------------------------------------- CRCs ----
_CRC8_TBL = []
for _b in range(256):
    _c = _b
    for _ in range(8):
        _c = ((_c << 1) ^ 0x07) & 0xFF if _c & 0x80 else (_c << 1) & 0xFF
    _CRC8_TBL.append(_c)

_CRC16_TBL = []
for _b in range(256):
    _c = _b << 8
    for _ in range(8):
        _c = ((_c << 1) ^ 0x8005) & 0xFFFF if _c & 0x8000 else (_c << 1) & 0xFFFF
    _CRC16_TBL.append(_c)


def crc8(data: bytes) -> int:
    c = 0
    for b in data:
        c = _CRC8_TBL[c ^ b]
    return c


def crc16(data: bytes) -> int:
    c = 0
    for b in data:
        c = _CRC16_TBL[((c >> 8) ^ b) & 0xFF] ^ ((c << 8) & 0xFFFF)
    return c


# --------------------------------------------------------------- bit IO ----
class BitReader:
    __slots__ = ("data", "pos")

    def __init__(self, data: bytes, pos_bits: int = 0):
        self.data = data
        self.pos = pos_bits

    def read(self, n: int) -> int:
        """Read n bits MSB-first as an unsigned int."""
        out = 0
        p = self.pos
        data = self.data
        end = p + n
        if end > len(data) * 8:
            raise EOFError("flac: truncated bitstream")
        while n:
            byte = data[p >> 3]
            avail = 8 - (p & 7)
            take = avail if avail < n else n
            out = (out << take) | ((byte >> (avail - take)) & ((1 << take) - 1))
            p += take
            n -= take
        self.pos = end
        return out

    def read_signed(self, n: int) -> int:
        v = self.read(n)
        return v - (1 << n) if n and v >= (1 << (n - 1)) else v

    def read_unary(self) -> int:
        """Count 0 bits until the terminating 1."""
        q = 0
        data = self.data
        p = self.pos
        total = len(data) * 8
        while True:
            if p >= total:
                raise EOFError("flac: truncated unary code")
            byte = data[p >> 3]
            rem = 8 - (p & 7)
            window = byte & ((1 << rem) - 1)
            if window == 0:
                q += rem
                p += rem
                continue
            lead = rem - window.bit_length()
            q += lead
            p += lead + 1
            self.pos = p
            return q

    def align(self) -> None:
        self.pos = (self.pos + 7) & ~7


class BitWriter:
    __slots__ = ("buf", "acc", "nbits")

    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, n: int) -> None:
        if n == 0:
            return
        self.acc = (self.acc << n) | (value & ((1 << n) - 1))
        self.nbits += n
        while self.nbits >= 8:
            self.nbits -= 8
            self.buf.append((self.acc >> self.nbits) & 0xFF)
        self.acc &= (1 << self.nbits) - 1

    def write_unary(self, q: int) -> None:
        while q >= 32:
            self.write(0, 32)
            q -= 32
        self.write(1, q + 1)

    def align(self) -> None:
        if self.nbits:
            self.write(0, 8 - self.nbits)

    def getvalue(self) -> bytes:
        assert self.nbits == 0
        return bytes(self.buf)


# ------------------------------------------------------------- decoding ----
_BLOCKSIZE_TBL = {
    0x1: 192, 0x2: 576, 0x3: 1152, 0x4: 2304, 0x5: 4608,
    0x8: 256, 0x9: 512, 0xA: 1024, 0xB: 2048, 0xC: 4096,
    0xD: 8192, 0xE: 16384, 0xF: 32768,
}
_RATE_TBL = {
    0x1: 88200, 0x2: 176400, 0x3: 192000, 0x4: 8000, 0x5: 16000,
    0x6: 22050, 0x7: 24000, 0x8: 32000, 0x9: 44100, 0xA: 48000, 0xB: 96000,
}
_BPS_TBL = {0x1: 8, 0x2: 12, 0x4: 16, 0x5: 20, 0x6: 24, 0x7: 32}

_FIXED_COEFS = {
    0: [],
    1: [1],
    2: [2, -1],
    3: [3, -3, 1],
    4: [4, -6, 4, -1],
}


def _read_utf8_number(br: BitReader) -> int:
    """FLAC's UTF-8-style frame/sample number (up to 7 bytes)."""
    b0 = br.read(8)
    if b0 < 0x80:
        return b0
    n = 0
    probe = b0
    while probe & 0x40:
        n += 1
        probe <<= 1
    val = b0 & (0x3F >> n)
    for _ in range(n):
        cont = br.read(8)
        if cont & 0xC0 != 0x80:
            raise ValueError("flac: bad UTF-8 coded number")
        val = (val << 6) | (cont & 0x3F)
    return val


def _decode_residual(br: BitReader, block_size: int, order: int) -> list[int]:
    method = br.read(2)
    if method > 1:
        raise ValueError("flac: reserved residual method")
    pbits = 4 + method
    escape = (1 << pbits) - 1
    porder = br.read(4)
    nparts = 1 << porder
    if block_size % nparts:
        raise ValueError("flac: block size not divisible by partition count")
    if (block_size >> porder) <= order and nparts > 1:
        raise ValueError("flac: first partition would be empty")
    out: list[int] = []
    for part in range(nparts):
        n = (block_size >> porder) - (order if part == 0 else 0)
        param = br.read(pbits)
        if param == escape:
            width = br.read(5)
            for _ in range(n):
                out.append(br.read_signed(width) if width else 0)
        else:
            for _ in range(n):
                q = br.read_unary()
                v = (q << param) | br.read(param)
                out.append((v >> 1) ^ -(v & 1))
    return out


def _decode_subframe(br: BitReader, block_size: int, bps: int) -> list[int]:
    if br.read(1):
        raise ValueError("flac: subframe padding bit set")
    stype = br.read(6)
    wasted = 0
    if br.read(1):
        wasted = br.read_unary() + 1
        bps -= wasted
    if stype == 0:  # CONSTANT
        v = br.read_signed(bps)
        samples = [v] * block_size
    elif stype == 1:  # VERBATIM
        samples = [br.read_signed(bps) for _ in range(block_size)]
    elif 8 <= stype <= 12:  # FIXED order 0-4
        order = stype - 8
        samples = [br.read_signed(bps) for _ in range(order)]
        resid = _decode_residual(br, block_size, order)
        coefs = _FIXED_COEFS[order]
        for r in resid:
            pred = 0
            for c, s in zip(coefs, reversed(samples[-order:] if order else [])):
                pred += c * s
            samples.append(r + pred)
    elif stype >= 32:  # LPC order 1-32
        order = stype - 31
        samples = [br.read_signed(bps) for _ in range(order)]
        precision = br.read(4) + 1
        if precision == 16:
            raise ValueError("flac: invalid qlp precision")
        shift = br.read_signed(5)
        coefs = [br.read_signed(precision) for _ in range(order)]
        resid = _decode_residual(br, block_size, order)
        for r in resid:
            acc = 0
            hist = samples[-order:]
            for c, s in zip(coefs, reversed(hist)):
                acc += c * s
            samples.append(r + (acc >> shift))
    else:
        raise ValueError(f"flac: reserved subframe type {stype}")
    if wasted:
        samples = [s << wasted for s in samples]
    return samples


def decode(data: bytes) -> Optional[tuple[np.ndarray, int]]:
    """FLAC bytes → (samples[n, channels] int32, rate), or None if not FLAC
    / undecodable. CRC-8 (frame header) and CRC-16 (whole frame) verified."""
    full = decode_full(data)
    return None if full is None else full[:2]


def decode_full(data: bytes) -> Optional[tuple[np.ndarray, int, int]]:
    """Like :func:`decode` but also returns the stream's bits-per-sample
    (callers normalizing to int16 need it for >16-bit streams)."""
    try:
        return _decode(data)
    except Exception:
        return None


def _decode(data: bytes) -> Optional[tuple[np.ndarray, int]]:
    if data[:4] != b"fLaC":
        return None
    pos = 4
    rate = channels = bps = None
    total = 0
    # metadata blocks
    while True:
        hdr = data[pos : pos + 4]
        last = hdr[0] >> 7
        btype = hdr[0] & 0x7F
        length = int.from_bytes(hdr[1:4], "big")
        body = data[pos + 4 : pos + 4 + length]
        if btype == 0:  # STREAMINFO
            br = BitReader(body)
            br.read(16)  # min blocksize
            br.read(16)  # max blocksize
            br.read(24)
            br.read(24)
            rate = br.read(20)
            channels = br.read(3) + 1
            bps = br.read(5) + 1
            total = br.read(36)
        pos += 4 + length
        if last:
            break
    if rate is None:
        raise ValueError("flac: missing STREAMINFO")

    chans: list[list[int]] = [[] for _ in range(channels)]
    n_out = 0
    while pos < len(data) and (total == 0 or n_out < total):
        frame_start = pos
        br = BitReader(data, pos * 8)
        sync = br.read(14)
        if sync != 0x3FFE:
            raise ValueError("flac: lost frame sync")
        br.read(1)  # reserved
        br.read(1)  # blocking strategy
        bs_code = br.read(4)
        sr_code = br.read(4)
        ch_code = br.read(4)
        ss_code = br.read(3)
        br.read(1)  # reserved
        _read_utf8_number(br)
        if bs_code == 0x6:
            block_size = br.read(8) + 1
        elif bs_code == 0x7:
            block_size = br.read(16) + 1
        else:
            block_size = _BLOCKSIZE_TBL[bs_code]
        if sr_code == 0xC:
            br.read(8)
        elif sr_code in (0xD, 0xE):
            br.read(16)
        frame_rate = rate if sr_code == 0 else _RATE_TBL.get(sr_code, rate)
        frame_bps = bps if ss_code == 0 else _BPS_TBL[ss_code]
        hdr_end = (br.pos + 7) // 8
        if crc8(data[frame_start:hdr_end]) != br.read(8):
            raise ValueError("flac: frame header CRC mismatch")

        if ch_code < 8:
            n_ch = ch_code + 1
            subs = [
                _decode_subframe(br, block_size, frame_bps) for _ in range(n_ch)
            ]
        elif ch_code in (8, 9, 10):
            n_ch = 2
            # the difference channel carries one extra bit
            if ch_code == 8:  # left/side
                left = _decode_subframe(br, block_size, frame_bps)
                side = _decode_subframe(br, block_size, frame_bps + 1)
                subs = [left, [l - s for l, s in zip(left, side)]]
            elif ch_code == 9:  # right/side
                side = _decode_subframe(br, block_size, frame_bps + 1)
                right = _decode_subframe(br, block_size, frame_bps)
                subs = [[r + s for r, s in zip(right, side)], right]
            else:  # mid/side: m2 = mid<<1 | (side&1); l = (m2+s)/2, r = (m2-s)/2
                mid = _decode_subframe(br, block_size, frame_bps)
                side = _decode_subframe(br, block_size, frame_bps + 1)
                subs = [
                    [(((m << 1) | (s & 1)) + s) >> 1 for m, s in zip(mid, side)],
                    [(((m << 1) | (s & 1)) - s) >> 1 for m, s in zip(mid, side)],
                ]
        else:
            raise ValueError("flac: reserved channel assignment")
        if n_ch != channels:
            raise ValueError("flac: channel count change unsupported")
        br.align()
        fcrc = br.read(16)
        if crc16(data[frame_start : (br.pos // 8) - 2]) != fcrc:
            raise ValueError("flac: frame CRC-16 mismatch")
        for c in range(channels):
            chans[c].extend(subs[c])
        n_out += block_size
        pos = br.pos // 8
        _ = frame_rate

    if total and n_out < total:
        raise ValueError(f"flac: truncated stream ({n_out}/{total} samples)")
    arr = np.array(chans, dtype=np.int64).T
    if total:
        arr = arr[:total]
    return arr.astype(np.int32), rate, bps


# ------------------------------------------------------------- encoding ----
def _rice_cost(resid: list[int], param: int) -> int:
    c = 0
    for r in resid:
        v = (r << 1) ^ (r >> 63) if r >= 0 else ((-r - 1) << 1 | 1)
        c += (v >> param) + 1 + param
    return c


def _best_rice_param(resid: list[int]) -> int:
    if not resid:
        return 0
    mean = sum(abs(r) for r in resid) / len(resid)
    base = max(0, int(mean).bit_length() - 1)
    best, best_cost = 0, None
    for p in range(max(0, base - 1), min(14, base + 3) + 1):
        cost = _rice_cost(resid, p)
        if best_cost is None or cost < best_cost:
            best, best_cost = p, cost
    return best


def _write_utf8_number(bw: BitWriter, v: int) -> None:
    """FLAC's UTF-8-style coded number, full multi-byte forms (the decoder's
    ``_read_utf8_number`` inverse). Frame numbers can exceed 0x800 on long
    inputs, so the general encoding is required for correctness."""
    if v < 0x80:
        bw.write(v, 8)
        return
    # count continuation bytes needed: n bytes carry 6n bits + (6 - n) lead
    n = 1
    while v >= (1 << (6 * n + (6 - n))):
        n += 1
    lead = (0xFF << (7 - n)) & 0xFF  # n+1 leading 1-bits then a 0
    bw.write(lead | (v >> (6 * n)), 8)
    for i in range(n - 1, -1, -1):
        bw.write(0x80 | ((v >> (6 * i)) & 0x3F), 8)


# residual widths above this encode as raw escapes instead of Rice codes;
# unreachable from int16 input through FIXED(≤2) (max residual width 20) —
# tests lower it to pin the decoder's escape path
_ESCAPE_WIDTH = 20


def _write_residual(bw: BitWriter, resid: list[int]) -> None:
    """Partition order 0; Rice when residuals are small, raw escape else."""
    maxmag = max((abs(r) for r in resid), default=0)
    width = (maxmag.bit_length() + 1) if maxmag else 0
    bw.write(0, 2)  # 4-bit rice parameters
    bw.write(0, 4)  # partition order 0
    if width > _ESCAPE_WIDTH:  # escape: raw two's-complement at fixed width
        bw.write(0xF, 4)
        bw.write(width, 5)
        for r in resid:
            bw.write(r & ((1 << width) - 1), width)
        return
    param = _best_rice_param(resid)
    bw.write(param, 4)
    for r in resid:
        v = (r << 1) if r >= 0 else ((-r - 1) << 1 | 1)
        bw.write_unary(v >> param)
        bw.write(v & ((1 << param) - 1), param)


def _encode_subframe(bw: BitWriter, x: list[int], bps: int) -> None:
    if all(v == x[0] for v in x):
        bw.write(0, 1)
        bw.write(0, 6)  # CONSTANT
        bw.write(0, 1)
        bw.write(x[0] & ((1 << bps) - 1), bps)
        return
    # pick the FIXED order 0-2 with the smallest residual magnitude sum
    cands = []
    for order, coefs in ((0, []), (1, [1]), (2, [2, -1])):
        if len(x) <= order:
            continue
        resid = []
        for i in range(order, len(x)):
            pred = sum(c * x[i - 1 - j] for j, c in enumerate(coefs))
            resid.append(x[i] - pred)
        cands.append((sum(abs(r) for r in resid), order, resid))
    _, order, resid = min(cands)
    bw.write(0, 1)
    bw.write(8 + order, 6)  # FIXED
    bw.write(0, 1)  # no wasted bits
    for i in range(order):
        bw.write(x[i] & ((1 << bps) - 1), bps)
    _write_residual(bw, resid)


def encode(
    samples: np.ndarray,
    sample_rate: int = 16000,
    block_size: int = 4096,
    stereo_mode: str = "indep",
) -> bytes:
    """int16 samples (n,) or (n, channels) → FLAC bytes (lossless).

    ``stereo_mode``: 'indep', 'leftside', or 'midside' (2-channel input
    only) — exercises the decoder's channel-decorrelation paths."""
    x = np.asarray(samples)
    if x.ndim == 1:
        x = x[:, None]
    n, channels = x.shape
    if stereo_mode != "indep" and channels != 2:
        raise ValueError("stereo_mode requires 2 channels")
    bps = 16
    x = x.astype(np.int64)

    out = bytearray(b"fLaC")
    si = BitWriter()
    si.write(block_size, 16)
    si.write(block_size, 16)
    si.write(0, 24)
    si.write(0, 24)
    si.write(sample_rate, 20)
    si.write(channels - 1, 3)
    si.write(bps - 1, 5)
    si.write(n, 36)
    body = si.getvalue() + bytes(16)  # md5 unknown (all zero, spec-legal)
    out += bytes([0x80]) + len(body).to_bytes(3, "big") + body  # last STREAMINFO

    for fi, start in enumerate(range(0, n, block_size)):
        blk = x[start : start + block_size]
        bs = len(blk)
        bw = BitWriter()
        bw.write(0x3FFE, 14)
        bw.write(0, 1)
        bw.write(0, 1)  # fixed blocking strategy
        if bs == block_size and bs in (256, 512, 1024, 2048, 4096, 8192, 16384, 32768):
            bw.write(8 + (bs.bit_length() - 9), 4)
            bs_follow = None
        else:
            bw.write(0x7, 4)
            bs_follow = bs - 1
        bw.write(0, 4)  # sample rate from STREAMINFO
        if stereo_mode == "leftside":
            bw.write(8, 4)
        elif stereo_mode == "midside":
            bw.write(10, 4)
        else:
            bw.write(channels - 1, 4)
        bw.write(0x4, 3)  # 16 bps
        bw.write(0, 1)
        _write_utf8_number(bw, fi)
        if bs_follow is not None:
            bw.write(bs_follow, 16)
        bw.align()
        hdr = bw.getvalue()
        bw2 = BitWriter()
        for b in hdr:
            bw2.write(b, 8)
        bw2.write(crc8(hdr), 8)

        if stereo_mode == "leftside":
            left = blk[:, 0].tolist()
            side = (blk[:, 0] - blk[:, 1]).tolist()
            _encode_subframe(bw2, left, bps)
            _encode_subframe(bw2, side, bps + 1)
        elif stereo_mode == "midside":
            side = (blk[:, 0] - blk[:, 1]).tolist()
            mid = ((blk[:, 0] + blk[:, 1]) >> 1).tolist()
            _encode_subframe(bw2, mid, bps)
            _encode_subframe(bw2, side, bps + 1)
        else:
            for c in range(channels):
                _encode_subframe(bw2, blk[:, c].tolist(), bps)
        bw2.align()
        frame = bw2.getvalue()
        out += frame + struct.pack(">H", crc16(frame))
    return bytes(out)
