"""REAL FLAC codec, pure Python (round 13) — lossless compressed audio.

Extends the audio rung of the codec ladder (WAV/PCM, G.711 mu-law, IMA
ADPCM in `multimodal.py`) with the lossless compressed format crawl
audio actually ships in. Both directions are implemented from the
public format spec (RFC 9639 / the xiph FLAC format document):

- ENCODER: `fLaC` magic + STREAMINFO metadata block, fixed-blocksize
  frames (sync 0b11111111111110, UTF-8-coded frame numbers, CRC-8
  header check, CRC-16 frame check), per-channel subframes chosen per
  block from CONSTANT / VERBATIM / FIXED(order 0-4) by exact cost
  comparison, Rice-coded residuals (4-bit parameters, per-partition
  parameter search, escape-to-raw), and stereo decorrelation
  (left/side, right/side, mid/side chosen by exact cost).
- DECODER: the full subset a fixed-blocksize stream can carry —
  CONSTANT / VERBATIM / FIXED / LPC subframes (LPC: arbitrary order,
  signed quantized coefficients, shift), wasted-bits unary prefixes,
  both Rice methods (4- and 5-bit parameters) with escape partitions,
  all four channel assignments (side channels carry bps+1 bits), and
  both CRCs verified on every frame.

Like the image codecs, this is exercised "encode -> decode must be
BIT-EXACT against the source" — FLAC is lossless, so the roundtrip
equality is the whole correctness contract, checked sample-for-sample
(no external codec exists in this environment; the CRC-8/CRC-16
checks and the spec-pinned bit layout keep the bitstream honest, and
tests cover every subframe type and channel mode the decoder speaks).

Format reference: RFC 9639 (FLAC), datatracker.ietf.org/doc/rfc9639.
Reference-repo scope note: sanantachat/us-stock-data-pipeline is
ingest-only and has no codec surface; this extends SURVEY.md SS2D's
multimodal ladder.
"""

from __future__ import annotations

import struct

# ------------------------------------------------------------------ CRCs


def _crc8(data: bytes) -> int:
    """CRC-8, polynomial x^8+x^2+x+1 (0x07), init 0 (FLAC frame header)."""
    crc = 0
    for b in data:
        crc ^= b
        for _ in range(8):
            crc = ((crc << 1) ^ 0x07) & 0xFF if crc & 0x80 else (crc << 1) & 0xFF
    return crc


def _crc16(data: bytes) -> int:
    """CRC-16, polynomial x^16+x^15+x^2+1 (0x8005), init 0 (FLAC frame)."""
    crc = 0
    for b in data:
        crc ^= b << 8
        for _ in range(8):
            crc = ((crc << 1) ^ 0x8005) & 0xFFFF if crc & 0x8000 else (crc << 1) & 0xFFFF
    return crc


# ------------------------------------------------------------------ bits


class _BitWriter:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, nbits: int) -> None:
        if nbits == 0:
            return
        self.acc = (self.acc << nbits) | (value & ((1 << nbits) - 1))
        self.nbits += nbits
        while self.nbits >= 8:
            self.nbits -= 8
            self.buf.append((self.acc >> self.nbits) & 0xFF)
        self.acc &= (1 << self.nbits) - 1

    def write_signed(self, value: int, nbits: int) -> None:
        self.write(value & ((1 << nbits) - 1), nbits)

    def write_unary(self, q: int) -> None:
        while q >= 32:
            self.write(0, 32)
            q -= 32
        self.write(1, q + 1)  # q zeros then a 1

    def align(self) -> None:
        if self.nbits:
            self.write(0, 8 - self.nbits)

    def bytes(self) -> bytes:
        assert self.nbits == 0
        return bytes(self.buf)


class _BitReader:
    def __init__(self, data: bytes, pos: int = 0):
        self.data = data
        self.byte_pos = pos
        self.bit_pos = 0

    def read(self, nbits: int) -> int:
        out = 0
        while nbits:
            if self.byte_pos >= len(self.data):
                raise ValueError("truncated FLAC bitstream")
            avail = 8 - self.bit_pos
            take = min(avail, nbits)
            cur = self.data[self.byte_pos]
            out = (out << take) | ((cur >> (avail - take)) & ((1 << take) - 1))
            self.bit_pos += take
            nbits -= take
            if self.bit_pos == 8:
                self.bit_pos = 0
                self.byte_pos += 1
        return out

    def read_signed(self, nbits: int) -> int:
        v = self.read(nbits)
        return v - (1 << nbits) if v & (1 << (nbits - 1)) else v

    def read_unary(self) -> int:
        q = 0
        while self.read(1) == 0:
            q += 1
        return q

    def align(self) -> None:
        if self.bit_pos:
            self.bit_pos = 0
            self.byte_pos += 1


# ---------------------------------------------------------------- numbers


def _utf8_coded(n: int) -> bytes:
    """FLAC's UTF-8-style variable-length number (frame numbers; the
    scheme is UTF-8's, extended to 36-bit values / 7-byte sequences)."""
    if n < 0x80:
        return bytes([n])
    out = []
    prefixes = [(0x7FF, 0xC0, 1), (0xFFFF, 0xE0, 2), (0x1FFFFF, 0xF0, 3),
                (0x3FFFFFF, 0xF8, 4), (0x7FFFFFFF, 0xFC, 5), (0xFFFFFFFFF, 0xFE, 6)]
    for limit, lead, cont in prefixes:
        if n <= limit:
            out.append(lead | (n >> (6 * cont)))
            for k in range(cont - 1, -1, -1):
                out.append(0x80 | ((n >> (6 * k)) & 0x3F))
            return bytes(out)
    raise ValueError("frame number out of UTF-8-coded range")


def _read_utf8_coded(br: _BitReader) -> int:
    b0 = br.read(8)
    if b0 < 0x80:
        return b0
    n_cont = 0
    mask = 0x40
    while b0 & mask:
        n_cont += 1
        mask >>= 1
    if n_cont == 0:
        raise ValueError("invalid FLAC UTF-8-coded number")
    val = b0 & (mask - 1)
    for _ in range(n_cont):
        c = br.read(8)
        if (c & 0xC0) != 0x80:
            raise ValueError("invalid FLAC UTF-8-coded continuation")
        val = (val << 6) | (c & 0x3F)
    return val


def _zigzag(v: int) -> int:
    return (v << 1) ^ (v >> 63) if v >= 0 else ((-v) << 1) - 1


def _unzigzag(u: int) -> int:
    return (u >> 1) ^ -(u & 1)


# ------------------------------------------------------------- residuals

_FIXED_COEFFS = {
    0: [],
    1: [1],
    2: [2, -1],
    3: [3, -3, 1],
    4: [4, -6, 4, -1],
}


def _fixed_residual(samples: list[int], order: int) -> list[int]:
    res = list(samples)
    for _ in range(order):
        res = [res[i] - res[i - 1] for i in range(1, len(res))]
    return res


def _rice_cost_u(us: list[int], param: int) -> int:
    return sum(u >> param for u in us) + len(us) * (1 + param)


def _rice_cost(residual: list[int], param: int) -> int:
    return _rice_cost_u([_zigzag(r) for r in residual], param)


def _best_rice_param_u(us: list[int], max_param: int = 14) -> tuple[int, int]:
    """(param, bits) over pre-zigzagged residuals: seed from the mean
    magnitude (libFLAC's estimate), refine exactly in a +/-2 window —
    the Rice cost curve is convex in the parameter, so the windowed
    search finds the global optimum the full sweep would."""
    if not us:
        return 0, 0
    mean = sum(us) // len(us)
    p0 = max(0, min(max_param, mean.bit_length() - 1))
    best_p, best_c = None, None
    for p in range(max(0, p0 - 2), min(max_param, p0 + 2) + 1):
        c = _rice_cost_u(us, p)
        if best_c is None or c < best_c:
            best_p, best_c = p, c
    return best_p, best_c


def _best_rice_param(residual: list[int], max_param: int = 14) -> tuple[int, int]:
    return _best_rice_param_u([_zigzag(r) for r in residual], max_param)


def _partition_plan(
    residual: list[int], blocksize: int, pred_order: int
) -> tuple[int, list[tuple[int, int, int]]]:
    """Choose the Rice partition order (0-2) by exact total bit cost
    over windowed-optimal per-partition parameters. Returns (porder,
    [(start, end, param) ...]) over the residual array; per the spec,
    partition 0 of 2^p covers blocksize/2^p - pred_order residuals and
    the rest cover blocksize/2^p each."""
    us_all = [_zigzag(r) for r in residual]
    best = None  # (bits, porder, parts)
    for porder in range(0, 3):
        n_part = 1 << porder
        if blocksize % n_part:
            continue
        per = blocksize // n_part
        if per <= pred_order:
            continue
        parts = []
        total = 4  # partition order field... (method bits counted by caller)
        pos = 0
        ok = True
        for p in range(n_part):
            n = per - (pred_order if p == 0 else 0)
            seg = us_all[pos : pos + n]
            if len(seg) != n:
                ok = False
                break
            param, cost = _best_rice_param_u(seg)
            parts.append((pos, pos + n, param))
            total += 4 + cost
            pos += n
        if ok and pos == len(residual) and (best is None or total < best[0]):
            best = (total, porder, parts)
    assert best is not None  # porder 0 always fits
    return best[1], best[2]


def _write_residual(
    bw: _BitWriter, residual: list[int], blocksize: int, pred_order: int
) -> None:
    """Rice method 0 (4-bit params) with per-block partition-order
    search (0-4, exact cost) and the escape hatch when raw beats Rice
    for a whole-block partition."""
    raw_bits = max((max(_zigzag(r) for r in residual).bit_length() + 1) if residual else 1, 1)
    raw_bits = min(raw_bits, 31)
    porder, parts = _partition_plan(residual, blocksize, pred_order)
    bw.write(0, 2)  # coding method 0: 4-bit rice
    bw.write(porder, 4)
    for start, end, param in parts:
        seg = residual[start:end]
        cost = _rice_cost(seg, param)
        if seg and porder == 0 and cost > 5 + raw_bits * len(seg):
            bw.write(0xF, 4)  # escape
            bw.write(raw_bits, 5)
            for r in seg:
                bw.write_signed(r, raw_bits)
            continue
        bw.write(param, 4)
        for r in seg:
            u = _zigzag(r)
            bw.write_unary(u >> param)
            bw.write(u & ((1 << param) - 1), param)


def _read_residual(
    br: _BitReader, blocksize: int, pred_order: int
) -> list[int]:
    method = br.read(2)
    if method > 1:
        raise ValueError("reserved FLAC residual coding method")
    pbits = 4 if method == 0 else 5
    escape = (1 << pbits) - 1
    porder = br.read(4)
    n_part = 1 << porder
    if blocksize % n_part:
        raise ValueError("FLAC partition order does not divide block size")
    out: list[int] = []
    for p in range(n_part):
        n = blocksize // n_part - (pred_order if p == 0 else 0)
        if n < 0:
            raise ValueError("FLAC predictor order exceeds first partition")
        param = br.read(pbits)
        if param == escape:
            raw = br.read(5)
            out.extend(br.read_signed(raw) if raw else 0 for _ in range(n))
        else:
            for _ in range(n):
                q = br.read_unary()
                u = (q << param) | br.read(param)
                out.append(_unzigzag(u))
    return out


# ---------------------------------------------------------------- encode


_LPC_MAX_ORDER = 8
_LPC_PRECISION = 12  # quantized coefficient bits


def _lpc_analyze(samples: list[int]) -> tuple[int, int, list[int], list[int]] | None:
    """Levinson-Durbin LPC analysis + coefficient quantization:
    returns (order, shift, quantized_coeffs, residual) for the best
    order by exact Rice cost, or None when LPC is unusable (constant /
    degenerate block). Quantization uses error feedback (libFLAC's
    scheme) so rounding error doesn't accumulate across coefficients."""
    n = len(samples)
    max_order = min(_LPC_MAX_ORDER, n - 1)
    if max_order < 1:
        return None
    # autocorrelation on the raw integer signal
    r = [float(sum(samples[i] * samples[i + lag] for i in range(n - lag)))
         for lag in range(max_order + 1)]
    if r[0] == 0.0:
        return None
    # Levinson-Durbin, keeping the coefficient set per order
    err = r[0]
    a: list[float] = []
    per_order: list[list[float]] = []
    for m in range(1, max_order + 1):
        acc = r[m] - sum(a[j] * r[m - 1 - j] for j in range(m - 1))
        if err == 0.0:
            break
        k = acc / err
        a = [a[j] - k * a[m - 2 - j] for j in range(m - 1)] + [k]
        err *= 1.0 - k * k
        per_order.append(list(a))
        if err <= 0.0:
            break
    best = None  # (bits, order, shift, qcoeffs, residual)
    # evaluate a geometric order ladder (1/2/4/8) instead of every
    # order: residual generation is the O(n x order) hot loop, and the
    # ladder tracks the cost curve closely on real signals
    for coeffs in per_order:
        order = len(coeffs)
        if order not in (1, 2, 4, 8) and order != len(per_order):
            continue
        cmax = max(abs(c) for c in coeffs)
        if cmax == 0.0 or cmax != cmax or cmax in (float("inf"),):
            continue
        # choose shift so the largest coefficient fills the precision
        import math

        shift = _LPC_PRECISION - 2 - int(math.floor(math.log2(cmax)))
        shift = max(0, min(15, shift))
        lim = 1 << (_LPC_PRECISION - 1)
        q: list[int] = []
        e = 0.0
        for c in coeffs:
            v = c * (1 << shift) + e
            qi = int(round(v))
            qi = max(-lim, min(lim - 1, qi))
            e = v - qi
            q.append(qi)
        if all(v == 0 for v in q):
            continue
        res = []
        for i in range(order, n):
            acc = sum(q[j] * samples[i - 1 - j] for j in range(order))
            res.append(samples[i] - (acc >> shift))
        if any(abs(x) > (1 << 40) for x in res):
            continue
        _p, cost = _best_rice_param(res)
        bits = order * 16 + 4 + 5 + order * _LPC_PRECISION + 6 + cost
        if best is None or bits < best[0]:
            best = (bits, order, shift, q, res)
    if best is None:
        return None
    return best[1], best[2], best[3], best[4]


def _plan_subframe(samples: list[int], bps: int) -> tuple[int, tuple]:
    """(bits, plan) for the cheapest of CONSTANT / FIXED(0-4) /
    LPC(order ladder) / VERBATIM — planning only, no bit writing, so a
    stereo frame can cost all four channel assignments from one plan
    per distinct signal (the real encoder decision: LPC wins on tonal
    content, FIXED on smooth ramps, VERBATIM on noise, CONSTANT on
    silence)."""
    if all(s == samples[0] for s in samples):
        return 8 + bps, ("const",)
    best = None  # (bits, plan)
    prev = list(samples)
    for order in range(0, min(4, len(samples) - 1) + 1):
        res = prev if order == 0 else [
            prev[i] - prev[i - 1] for i in range(1, len(prev))
        ]
        if order:
            prev = res
        if any(abs(r) > (1 << 40) for r in res):
            continue  # pathological growth; skip this order
        _p, cost = _best_rice_param(res)
        total = order * bps + 6 + cost
        if best is None or total < best[0]:
            best = (total, ("fixed", order, res))
    lpc = _lpc_analyze(samples)
    if lpc is not None:
        order, shift, q, res = lpc
        _p, cost = _best_rice_param(res)
        total = order * bps + 4 + 5 + order * _LPC_PRECISION + 6 + cost
        if best is None or total < best[0]:
            best = (total, ("lpc", order, shift, q, res))
    verbatim_bits = 8 + bps * len(samples)
    if best is None or best[0] >= verbatim_bits:
        return verbatim_bits, ("verbatim",)
    return best


def _emit_subframe(bw: _BitWriter, plan: tuple, samples: list[int], bps: int) -> None:
    kind = plan[0]
    if kind == "const":
        bw.write(0, 1)
        bw.write(0, 6)  # CONSTANT
        bw.write(0, 1)  # no wasted bits
        bw.write_signed(samples[0], bps)
        return
    if kind == "verbatim":
        bw.write(0, 1)
        bw.write(1, 6)  # VERBATIM
        bw.write(0, 1)
        for s in samples:
            bw.write_signed(s, bps)
        return
    if kind == "fixed":
        _k, order, res = plan
        bw.write(0, 1)
        bw.write(0b001000 | order, 6)  # FIXED, order
        bw.write(0, 1)
        for s in samples[:order]:
            bw.write_signed(s, bps)
        _write_residual(bw, res, len(samples), order)
        return
    _k, order, shift, q, res = plan
    bw.write(0, 1)
    bw.write(32 + (order - 1), 6)  # LPC, order
    bw.write(0, 1)  # no wasted bits
    for s in samples[:order]:
        bw.write_signed(s, bps)
    bw.write(_LPC_PRECISION - 1, 4)
    bw.write_signed(shift, 5)
    for c in q:
        bw.write_signed(c, _LPC_PRECISION)
    _write_residual(bw, res, len(samples), order)


def _encode_subframe(bw: _BitWriter, samples: list[int], bps: int) -> None:
    _emit_subframe(bw, _plan_subframe(samples, bps)[1], samples, bps)


def flac_encode(
    channels: list[list[int]],
    sample_rate: int = 16000,
    bps: int = 16,
    block_size: int = 4096,
) -> bytes:
    """Encode PCM channels (equal-length lists of signed ints) to a
    FLAC stream: STREAMINFO + fixed-blocksize frames; stereo frames
    choose independent / left-side / right-side / mid-side per block by
    exact cost. MD5 in STREAMINFO is left zero (spec: unknown)."""
    n_ch = len(channels)
    if not 1 <= n_ch <= 8:
        raise ValueError("FLAC supports 1-8 channels")
    n = len(channels[0])
    if any(len(c) != n for c in channels):
        raise ValueError("channel length mismatch")
    lim = 1 << (bps - 1)
    for c in channels:
        for s in c:
            if not -lim <= s < lim:
                raise ValueError(f"sample {s} out of range for bps={bps}")
    out = bytearray(b"fLaC")
    # STREAMINFO: last-metadata flag set, type 0, length 34
    out += bytes([0x80, 0, 0, 34])
    si = _BitWriter()
    si.write(block_size, 16)  # min block size
    si.write(block_size, 16)  # max block size
    si.write(0, 24)  # min frame size unknown
    si.write(0, 24)  # max frame size unknown
    si.write(sample_rate, 20)
    si.write(n_ch - 1, 3)
    si.write(bps - 1, 5)
    si.write(n, 36)
    out += si.bytes() + b"\x00" * 16  # MD5 unknown
    frame_no = 0
    for start in range(0, n, block_size):
        bs = min(block_size, n - start)
        blocks = [c[start : start + bs] for c in channels]
        out += _encode_frame(blocks, frame_no, bs, bps)
        frame_no += 1
    return bytes(out)


def _encode_frame(blocks: list[list[int]], frame_no: int, bs: int, bps: int) -> bytes:
    n_ch = len(blocks)
    assignment = n_ch - 1
    plans = [_plan_subframe(b, bps) for b in blocks]
    subframes = blocks
    sub_bps = [bps] * n_ch
    if n_ch == 2:
        left, right = blocks
        mid = [(l + r) >> 1 for l, r in zip(left, right)]
        side = [l - r for l, r in zip(left, right)]
        # ONE plan per distinct signal; the four assignments are cost
        # sums over those plans (the probe-encode-everything version
        # cost 6 full subframe encodes per frame)
        pl = {"l": plans[0], "r": plans[1]}
        pl["m"] = _plan_subframe(mid, bps)
        pl["s"] = _plan_subframe(side, bps + 1)
        costs = {
            1: pl["l"][0] + pl["r"][0],
            8: pl["l"][0] + pl["s"][0],
            9: pl["s"][0] + pl["r"][0],
            10: pl["m"][0] + pl["s"][0],
        }
        assignment = min(costs, key=lambda k: (costs[k], k))
        if assignment == 8:
            subframes, sub_bps = [left, side], [bps, bps + 1]
            plans = [pl["l"], pl["s"]]
        elif assignment == 9:
            subframes, sub_bps = [side, right], [bps + 1, bps]
            plans = [pl["s"], pl["r"]]
        elif assignment == 10:
            subframes, sub_bps = [mid, side], [bps, bps + 1]
            plans = [pl["m"], pl["s"]]
    hdr = _BitWriter()
    hdr.write(0b11111111111110, 14)  # sync
    hdr.write(0, 1)  # reserved
    hdr.write(0, 1)  # fixed block size strategy
    hdr.write(0b0111, 4)  # block size: 16-bit value follows
    hdr.write(0b0000, 4)  # sample rate: from STREAMINFO
    hdr.write(assignment, 4)
    # bps code: explicit when the spec has one (keeps frames
    # self-contained), else 0 = get-from-STREAMINFO
    hdr.write({8: 1, 12: 2, 16: 4, 20: 5, 24: 6, 32: 7}.get(bps, 0), 3)
    hdr.write(0, 1)  # reserved
    hdr.align()
    head = bytearray(hdr.bytes())
    head += _utf8_coded(frame_no)
    head += struct.pack(">H", bs - 1)
    head.append(_crc8(bytes(head)))
    body = _BitWriter()
    for sf, sbps, plan in zip(subframes, sub_bps, plans):
        _emit_subframe(body, plan[1], sf, sbps)
    body.align()
    frame = bytes(head) + body.bytes()
    return frame + struct.pack(">H", _crc16(frame))


# ---------------------------------------------------------------- decode


def flac_decode(data: bytes) -> dict:
    """Decode a FLAC stream to
    {"sample_rate", "bps", "channels": [[int, ...], ...]}.
    Verifies both frame CRCs; walks every metadata block; supports
    CONSTANT / VERBATIM / FIXED / LPC subframes, wasted bits, both Rice
    methods with escapes, and all four channel assignments."""
    if data[:4] != b"fLaC":
        raise ValueError("not a FLAC stream (missing fLaC magic)")
    pos = 4
    info = None
    while True:
        hdr = data[pos : pos + 4]
        if len(hdr) < 4:
            raise ValueError("truncated FLAC metadata")
        last = hdr[0] & 0x80
        btype = hdr[0] & 0x7F
        ln = int.from_bytes(hdr[1:4], "big")
        body = data[pos + 4 : pos + 4 + ln]
        if btype == 0:
            br = _BitReader(body)
            br.read(16)  # min block size
            br.read(16)  # max block size
            br.read(24)
            br.read(24)
            sr = br.read(20)
            n_ch = br.read(3) + 1
            bps = br.read(5) + 1
            total = br.read(36)
            info = dict(sample_rate=sr, n_ch=n_ch, bps=bps, total=total)
        pos += 4 + ln
        if last:
            break
    if info is None:
        raise ValueError("FLAC stream without STREAMINFO")
    channels: list[list[int]] = [[] for _ in range(info["n_ch"])]
    while pos < len(data) and (
        info["total"] == 0
        or sum(len(c) for c in channels) < info["total"] * info["n_ch"]
    ):
        pos = _decode_frame(data, pos, info, channels)
    if info["total"] and any(len(c) != info["total"] for c in channels):
        raise ValueError("FLAC stream ended before total_samples")
    return {
        "sample_rate": info["sample_rate"],
        "bps": info["bps"],
        "channels": channels,
    }


_BS_CODE = {1: 192, 2: 576, 3: 1152, 4: 2304, 5: 4608,
            8: 256, 9: 512, 10: 1024, 11: 2048, 12: 4096,
            13: 8192, 14: 16384, 15: 32768}
_BPS_CODE = {1: 8, 2: 12, 4: 16, 5: 20, 6: 24, 7: 32}


def _decode_frame(data: bytes, pos: int, info: dict, channels: list[list[int]]) -> int:
    br = _BitReader(data, pos)
    if br.read(14) != 0b11111111111110:
        raise ValueError("lost FLAC frame sync")
    br.read(1)  # reserved
    variable = br.read(1)
    bs_code = br.read(4)
    sr_code = br.read(4)
    assignment = br.read(4)
    bps_code = br.read(3)
    br.read(1)  # reserved
    _read_utf8_coded(br)  # frame/sample number
    if bs_code == 0:
        raise ValueError("reserved FLAC block size code")
    elif bs_code == 6:
        bs = br.read(8) + 1
    elif bs_code == 7:
        bs = br.read(16) + 1
    else:
        bs = _BS_CODE[bs_code]
    if sr_code == 12:
        br.read(8)
    elif sr_code in (13, 14):
        br.read(16)
    elif sr_code == 15:
        raise ValueError("invalid FLAC sample rate code")
    bps = info["bps"] if bps_code == 0 else _BPS_CODE[bps_code]
    header_len = br.byte_pos - pos + (1 if br.bit_pos else 0)
    if _crc8(data[pos : pos + header_len]) != data[pos + header_len]:
        raise ValueError("FLAC frame header CRC-8 mismatch")
    br = _BitReader(data, pos + header_len + 1)
    if assignment < 8:
        n_sub = assignment + 1
        sub_bps = [bps] * n_sub
    elif assignment in (8, 9, 10):
        n_sub = 2
        sub_bps = [bps, bps + 1] if assignment in (8, 10) else [bps + 1, bps]
    else:
        raise ValueError("reserved FLAC channel assignment")
    if n_sub != info["n_ch"]:
        raise ValueError("frame channel count != STREAMINFO")
    subs = [_decode_subframe(br, bs, b) for b in sub_bps]
    br.align()
    frame_end = br.byte_pos
    (crc16,) = struct.unpack(">H", data[frame_end : frame_end + 2])
    if _crc16(data[pos:frame_end]) != crc16:
        raise ValueError("FLAC frame CRC-16 mismatch")
    if assignment < 8:
        out = subs
    elif assignment == 8:  # left/side
        left, side = subs
        out = [left, [l - s for l, s in zip(left, side)]]
    elif assignment == 9:  # side/right
        side, right = subs
        out = [[s + r for s, r in zip(side, right)], right]
    else:  # mid/side
        mid, side = subs
        out = []
        lefts, rights = [], []
        for m, s in zip(mid, side):
            m2 = (m << 1) | (s & 1)
            lefts.append((m2 + s) >> 1)
            rights.append((m2 - s) >> 1)
        out = [lefts, rights]
    for ch, vals in zip(channels, out):
        ch.extend(vals)
    return frame_end + 2


def _decode_subframe(br: _BitReader, bs: int, bps: int) -> list[int]:
    if br.read(1):
        raise ValueError("FLAC subframe padding bit set")
    stype = br.read(6)
    wasted = 0
    if br.read(1):
        wasted = br.read_unary() + 1
    eff = bps - wasted
    if stype == 0:  # CONSTANT
        v = br.read_signed(eff)
        out = [v] * bs
    elif stype == 1:  # VERBATIM
        out = [br.read_signed(eff) for _ in range(bs)]
    elif 8 <= stype <= 12:  # FIXED order 0-4
        order = stype - 8
        warm = [br.read_signed(eff) for _ in range(order)]
        res = _read_residual(br, bs, order)
        out = list(warm)
        coeffs = _FIXED_COEFFS[order]
        for r in res:
            pred = sum(c * out[-i - 1] for i, c in enumerate(coeffs))
            out.append(pred + r)
    elif stype >= 32:  # LPC, order 1-32
        order = stype - 31
        warm = [br.read_signed(eff) for _ in range(order)]
        prec = br.read(4) + 1
        if prec == 16:
            raise ValueError("invalid FLAC LPC precision code")
        shift = br.read_signed(5)
        if shift < 0:
            raise ValueError("negative FLAC LPC shift")
        coeffs = [br.read_signed(prec) for _ in range(order)]
        res = _read_residual(br, bs, order)
        out = list(warm)
        for r in res:
            acc = sum(c * out[-i - 1] for i, c in enumerate(coeffs))
            out.append((acc >> shift) + r)
    else:
        raise ValueError(f"reserved FLAC subframe type {stype}")
    if wasted:
        out = [v << wasted for v in out]
    return out
