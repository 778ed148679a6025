"""Baseline JPEG (JFIF) codec in pure numpy + stdlib — no external
codec libraries (the container has none; CLAUDE.md scope note).

Covers baseline sequential DCT, 8-bit, Huffman entropy coding
(ITU-T T.81): grayscale and YCbCr 4:4:4 / 4:2:2 / 4:2:0, restart
markers, 16-bit-peek Huffman decode tables. Progressive, arithmetic
coding, and 12-bit stay out of scope — `decode_jpeg` raises a clear
error on their SOF markers.

Scale/shape notes (the mapInPandas batch contract of multimodal.py):
the entropy scan is inherently sequential per image (bit-serial Huffman
with DC prediction), decoded symbol-by-symbol in Python against a
precomputed 2^16 peek table (one dict-free lookup per symbol); the
heavy math — dequantization, the 2-D IDCT over every block at once
(two tensordots), chroma upsampling, YCbCr->RGB — is vectorized across
all blocks of a component. Media bytes never leave the executor.

Exactness property used by the jpeg_decode_stats oracle: an image made
of CONSTANT 8x8 tiles encoded with all-ones quantization tables
round-trips BIT-EXACTLY (only the DC coefficient survives, it is an
exact integer, and the float IDCT of a DC-only block is an exact
power-of-two division) — so decoded pixel sums are arithmetic
functions a SQL oracle can recompute.

Standard tables (Annex K of T.81, public spec constants): quantization
and Huffman tables below are the ones every baseline encoder ships.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import numpy as np

# --- constants (ITU-T T.81 Annex K) -----------------------------------------

ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63],
    dtype=np.int64)

# standard luminance/chrominance quantization tables (Annex K.1), in
# zigzag order as they appear in DQT segments
STD_QT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61, 12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56, 14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77, 24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101, 72, 92, 95, 98, 112, 100, 103,
    99], dtype=np.int64)[np.argsort(ZIGZAG)].reshape(8, 8)
STD_QT_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99, 18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99, 47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99],
    dtype=np.int64)[np.argsort(ZIGZAG)].reshape(8, 8)

# standard Huffman tables (Annex K.3): (bits-per-length[1..16], values)
STD_DC_LUMA = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
               list(range(12)))
STD_DC_CHROMA = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
                 list(range(12)))
STD_AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
     0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
     0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
     0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
     0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
     0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
     0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
     0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
     0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
     0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
     0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
     0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
     0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
     0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
     0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA])
STD_AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
     0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
     0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
     0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
     0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
     0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
     0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
     0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
     0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
     0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
     0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
     0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
     0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
     0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
     0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA])


class JpegError(ValueError):
    pass


# --- DCT / IDCT (type-II / type-III, JPEG normalization) --------------------

def _dct_matrix() -> np.ndarray:
    k = np.arange(8)
    C = np.cos((2 * k[None, :] + 1) * k[:, None] * np.pi / 16) / 2.0
    C[0] /= np.sqrt(2.0)
    return C  # forward: F = C @ f @ C.T ; inverse: f = C.T @ F @ C


_DCT_C = _dct_matrix()


def _fdct_blocks(blocks: np.ndarray) -> np.ndarray:
    """Forward DCT over an (n, 8, 8) float array of level-shifted blocks."""
    t = np.tensordot(blocks, _DCT_C.T, axes=([2], [0]))   # f @ C.T
    return np.tensordot(_DCT_C, t, axes=([1], [1])).transpose(1, 0, 2)


def _idct_blocks(coefs: np.ndarray) -> np.ndarray:
    """Inverse DCT over an (n, 8, 8) float array of dequantized coefs."""
    t = np.tensordot(coefs, _DCT_C, axes=([2], [0]))      # F @ C
    return np.tensordot(_DCT_C.T, t, axes=([1], [1])).transpose(1, 0, 2)


# --- Huffman ----------------------------------------------------------------

def _canonical_codes(bits: List[int], values: List[int]):
    """(code, length) per symbol, canonical order (T.81 C.2)."""
    codes = []
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes.append((code, length, values[k]))
            code += 1
            k += 1
        code <<= 1
    return codes


def _peek_tables(bits: List[int], values: List[int]):
    """2^16 peek LUTs: sym[peek] and nbits[peek] for a 16-bit window."""
    sym = np.zeros(1 << 16, dtype=np.int16)
    ln = np.zeros(1 << 16, dtype=np.int8)
    for code, length, value in _canonical_codes(bits, values):
        lo = code << (16 - length)
        hi = lo + (1 << (16 - length))
        sym[lo:hi] = value
        ln[lo:hi] = length
    return sym, ln


class _BitReader:
    """MSB-first bit reader over the entropy-coded segment with 0xFF00
    byte unstuffing done up front (vectorized)."""

    def __init__(self, data: bytes):
        b = np.frombuffer(data, dtype=np.uint8)
        # drop the 0x00 stuffing byte after every 0xFF
        stuffed = np.zeros(len(b), dtype=bool)
        stuffed[1:] = b[:-1] == 0xFF
        stuffed &= b == 0x00
        self.bytes = b[~stuffed]
        self.pos = 0  # bit position
        self.nbits = len(self.bytes) * 8

    def peek16(self) -> int:
        byte, off = self.pos >> 3, self.pos & 7
        w = 0
        for i in range(4):  # 4 bytes always cover 16 bits at any offset
            w = (w << 8) | (int(self.bytes[byte + i])
                            if byte + i < len(self.bytes) else 0)
        return (w >> (16 - off)) & 0xFFFF

    def take(self, n: int) -> int:
        if self.pos + n > self.nbits:
            raise JpegError("truncated entropy segment")
        v = 0
        byte, off = self.pos >> 3, self.pos & 7
        have = 0
        acc = 0
        while have < off + n:
            acc = (acc << 8) | int(self.bytes[byte])
            byte += 1
            have += 8
        v = (acc >> (have - off - n)) & ((1 << n) - 1)
        self.pos += n
        return v


def _extend(v: int, n: int) -> int:
    """T.81 F.2.2.1 sign extension of an n-bit magnitude value."""
    if n == 0:
        return 0
    return v if v >= (1 << (n - 1)) else v - (1 << n) + 1


# --- decoder ----------------------------------------------------------------

def decode_jpeg(data) -> np.ndarray:
    """Decode a baseline JFIF/JPEG to uint8 (h, w) grayscale or
    (h, w, 3) RGB. Raises JpegError on progressive/arithmetic/12-bit
    streams and malformed input."""
    buf = bytes(data)
    if len(buf) < 4 or buf[0:2] != b"\xFF\xD8":
        raise JpegError("not a JPEG (missing SOI)")
    i = 2
    qt: Dict[int, np.ndarray] = {}
    huff: Dict[Tuple[int, int], tuple] = {}  # (class, id) -> peek LUTs
    frame = None
    restart_interval = 0
    while i + 4 <= len(buf):
        if buf[i] != 0xFF:
            raise JpegError(f"bad marker alignment at {i}")
        marker = buf[i + 1]
        i += 2
        if marker == 0xD9:  # EOI
            break
        if marker in (0x01,) or 0xD0 <= marker <= 0xD7:
            continue  # standalone
        if i + 2 > len(buf):
            raise JpegError("truncated segment header")
        seglen = int.from_bytes(buf[i:i + 2], "big")
        seg = buf[i + 2:i + seglen]
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(seg):
                prec, tid = seg[p] >> 4, seg[p] & 0xF
                p += 1
                if prec:
                    vals = np.frombuffer(seg[p:p + 128],
                                         dtype=">u2").astype(np.int64)
                    p += 128
                else:
                    vals = np.frombuffer(seg[p:p + 64],
                                         dtype=np.uint8).astype(np.int64)
                    p += 64
                t = np.zeros(64, dtype=np.int64)
                t[ZIGZAG] = vals
                qt[tid] = t.reshape(8, 8)
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(seg):
                cls, tid = seg[p] >> 4, seg[p] & 0xF
                bits = list(seg[p + 1:p + 17])
                nval = sum(bits)
                values = list(seg[p + 17:p + 17 + nval])
                huff[(cls, tid)] = _peek_tables(bits, values)
                p += 17 + nval
        elif marker == 0xC0 or marker == 0xC1:  # SOF0/1 baseline
            prec = seg[0]
            if prec != 8:
                raise JpegError(f"{prec}-bit precision not supported")
            h = int.from_bytes(seg[1:3], "big")
            w = int.from_bytes(seg[3:5], "big")
            ncomp = seg[5]
            comps = []
            for c in range(ncomp):
                cid, hv, tq = seg[6 + 3 * c], seg[7 + 3 * c], seg[8 + 3 * c]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0xF,
                              "tq": tq})
            frame = {"h": h, "w": w, "comps": comps}
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise JpegError(
                f"SOF{marker - 0xC0}: only baseline sequential DCT is "
                f"supported (progressive/arithmetic out of scope)")
        elif marker == 0xDD:  # DRI
            restart_interval = int.from_bytes(seg[0:2], "big")
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise JpegError("SOS before SOF")
            ns = seg[0]
            sel = {}
            for c in range(ns):
                cid, tabs = seg[1 + 2 * c], seg[2 + 2 * c]
                sel[cid] = (tabs >> 4, tabs & 0xF)
            scan_start = i + seglen
            return _decode_scan(buf, scan_start, frame, sel, qt, huff,
                                restart_interval)
        # APPn/COM/others: skip
        i += seglen
    raise JpegError("no SOS marker found")


def _decode_scan(buf, start, frame, sel, qt, huff, restart_interval):
    comps = frame["comps"]
    h, w = frame["h"], frame["w"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    # split entropy data at restart markers (FFD0-FFD7); locate scan end
    end = start
    segments = []
    seg_start = start
    while end + 1 < len(buf):
        if buf[end] == 0xFF and buf[end + 1] not in (0x00,):
            m = buf[end + 1]
            if 0xD0 <= m <= 0xD7:
                segments.append(buf[seg_start:end])
                seg_start = end + 2
                end += 2
                continue
            break
        end += 1
    segments.append(buf[seg_start:end])
    # per-component coefficient stores
    ncoef = {}
    for ci, c in enumerate(comps):
        bw = mcux * c["h"]
        bh = mcuy * c["v"]
        ncoef[ci] = np.zeros((bh * bw, 8, 8), dtype=np.int64)
    order = []  # (comp_index, block_row_in_mcu, block_col_in_mcu)
    for ci, c in enumerate(comps):
        for by in range(c["v"]):
            for bx in range(c["h"]):
                order.append((ci, by, bx))
    mcus_per_seg = (restart_interval
                    if restart_interval else mcux * mcuy)
    zz = ZIGZAG
    seg_idx = 0
    reader = _BitReader(segments[0])
    pred = [0] * len(comps)
    for mcu in range(mcux * mcuy):
        if restart_interval and mcu and mcu % mcus_per_seg == 0:
            seg_idx += 1
            if seg_idx >= len(segments):
                raise JpegError("missing restart segment")
            reader = _BitReader(segments[seg_idx])
            pred = [0] * len(comps)
        my, mx = divmod(mcu, mcux)
        for ci, by, bx in order:
            c = comps[ci]
            dc_sym, dc_ln = huff.get((0, sel[c["id"]][0]), (None, None))
            ac_sym, ac_ln = huff.get((1, sel[c["id"]][1]), (None, None))
            if dc_sym is None or ac_sym is None:
                raise JpegError("scan references undefined huffman table")
            blk = np.zeros(64, dtype=np.int64)
            # DC
            p16 = reader.peek16()
            n = int(dc_ln[p16])
            if n == 0:
                raise JpegError("invalid huffman code (DC)")
            reader.pos += n
            ssss = int(dc_sym[p16])
            diff = _extend(reader.take(ssss), ssss)
            pred[ci] += diff
            blk[0] = pred[ci]
            # AC
            k = 1
            while k < 64:
                p16 = reader.peek16()
                n = int(ac_ln[p16])
                if n == 0:
                    raise JpegError("invalid huffman code (AC)")
                reader.pos += n
                rs = int(ac_sym[p16])
                r, s = rs >> 4, rs & 0xF
                if s == 0:
                    if r == 15:
                        k += 16  # ZRL
                        continue
                    break  # EOB
                k += r
                if k > 63:
                    raise JpegError("AC run past end of block")
                blk[zz[k]] = _extend(reader.take(s), s)
                k += 1
            row = my * c["v"] + by
            col = mx * c["h"] + bx
            ncoef[ci][row * (mcux * c["h"]) + col] = blk.reshape(8, 8)
    # dequant + IDCT + assemble, vectorized per component
    planes = []
    for ci, c in enumerate(comps):
        q = qt.get(c["tq"])
        if q is None:
            raise JpegError("frame references undefined quant table")
        bw = mcux * c["h"]
        bh = mcuy * c["v"]
        px = _idct_blocks((ncoef[ci] * q[None, :, :]).astype(np.float64))
        px = np.clip(np.round(px) + 128, 0, 255).astype(np.uint8)
        plane = (px.reshape(bh, bw, 8, 8).transpose(0, 2, 1, 3)
                 .reshape(bh * 8, bw * 8))
        # upsample to full resolution (nearest/replication, the common
        # baseline reconstruction) then crop
        ry, rx = vmax // c["v"], hmax // c["h"]
        if ry > 1 or rx > 1:
            plane = plane.repeat(ry, axis=0).repeat(rx, axis=1)
        planes.append(plane[:h, :w])
    if len(planes) == 1:
        return planes[0]
    if len(planes) != 3:
        raise JpegError(f"{len(planes)}-component scans not supported")
    y = planes[0].astype(np.float64)
    cb = planes[1].astype(np.float64) - 128.0
    cr = planes[2].astype(np.float64) - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    rgb = np.stack([r, g, b], axis=-1)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


# --- encoder ----------------------------------------------------------------

class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nacc = 0

    def put(self, code: int, n: int):
        self.acc = (self.acc << n) | (code & ((1 << n) - 1))
        self.nacc += n
        while self.nacc >= 8:
            byte = (self.acc >> (self.nacc - 8)) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:
                self.out.append(0x00)  # byte stuffing
            self.nacc -= 8
        self.acc &= (1 << self.nacc) - 1

    def flush(self):
        if self.nacc:
            pad = 8 - self.nacc
            self.put((1 << pad) - 1, pad)  # 1-pad to byte boundary


def _enc_tables(spec):
    return {v: (c, n) for c, n, v in _canonical_codes(*spec)}


def _encode_block(bw: _BitWriter, blk: np.ndarray, pred: int,
                  dct: dict, act: dict) -> int:
    zz = blk.reshape(64)[ZIGZAG]
    dc = int(zz[0])
    diff = dc - pred
    mag = abs(diff)
    ssss = int(mag).bit_length()
    code, n = dct[ssss]
    bw.put(code, n)
    if ssss:
        v = diff if diff >= 0 else diff + (1 << ssss) - 1
        bw.put(v, ssss)
    run = 0
    last_nz = int(np.max(np.nonzero(zz)[0])) if np.any(zz[1:]) else 0
    for k in range(1, 64):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, n = act[0xF0]  # ZRL
            bw.put(code, n)
            run -= 16
        s = int(abs(v)).bit_length()
        code, n = act[(run << 4) | s]
        bw.put(code, n)
        bw.put(v if v >= 0 else v + (1 << s) - 1, s)
        run = 0
        if k == last_nz:
            break
    if last_nz < 63:
        code, n = act[0x00]  # EOB
        bw.put(code, n)
    return dc


def _seg(marker: int, body: bytes) -> bytes:
    return bytes([0xFF, marker]) + (len(body) + 2).to_bytes(2, "big") + body


def encode_jpeg(img: np.ndarray, qt_luma: Optional[np.ndarray] = None,
                qt_chroma: Optional[np.ndarray] = None) -> bytes:
    """Encode uint8 (h, w) grayscale or (h, w, 3) RGB as baseline
    sequential JFIF (4:4:4 for color) with the standard Annex K Huffman
    tables. Pass qt_luma/qt_chroma=np.ones((8, 8)) for the exact
    constant-tile mode the oracle uses; default = standard tables."""
    img = np.asarray(img)
    if img.dtype != np.uint8 or img.ndim not in (2, 3):
        raise JpegError("encode_jpeg wants uint8 (h,w) or (h,w,3)")
    gray = img.ndim == 2
    h, w = img.shape[:2]
    qly = (STD_QT_LUMA if qt_luma is None
           else np.asarray(qt_luma, dtype=np.int64).reshape(8, 8))
    qch = (STD_QT_CHROMA if qt_chroma is None
           else np.asarray(qt_chroma, dtype=np.int64).reshape(8, 8))
    if gray:
        planes = [img.astype(np.float64)]
        qts = [qly]
    else:
        rgbf = img.astype(np.float64)
        r, g, b = rgbf[..., 0], rgbf[..., 1], rgbf[..., 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        planes = [np.clip(np.round(y), 0, 255),
                  np.clip(np.round(cb), 0, 255),
                  np.clip(np.round(cr), 0, 255)]
        qts = [qly, qch, qch]
    # pad to multiples of 8 by edge replication
    H = -(-h // 8) * 8
    W = -(-w // 8) * 8
    coefs = []
    for p, q in zip(planes, qts):
        pp = np.pad(p, ((0, H - h), (0, W - w)), mode="edge") - 128.0
        blocks = (pp.reshape(H // 8, 8, W // 8, 8).transpose(0, 2, 1, 3)
                  .reshape(-1, 8, 8))
        fq = np.round(_fdct_blocks(blocks) / q[None, :, :]).astype(np.int64)
        coefs.append(fq)
    out = bytearray(b"\xFF\xD8")  # SOI
    out += _seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    zz_inv = ZIGZAG

    def qt_body(tid, q):
        return bytes([tid]) + bytes(
            int(q.reshape(64)[zz_inv[i]]) for i in range(64))

    out += _seg(0xDB, qt_body(0, qly) + (b"" if gray else qt_body(1, qch)))
    ncomp = 1 if gray else 3
    sof = bytes([8]) + h.to_bytes(2, "big") + w.to_bytes(2, "big") \
        + bytes([ncomp])
    for c in range(ncomp):
        sof += bytes([c + 1, 0x11, 0 if c == 0 else 1])  # 4:4:4
    out += _seg(0xC0, sof)

    def dht_body(cls, tid, spec):
        bits, values = spec
        return bytes([(cls << 4) | tid]) + bytes(bits) + bytes(values)

    dht = dht_body(0, 0, STD_DC_LUMA) + dht_body(1, 0, STD_AC_LUMA)
    if not gray:
        dht += dht_body(0, 1, STD_DC_CHROMA) + dht_body(1, 1, STD_AC_CHROMA)
    out += _seg(0xC4, dht)
    sos = bytes([ncomp])
    for c in range(ncomp):
        sos += bytes([c + 1, 0x00 if c == 0 else 0x11])
    sos += bytes([0, 63, 0])
    out += _seg(0xDA, sos)
    bw = _BitWriter()
    enc_dc = [_enc_tables(STD_DC_LUMA)] + [_enc_tables(STD_DC_CHROMA)] * 2
    enc_ac = [_enc_tables(STD_AC_LUMA)] + [_enc_tables(STD_AC_CHROMA)] * 2
    nby, nbx = H // 8, W // 8
    preds = [0] * ncomp
    for byi in range(nby):
        for bxi in range(nbx):
            for ci in range(ncomp):
                blk = coefs[ci][byi * nbx + bxi]
                _encode_block(bw, blk, preds[ci], enc_dc[ci], enc_ac[ci])
                preds[ci] = int(blk.reshape(64)[ZIGZAG][0])
    bw.flush()
    out += bw.out
    out += b"\xFF\xD9"
    return bytes(out)
