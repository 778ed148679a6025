"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed through Arrow-batched UDFs.

The Spark-side machinery — schemas, batching, partition-safe UDF
signatures, metadata propagation — is real and tested, and so is the
media decoding for two public container formats this environment can
parse with pure numpy (no image/audio libraries needed):

* BMP (Windows bitmap, BITMAPINFOHEADER, uncompressed 24-bit) —
  decode_bmp / encode_bmp; format layout per the public file-format
  documentation (14-byte file header + 40-byte info header + bottom-up
  BGR rows padded to 4 bytes).
* WAV (RIFF PCM, 16-bit) — decode_wav / encode_wav; RIFF chunk walk to
  the fmt/data chunks.
* PNG (8-bit gray/RGB/± alpha, non-interlaced) — decode_png /
  encode_png; stdlib-zlib inflate + vectorized scanline unfiltering
  (None/Sub/Up/Average/Paeth), CRC-checked chunk walk. This covers the
  dominant COMPRESSED web image container with zero external codecs.

* JPEG (baseline sequential DCT, 8-bit, gray / YCbCr 4:4:4 / 4:2:2 /
  4:2:0, restart markers) — jpeg.decode_jpeg / jpeg.encode_jpeg, pure
  numpy Huffman + vectorized IDCT; conformance cross-checked against
  javax.imageio in tests (progressive/arithmetic raise a clear error).

MP3/H.264 remain out of scope without external codec libraries; the
deterministic fake decoder is kept as a test double for pipeline-shape
tests.

Scale notes: media bytes never leave the executor that read them (no
shuffle in any of these transforms); batch size is bounded by Arrow's
maxRecordsPerBatch so one 4K frame burst cannot OOM a worker.
"""

from __future__ import annotations

import hashlib
from typing import Iterator, Optional, Tuple

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, functions as F

MEDIA_META_SCHEMA = ("media_type string, width int, height int, "
                     "n_bytes long, sha256 string")


# --- real decoders (pure numpy, public formats) ------------------------------

class MediaFormatError(ValueError):
    """Raised when bytes are not a decodable media payload."""


def encode_bmp(img: np.ndarray, palette=None, bpp: int = 8) -> bytes:
    """Encode an uncompressed BMP (BITMAPINFOHEADER, bottom-up rows
    padded to 4 bytes). Default: (H, W, 3) uint8 RGB -> 24-bit BGR.
    With palette= ((N, 3) uint8 RGB): img is (H, W) palette INDICES ->
    bpp-bit indexed BMP (bpp 1/4/8, MSB-first sub-byte packing, BGR0
    color-table quads)."""
    img = np.asarray(img, dtype=np.uint8)
    table = b""
    if palette is not None:
        pal = np.asarray(palette, dtype=np.uint8).reshape(-1, 3)
        if img.ndim != 2:
            raise MediaFormatError("palette encode expects (H, W) indices")
        if bpp not in (1, 4, 8):
            raise MediaFormatError("indexed BMP bpp must be 1, 4 or 8")
        if int(img.max(initial=0)) >= min(len(pal), 1 << bpp):
            raise MediaFormatError("palette index exceeds table/bpp")
        h, w = img.shape
        flipped = img[::-1]  # bottom-up
        if bpp == 8:
            packed = flipped
        else:
            packed = _pack_bits(flipped, bpp)
        stride = (packed.shape[1] + 3) & ~3
        rows = np.zeros((h, stride), dtype=np.uint8)
        rows[:, :packed.shape[1]] = packed
        quads = np.zeros((len(pal), 4), dtype=np.uint8)
        quads[:, :3] = pal[:, ::-1]  # BGR0
        table = quads.tobytes()
        n_colors = len(pal)
    else:
        if img.ndim != 3 or img.shape[2] != 3:
            raise MediaFormatError("encode_bmp expects an (H, W, 3) array")
        h, w = img.shape[:2]
        bpp = 24
        stride = (w * 3 + 3) & ~3
        rows = np.zeros((h, stride), dtype=np.uint8)
        rows[:, : w * 3] = img[::-1, :, ::-1].reshape(h, w * 3)
        n_colors = 0
    pixel_bytes = rows.tobytes()
    offset = 14 + 40 + len(table)
    header = (b"BM"
              + (offset + len(pixel_bytes)).to_bytes(4, "little")
              + b"\x00\x00\x00\x00" + offset.to_bytes(4, "little"))
    info = ((40).to_bytes(4, "little")
            + w.to_bytes(4, "little") + h.to_bytes(4, "little")
            + (1).to_bytes(2, "little") + bpp.to_bytes(2, "little")
            + (0).to_bytes(4, "little")
            + len(pixel_bytes).to_bytes(4, "little")
            + (2835).to_bytes(4, "little") + (2835).to_bytes(4, "little")
            + n_colors.to_bytes(4, "little") + (0).to_bytes(4, "little"))
    return header + info + table + pixel_bytes


def decode_bmp(data) -> np.ndarray:
    """Decode an uncompressed BMP into an (H, W, 3) uint8 RGB array:
    24-bit BGR, or 1/4/8-bit palette-indexed (BGR0 color-table lookup,
    MSB-first sub-byte indices). Accepts bottom-up (positive height) and
    top-down (negative height) row order; rejects compressed variants
    and 16/32-bit pixel formats."""
    buf = bytes(data)
    if len(buf) < 54 or buf[:2] != b"BM":
        raise MediaFormatError("not a BMP payload")
    offset = int.from_bytes(buf[10:14], "little")
    hdr_size = int.from_bytes(buf[14:18], "little")
    if hdr_size < 40:
        raise MediaFormatError(f"unsupported DIB header size {hdr_size}")
    w = int.from_bytes(buf[18:22], "little", signed=True)
    h = int.from_bytes(buf[22:26], "little", signed=True)
    bpp = int.from_bytes(buf[28:30], "little")
    compression = int.from_bytes(buf[30:34], "little")
    n_colors = int.from_bytes(buf[46:50], "little")
    if bpp not in (1, 4, 8, 24) or compression != 0:
        raise MediaFormatError(
            f"only uncompressed 1/4/8-bit-indexed or 24-bit BMP "
            f"supported (bpp={bpp}, compression={compression})")
    top_down = h < 0
    h = abs(h)
    if w <= 0 or h <= 0:
        raise MediaFormatError("degenerate BMP dimensions")
    stride = ((w * bpp + 31) // 32) * 4
    need = offset + stride * h
    if len(buf) < need:
        raise MediaFormatError("truncated BMP pixel data")
    rows = np.frombuffer(buf, dtype=np.uint8, count=stride * h,
                         offset=offset).reshape(h, stride)
    if bpp == 24:
        img = rows[:, : w * 3].reshape(h, w, 3)[:, :, ::-1]  # BGR -> RGB
    else:
        if not n_colors:
            n_colors = 1 << bpp
        tbl_off = 14 + hdr_size
        if tbl_off + 4 * n_colors > offset or 4 * n_colors > len(buf):
            raise MediaFormatError("BMP color table exceeds pixel offset")
        quads = np.frombuffer(buf, dtype=np.uint8, count=4 * n_colors,
                              offset=tbl_off).reshape(n_colors, 4)
        pal = quads[:, 2::-1]  # BGR0 -> RGB
        idx = _expand_samples(rows, w, bpp) if bpp < 8 else rows[:, :w]
        if int(idx.max(initial=0)) >= n_colors:
            raise MediaFormatError("BMP palette index out of range")
        img = pal[idx]
    if not top_down:
        img = img[::-1]
    return np.ascontiguousarray(img)


_PNG_SIG = b"\x89PNG\r\n\x1a\n"
# bytes per pixel for 8-bit depth, by PNG color type
_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def _png_chunk(tag: bytes, body: bytes) -> bytes:
    import zlib

    return (len(body).to_bytes(4, "big") + tag + body
            + zlib.crc32(tag + body).to_bytes(4, "big"))


# Adam7 interlace passes: (x_start, y_start, x_step, y_step)
_ADAM7 = ((0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
          (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2))


def _png_unfilter(raw: bytes, h: int, stride: int, bpp: int) -> np.ndarray:
    """Reverse the five PNG scanline filters over an h*(1+stride) byte
    image (one filter-type byte per row): None is a copy, Sub a running
    sum mod 256 down each byte lane, Up one vectorized add against the
    prior row, Average/Paeth walk bpp-byte groups with vector ops."""
    rows = np.frombuffer(raw, dtype=np.uint8).reshape(h, 1 + stride)
    units = stride // bpp
    out = np.empty((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(h):
        ft = int(rows[y, 0])
        f = rows[y, 1:]
        if ft == 0:
            rec = f.copy()
        elif ft == 1:
            # recon[x] = filt[x] + recon[x-bpp]: a running sum mod 256
            rec = (np.cumsum(f.reshape(units, bpp), axis=0,
                             dtype=np.uint64)
                   & 0xFF).astype(np.uint8).reshape(stride)
        elif ft == 2:
            rec = f + prev  # uint8 wraparound IS the mod-256 add
        elif ft == 3:
            fr = f.reshape(units, bpp).astype(np.uint16)
            up = prev.reshape(units, bpp).astype(np.uint16)
            rec2 = np.empty((units, bpp), dtype=np.uint16)
            left = np.zeros(bpp, dtype=np.uint16)
            for x in range(units):
                left = (fr[x] + ((left + up[x]) >> 1)) & 0xFF
                rec2[x] = left
            rec = rec2.astype(np.uint8).reshape(stride)
        elif ft == 4:
            fr = f.reshape(units, bpp).astype(np.int16)
            up = prev.reshape(units, bpp).astype(np.int16)
            rec2 = np.empty((units, bpp), dtype=np.int16)
            left = np.zeros(bpp, dtype=np.int16)
            upleft = np.zeros(bpp, dtype=np.int16)
            for x in range(units):
                p = left + up[x] - upleft
                pa_, pb_, pc_ = (np.abs(p - left), np.abs(p - up[x]),
                                 np.abs(p - upleft))
                pred = np.where((pa_ <= pb_) & (pa_ <= pc_), left,
                                np.where(pb_ <= pc_, up[x], upleft))
                left = (fr[x] + pred) & 0xFF
                rec2[x] = left
                upleft = up[x]
            rec = rec2.astype(np.uint8).reshape(stride)
        else:
            raise MediaFormatError(f"bad scanline filter type {ft}")
        out[y] = rec
        prev = rec
    return out


def _expand_samples(rows: np.ndarray, n_samples: int,
                    depth: int) -> np.ndarray:
    """(h, stride) scanline bytes -> (h, n_samples) values: identity at
    depth 8, MSB-first bit-field extraction below."""
    if depth == 8:
        return rows[:, :n_samples]
    shifts = np.arange(8 - depth, -1, -depth, dtype=np.uint8)
    samples = ((rows[:, :, None] >> shifts) & ((1 << depth) - 1))
    return samples.reshape(rows.shape[0], -1)[:, :n_samples].astype(
        np.uint8)


def _pack_bits(vals: np.ndarray, depth: int) -> np.ndarray:
    """Pack (H, W) sub-8-bit samples into MSB-first scanline bytes."""
    h, w = vals.shape
    per = 8 // depth
    padded = np.zeros((h, ((w + per - 1) // per) * per), dtype=np.uint16)
    padded[:, :w] = vals
    shifts = np.arange(8 - depth, -1, -depth, dtype=np.uint16)
    return ((padded.reshape(h, -1, per) << shifts).sum(axis=2)
            .astype(np.uint8))


def encode_png(img: np.ndarray, row_filters=None, palette=None,
               depth: int = 8, trns=None, interlace: bool = False) -> bytes:
    """Encode a uint8 array as a PNG (public spec: RFC 2083 / W3C PNG).
    Default: (H, W) or (H, W, C), C in 1/2/3/4 -> 8-bit gray /
    gray+alpha / RGB / RGBA. With palette= ((N, 3) uint8): img is
    (H, W) palette INDICES -> color type 3 with a PLTE chunk (trns=
    adds per-index alpha). depth in 1/2/4 packs gray or palette samples
    MSB-first. interlace=True writes Adam7 (seven independently
    filtered passes). row_filters optionally forces the per-scanline
    filter type (int or, non-interlaced only, a per-row list, 0..4) —
    the test lever that exercises every unfilter path in decode_png;
    default filter 0."""
    import zlib

    img = np.asarray(img, dtype=np.uint8)
    extra = b""
    if palette is not None:
        pal = np.asarray(palette, dtype=np.uint8).reshape(-1, 3)
        if img.ndim != 2:
            raise MediaFormatError("palette encode expects (H, W) indices")
        if int(img.max(initial=0)) >= min(len(pal), 1 << depth):
            raise MediaFormatError("palette index exceeds table/depth")
        h, w = img.shape
        color_type, c = 3, 1
        raw = img[:, :, None]
        extra = _png_chunk(b"PLTE", pal.tobytes())
        if trns is not None:
            extra += _png_chunk(
                b"tRNS", np.asarray(trns, dtype=np.uint8).tobytes())
    else:
        if img.ndim == 2:
            img = img[:, :, None]
        if img.ndim != 3 or img.shape[2] not in (1, 2, 3, 4):
            raise MediaFormatError("encode_png expects (H, W, 1/2/3/4)")
        h, w, c = img.shape
        color_type = {1: 0, 2: 4, 3: 2, 4: 6}[c]
        if depth != 8 and (c != 1 or int(img.max(initial=0)) >= (1 << depth)):
            raise MediaFormatError("sub-8-bit depth needs gray samples "
                                   "under 2^depth")
        raw = img
    if depth not in (1, 2, 4, 8):
        raise MediaFormatError(f"unsupported encode depth {depth}")
    step = c if depth == 8 else 1

    def pack(sub):
        ph = sub.shape[0]
        if depth == 8:
            return sub.reshape(ph, -1)
        return _pack_bits(sub.reshape(ph, -1), depth)

    def filt_lines(rows, filters):
        rows = rows.astype(np.int16)
        stride = rows.shape[1]
        prev = np.zeros(stride, dtype=np.int16)
        lines = []
        for y in range(rows.shape[0]):
            r = rows[y]
            left = np.concatenate([np.zeros(step, np.int16), r[:-step]])
            upleft = np.concatenate([np.zeros(step, np.int16),
                                     prev[:-step]])
            ft = int(filters[y])
            if ft == 0:
                f = r
            elif ft == 1:
                f = r - left
            elif ft == 2:
                f = r - prev
            elif ft == 3:
                f = r - ((left + prev) >> 1)
            elif ft == 4:
                p = left + prev - upleft
                pa_, pb_, pc_ = (np.abs(p - left), np.abs(p - prev),
                                 np.abs(p - upleft))
                pred = np.where((pa_ <= pb_) & (pa_ <= pc_), left,
                                np.where(pb_ <= pc_, prev, upleft))
                f = r - pred
            else:
                raise MediaFormatError(f"bad filter type {ft}")
            lines.append(bytes([ft])
                         + (f & 0xFF).astype(np.uint8).tobytes())
            prev = r
        return lines

    if interlace:
        if row_filters is not None and not isinstance(row_filters, int):
            raise MediaFormatError(
                "interlaced encode takes a single row_filters type")
        ft = 0 if row_filters is None else int(row_filters)
        lines = []
        for xs, ys, xst, yst in _ADAM7:
            sub = raw[ys::yst, xs::xst]
            if sub.shape[0] == 0 or sub.shape[1] == 0:
                continue
            lines += filt_lines(pack(sub), [ft] * sub.shape[0])
    else:
        if row_filters is None:
            row_filters = [0] * h
        elif isinstance(row_filters, int):
            row_filters = [row_filters] * h
        lines = filt_lines(pack(raw), row_filters)
    ihdr = (w.to_bytes(4, "big") + h.to_bytes(4, "big")
            + bytes([depth, color_type, 0, 0, int(interlace)]))
    idat = zlib.compress(b"".join(lines))
    return (_PNG_SIG + _png_chunk(b"IHDR", ihdr) + extra
            + _png_chunk(b"IDAT", idat) + _png_chunk(b"IEND", b""))


def decode_png(data) -> np.ndarray:
    """Decode a PNG into an (H, W, C) uint8 array. Pure stdlib-zlib +
    numpy: chunk walk with CRC verification, zlib inflate of the
    concatenated IDAT stream, per-scanline unfiltering (None is a copy,
    Sub is a running sum mod 256 per byte lane, Up one vectorized add,
    Average/Paeth walk pixels with byte-vector ops), then sample
    expansion. Supports 8-bit gray / gray+alpha / RGB / RGBA, PALETTE
    images (color type 3, PLTE lookup -> RGB, tRNS -> RGBA), 1/2/4-bit
    depths for gray and palette (MSB-first bit fields; gray samples
    scale to 0..255 per the spec), and Adam7 INTERLACE (seven
    independently-filtered passes scattered onto the lattice). Rejects
    16-bit depth (honest scope; format logic from the public W3C /
    RFC 2083 spec only)."""
    import zlib

    buf = bytes(data)
    if len(buf) < 8 + 25 or buf[:8] != _PNG_SIG:
        raise MediaFormatError("not a PNG payload")
    pos = 8
    ihdr = None
    idat = []
    plte = None
    trns = None
    seen_end = False
    while pos + 8 <= len(buf):
        size = int.from_bytes(buf[pos:pos + 4], "big")
        tag = buf[pos + 4:pos + 8]
        body = buf[pos + 8:pos + 8 + size]
        if len(body) != size or pos + 12 + size > len(buf):
            raise MediaFormatError("truncated PNG chunk")
        crc = int.from_bytes(buf[pos + 8 + size:pos + 12 + size], "big")
        if zlib.crc32(tag + body) != crc:
            raise MediaFormatError(f"PNG chunk {tag!r} CRC mismatch")
        if tag == b"IHDR":
            ihdr = body
        elif tag == b"IDAT":
            idat.append(body)
        elif tag == b"PLTE":
            if len(body) % 3 or not body:
                raise MediaFormatError("PLTE length not a multiple of 3")
            plte = np.frombuffer(body, dtype=np.uint8).reshape(-1, 3)
        elif tag == b"tRNS":
            trns = np.frombuffer(body, dtype=np.uint8)
        elif tag == b"IEND":
            seen_end = True
            break
        pos += 12 + size
    if ihdr is None or not idat or not seen_end:
        raise MediaFormatError("missing IHDR/IDAT/IEND chunk")
    w = int.from_bytes(ihdr[0:4], "big")
    h = int.from_bytes(ihdr[4:8], "big")
    depth, color_type, comp, filt, interlace = ihdr[8:13]
    ok = ((color_type in _PNG_CHANNELS and depth == 8)
          or (color_type in (0, 3) and depth in (1, 2, 4, 8)))
    if not ok:
        raise MediaFormatError(
            f"unsupported PNG shape (depth={depth}, "
            f"color_type={color_type}); 16-bit not supported")
    if comp != 0 or filt != 0 or interlace not in (0, 1):
        raise MediaFormatError("unsupported compression/filter method")
    if w <= 0 or h <= 0:
        raise MediaFormatError("degenerate PNG dimensions")
    if color_type == 3 and plte is None:
        raise MediaFormatError("palette PNG missing PLTE chunk")
    c = 1 if color_type == 3 else _PNG_CHANNELS[color_type]
    bpp = max(1, (c * depth) // 8)  # filter step, bytes
    try:
        raw = zlib.decompress(b"".join(idat))
    except zlib.error as e:
        raise MediaFormatError(f"bad IDAT stream: {e}") from None
    if interlace == 0:
        stride = (w * c * depth + 7) // 8  # bytes per scanline
        if len(raw) != h * (1 + stride):
            raise MediaFormatError("IDAT length does not match dimensions")
        samples = _expand_samples(
            _png_unfilter(raw, h, stride, bpp), w * c, depth
        ).reshape(h, w, c)
    else:
        # Adam7: seven independently-filtered sub-images, scattered
        # back onto the pixel grid by each pass's (start, step) lattice
        samples = np.zeros((h, w, c), dtype=np.uint8)
        pos = 0
        for xs, ys, xst, yst in _ADAM7:
            pw = (w - xs + xst - 1) // xst
            ph = (h - ys + yst - 1) // yst
            if pw <= 0 or ph <= 0:
                continue  # empty pass emits no bytes at all
            stride_p = (pw * c * depth + 7) // 8
            nbytes = ph * (1 + stride_p)
            if pos + nbytes > len(raw):
                raise MediaFormatError("truncated interlaced IDAT stream")
            sub = _png_unfilter(raw[pos:pos + nbytes], ph, stride_p, bpp)
            pos += nbytes
            samples[ys::yst, xs::xst] = _expand_samples(
                sub, pw * c, depth).reshape(ph, pw, c)
        if pos != len(raw):
            raise MediaFormatError("IDAT length does not match passes")
    if color_type == 3:
        idx = samples[:, :, 0]
        if int(idx.max(initial=0)) >= len(plte):
            raise MediaFormatError("palette index out of range")
        rgb = plte[idx]
        if trns is not None and len(trns):
            alpha = np.full(len(plte), 255, dtype=np.uint8)
            alpha[:min(len(trns), len(plte))] = trns[:len(plte)]
            return np.concatenate([rgb, alpha[idx][:, :, None]], axis=2)
        return rgb
    if depth < 8:
        # gray: scale d-bit samples to the full 0..255 range (spec 12.5)
        samples = (samples.astype(np.uint16) * 255 // ((1 << depth) - 1)
                   ).astype(np.uint8)
    return samples


def decode_image(data) -> np.ndarray:
    """Magic-byte dispatch to the pure-numpy image parsers: BMP ('BM'),
    PNG (8-byte signature), JPEG (SOI) or GIF ('GIF8', first composited
    frame) -> (H, W, C) uint8 (BMP/GIF always C=3; grayscale JPEG
    returns (H, W, 1))."""
    buf = bytes(data)
    if buf[:2] == b"BM":
        return decode_bmp(buf)
    if buf[:8] == _PNG_SIG:
        return decode_png(buf)
    if buf[:3] == b"\xFF\xD8\xFF":
        from .jpeg import decode_jpeg

        img = decode_jpeg(buf)
        return img[:, :, None] if img.ndim == 2 else img
    if buf[:4] == b"GIF8":
        from .gif import decode_gif

        return decode_gif(buf)
    raise MediaFormatError(
        "unrecognized image payload (BMP/PNG/JPEG/GIF supported)")


def encode_wav(samples: np.ndarray, rate: int = 8000) -> bytes:
    """Encode a 1-D int16 array as a 16-bit mono PCM RIFF/WAV payload."""
    pcm = np.asarray(samples, dtype="<i2").tobytes()
    fmt = ((1).to_bytes(2, "little") + (1).to_bytes(2, "little")
           + int(rate).to_bytes(4, "little")
           + int(rate * 2).to_bytes(4, "little")
           + (2).to_bytes(2, "little") + (16).to_bytes(2, "little"))
    body = (b"WAVE"
            + b"fmt " + len(fmt).to_bytes(4, "little") + fmt
            + b"data" + len(pcm).to_bytes(4, "little") + pcm)
    return b"RIFF" + len(body).to_bytes(4, "little") + body


def decode_wav(data) -> Tuple[int, np.ndarray]:
    """Decode a 16-bit PCM RIFF/WAV payload -> (sample_rate, int16
    samples). Walks the RIFF chunk list, so extra chunks (LIST, fact)
    before the data chunk are fine; mono or interleaved multi-channel
    (returned flat)."""
    buf = bytes(data)
    if len(buf) < 12 or buf[:4] != b"RIFF" or buf[8:12] != b"WAVE":
        raise MediaFormatError("not a RIFF/WAVE payload")
    pos, rate, bits, pcm = 12, None, None, None
    while pos + 8 <= len(buf):
        tag = buf[pos:pos + 4]
        size = int.from_bytes(buf[pos + 4:pos + 8], "little")
        body = buf[pos + 8:pos + 8 + size]
        if tag == b"fmt ":
            if len(body) < 16:
                raise MediaFormatError("short fmt chunk")
            audio_format = int.from_bytes(body[0:2], "little")
            rate = int.from_bytes(body[4:8], "little")
            bits = int.from_bytes(body[14:16], "little")
            if audio_format != 1 or bits != 16:
                raise MediaFormatError(
                    f"only 16-bit PCM supported (format={audio_format}, "
                    f"bits={bits})")
        elif tag == b"data":
            pcm = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if rate is None or pcm is None:
        raise MediaFormatError("missing fmt or data chunk")
    return rate, np.frombuffer(pcm, dtype="<i2", count=len(pcm) // 2).copy()


def attach_media_meta(df: DataFrame, media_col: str,
                      media_type: str = "image") -> DataFrame:
    """Typed metadata for an opaque binary media column (JVM-side where
    possible; width/height need decoding and stay null until then)."""
    return (df.withColumn("media_type", F.lit(media_type))
            .withColumn("n_bytes", F.length(media_col).cast("long"))
            .withColumn("sha256", F.sha2(F.col(media_col), 256)))


def _fake_decode(payload: bytes, target: int) -> np.ndarray:
    """Deterministic fake decoder: expands the payload hash into a
    (target, target, 3) uint8 'image'. Exercises the exact batch shapes a
    real decoder (PIL/libjpeg) would produce."""
    seed = int.from_bytes(hashlib.sha256(payload).digest()[:8], "big")
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, (target, target, 3), dtype=np.uint8)


def resize_nearest(img: np.ndarray, target: int) -> np.ndarray:
    """Nearest-neighbor resize of an (H, W, C) array to (target, target, C)
    — pure-index numpy, the batch shape a real resampler produces."""
    h, w = img.shape[:2]
    yi = (np.arange(target) * h // target).clip(0, h - 1)
    xi = (np.arange(target) * w // target).clip(0, w - 1)
    return img[yi][:, xi]


def decode_and_featurize(df: DataFrame, media_col: str, target: int = 32,
                         fake: bool = False) -> DataFrame:
    """binary -> decode -> resize(target x target) -> channel-mean feature
    vector, as one mapInPandas pass (media bytes never cross executors).

    The default path REALLY decodes: BMP payloads go through the
    pure-numpy decode_bmp parser (nearest-neighbor resized to
    target x target). fake=True swaps in the deterministic stub decoder
    (pipeline-shape tests); unknown formats raise MediaFormatError either
    way."""
    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            widths = []
            heights = []
            for payload in pdf[media_col]:
                if fake:
                    img = _fake_decode(bytes(payload), target)
                else:
                    img = decode_image(payload)
                heights.append(img.shape[0])
                widths.append(img.shape[1])
                img = resize_nearest(img, target)
                feats.append((img.reshape(-1, 3).mean(axis=0) / 255.0).tolist())
            out = pdf.drop(columns=[media_col])
            out["width"] = np.array(widths, dtype=np.int32)
            out["height"] = np.array(heights, dtype=np.int32)
            out["feature"] = feats
            yield out

    keep = [f for f in df.schema.fields if f.name != media_col]
    fields = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in keep)
    return df.mapInPandas(
        fn, f"{fields}, width int, height int, feature array<double>")


def image_stats(df: DataFrame, media_col: str) -> DataFrame:
    """Real-decode statistics per image: width, height, and the integer
    sum of all pixel channel values (bit-exactly recomputable, so an
    oracle can pin the decoder end-to-end). One mapInPandas pass."""
    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            widths, heights, sums = [], [], []
            for payload in pdf[media_col]:
                img = decode_image(payload)
                heights.append(img.shape[0])
                widths.append(img.shape[1])
                sums.append(int(img.sum(dtype=np.int64)))
            out = pdf.drop(columns=[media_col])
            out["width"] = np.array(widths, dtype=np.int32)
            out["height"] = np.array(heights, dtype=np.int32)
            out["px_sum"] = np.array(sums, dtype=np.int64)
            yield out

    keep = [f for f in df.schema.fields if f.name != media_col]
    fields = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in keep)
    return df.mapInPandas(fn, f"{fields}, width int, height int, px_sum long")


def audio_stats(df: DataFrame, media_col: str) -> DataFrame:
    """Real-decode statistics per WAV clip: sample rate, sample count and
    integer sample sum (oracle-recomputable)."""
    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rates, counts, sums = [], [], []
            for payload in pdf[media_col]:
                rate, samples = decode_wav(payload)
                rates.append(rate)
                counts.append(len(samples))
                sums.append(int(samples.sum(dtype=np.int64)))
            out = pdf.drop(columns=[media_col])
            out["sample_rate"] = np.array(rates, dtype=np.int32)
            out["n_samples"] = np.array(counts, dtype=np.int64)
            out["sample_sum"] = np.array(sums, dtype=np.int64)
            yield out

    keep = [f for f in df.schema.fields if f.name != media_col]
    fields = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in keep)
    return df.mapInPandas(
        fn, f"{fields}, sample_rate int, n_samples long, sample_sum long")


def media_embeddings(df: DataFrame, media_col: str, id_col: str,
                     dim: int = 16, fake: bool = False) -> DataFrame:
    """binary media -> embedding column (array<double>, L2-normalized),
    ready for the similarity operators (brute_force_topk / ivf_build /
    cosine_neardup_pairs): the multimodal near-dup pipeline is
    media_embeddings -> ann ops, all batch-vectorized, no shuffle here.

    The pixel source is REAL for BMP payloads (decode_bmp); there is no
    learned embedding network in this environment, so the "embedding" is
    a deterministic pixel-statistics vector: the image resized to a fixed
    grid, flattened, truncated to `dim`, centered and L2-normalized —
    the exact plumbing (schema, batch shape, normalization) a learned
    encoder would use. fake=True swaps the stub decoder in."""
    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        side = max(8, dim)
        for pdf in batches:
            embs = []
            for payload in pdf[media_col]:
                if fake:
                    img = _fake_decode(bytes(payload), side)
                else:
                    img = resize_nearest(decode_image(payload), side)
                v = img.reshape(-1)[: dim].astype(np.float64)
                v = v - v.mean()
                norm = np.linalg.norm(v)
                embs.append((v / norm if norm else v).tolist())
            yield pd.DataFrame({id_col: pdf[id_col].values,
                                "embedding": embs})

    return df.select(id_col, media_col).mapInPandas(
        fn, f"{id_col} long, embedding array<double>")


def frame_sample(df: DataFrame, media_col: str, every_n_bytes: int = 1024,
                 max_frames: int = 8) -> DataFrame:
    """'Video' frame sampling stand-in: emits one row per sampled byte
    offset (the exploded shape a real frame sampler produces), keeping the
    per-frame payload slice as binary. Real codec decode is stubbed the
    same way as decode_and_featurize."""
    offs = F.sequence(
        F.lit(0),
        F.least(F.length(media_col) - 1, F.lit(every_n_bytes * (max_frames - 1))),
        F.lit(every_n_bytes))
    return (df.withColumn("frame_offset", F.explode(offs))
            .withColumn("frame_bytes",
                        F.substring(F.col(media_col).cast("binary"),
                                    F.col("frame_offset") + 1, every_n_bytes))
            .drop(media_col))


# --- RIFF/AVI (Motion-JPEG) video ------------------------------------------
# Classic AVI 1.0 container (Microsoft "AVI RIFF File Reference", public
# spec): RIFF 'AVI ' -> LIST 'hdrl' (avih main header + LIST 'strl' with a
# 'vids'/'MJPG' strh and a BITMAPINFOHEADER strf) -> LIST 'movi' with one
# '00dc' chunk per frame -> 'idx1' index. MJPG frames are self-contained
# baseline JPEGs, so the r5 pure-numpy JPEG decoder (pipeline/jpeg.py) makes
# this a REAL video decode path; H.264/HEVC stay honestly out of scope.

def _u16(v: int) -> bytes:
    return int(v).to_bytes(2, "little")


def _u32(v: int) -> bytes:
    return int(v).to_bytes(4, "little")


def _avi_chunk(tag: bytes, body: bytes) -> bytes:
    # RIFF chunks are word-aligned: odd-sized bodies get a pad byte that
    # is NOT counted in the stored size.
    return tag + _u32(len(body)) + body + (b"\x00" if len(body) & 1 else b"")


_AVIF_HASINDEX = 0x10
_AVIIF_KEYFRAME = 0x10


def encode_avi_mjpeg(frames, width: int, height: int, fps: int = 10) -> bytes:
    """Encode JPEG frame payloads as a classic AVI 1.0 Motion-JPEG file:
    avih + vids/MJPG strh + BITMAPINFOHEADER strf, '00dc' movi chunks
    (word-aligned), and an idx1 index (offsets measured from the 'movi'
    fourcc, the convention players expect). Every frame must already be a
    JPEG payload (every MJPG frame is an independent keyframe)."""
    frames = [bytes(f) for f in frames]
    for f in frames:
        if f[:3] != b"\xFF\xD8\xFF":
            raise MediaFormatError("MJPG frames must be JPEG payloads")
    if fps <= 0:
        raise MediaFormatError("fps must be positive")
    n = len(frames)
    maxbuf = max((len(f) + 8 for f in frames), default=0)
    avih = b"".join([
        _u32(1_000_000 // fps),        # dwMicroSecPerFrame
        _u32(maxbuf * fps),            # dwMaxBytesPerSec
        _u32(0),                       # dwPaddingGranularity
        _u32(_AVIF_HASINDEX),          # dwFlags
        _u32(n),                       # dwTotalFrames
        _u32(0),                       # dwInitialFrames
        _u32(1),                       # dwStreams
        _u32(maxbuf),                  # dwSuggestedBufferSize
        _u32(width), _u32(height),
        _u32(0) * 4,                   # dwReserved
    ])
    strh = b"".join([
        b"vids", b"MJPG",
        _u32(0), _u16(0), _u16(0),     # flags, priority, language
        _u32(0),                       # initial frames
        _u32(1), _u32(fps),            # scale, rate (rate/scale = fps)
        _u32(0), _u32(n),              # start, length (frames)
        _u32(maxbuf), _u32(10000),     # suggested buffer, quality
        _u32(0),                       # sample size (0: varying chunks)
        _u16(0), _u16(0), _u16(width), _u16(height),  # rcFrame
    ])
    strf = b"".join([                  # BITMAPINFOHEADER
        _u32(40), _u32(width), _u32(height),
        _u16(1), _u16(24), b"MJPG",
        _u32(width * height * 3),
        _u32(0), _u32(0), _u32(0), _u32(0),
    ])
    strl = _avi_chunk(b"LIST", b"strl" + _avi_chunk(b"strh", strh)
                      + _avi_chunk(b"strf", strf))
    hdrl = _avi_chunk(b"LIST", b"hdrl" + _avi_chunk(b"avih", avih) + strl)
    movi_body, idx, off = [], [], 4    # idx1 offsets count from 'movi' fourcc
    for f in frames:
        chunk = _avi_chunk(b"00dc", f)
        idx.append(b"00dc" + _u32(_AVIIF_KEYFRAME) + _u32(off) + _u32(len(f)))
        movi_body.append(chunk)
        off += len(chunk)
    movi = _avi_chunk(b"LIST", b"movi" + b"".join(movi_body))
    idx1 = _avi_chunk(b"idx1", b"".join(idx))
    return _avi_chunk(b"RIFF", b"AVI " + hdrl + movi + idx1)


def decode_avi(data) -> Tuple[dict, list]:
    """Decode a classic AVI Motion-JPEG payload -> (meta, frame payloads).

    Walks the top-level RIFF chunk list (tolerating extra chunks like JUNK
    or INFO), parses the avih main header and the first video stream's
    strh/strf, collects '..dc'/'..db' frame chunks from the movi list, and
    cross-checks the container's declared frame count against the movi
    chunks actually present (a truncated or spliced file fails loudly
    rather than yielding fewer frames). Frame payloads are returned as-is
    (JPEGs for MJPG) — pair with decode_image / video_frame_stats.

    meta keys: width, height, n_frames, usec_per_frame, handler."""
    buf = bytes(data)
    if len(buf) < 12 or buf[:4] != b"RIFF" or buf[8:12] != b"AVI ":
        raise MediaFormatError("not a RIFF/AVI payload")
    declared = int.from_bytes(buf[4:8], "little")
    if 8 + declared > len(buf):
        raise MediaFormatError("truncated AVI: RIFF size exceeds payload")

    def walk(lo: int, hi: int):
        pos = lo
        while pos + 8 <= hi:
            tag = buf[pos:pos + 4]
            size = int.from_bytes(buf[pos + 4:pos + 8], "little")
            if pos + 8 + size > hi:
                raise MediaFormatError(f"truncated AVI chunk {tag!r}")
            yield tag, pos + 8, pos + 8 + size
            pos += 8 + size + (size & 1)

    meta, frames, handler = {}, [], None
    for tag, lo, hi in walk(12, 8 + declared):
        if tag != b"LIST":
            continue
        ltype = buf[lo:lo + 4]
        if ltype == b"hdrl":
            for t2, lo2, hi2 in walk(lo + 4, hi):
                if t2 == b"avih":
                    if hi2 - lo2 < 40:
                        raise MediaFormatError("short avih header")
                    meta["usec_per_frame"] = int.from_bytes(
                        buf[lo2:lo2 + 4], "little")
                    meta["n_frames"] = int.from_bytes(
                        buf[lo2 + 16:lo2 + 20], "little")
                    meta["width"] = int.from_bytes(
                        buf[lo2 + 32:lo2 + 36], "little")
                    meta["height"] = int.from_bytes(
                        buf[lo2 + 36:lo2 + 40], "little")
                elif t2 == b"LIST" and buf[lo2:lo2 + 4] == b"strl" \
                        and handler is None:
                    for t3, lo3, hi3 in walk(lo2 + 4, hi2):
                        if t3 == b"strh" and buf[lo3:lo3 + 4] == b"vids":
                            handler = buf[lo3 + 4:lo3 + 8].decode(
                                "ascii", "replace")
        elif ltype == b"movi":
            for t2, lo2, hi2 in walk(lo + 4, hi):
                if t2[2:4] in (b"dc", b"db"):
                    frames.append(buf[lo2:hi2])
    if "n_frames" not in meta:
        raise MediaFormatError("missing avih header")
    if not frames and meta["n_frames"]:
        raise MediaFormatError("missing movi frame data")
    if meta["n_frames"] != len(frames):
        raise MediaFormatError(
            f"frame count mismatch: avih declares {meta['n_frames']}, "
            f"movi carries {len(frames)}")
    meta["handler"] = handler
    return meta, frames


def decode_video_frames(data) -> Tuple[dict, list]:
    """Magic-byte video-container dispatch -> (meta, decoded frames as
    (H, W, C) uint8 arrays): RIFF/AVI Motion-JPEG (each movi chunk is an
    independent JPEG) or animated GIF (composited logical-screen
    frames). meta always carries n_frames/width/height."""
    buf = bytes(data)
    if buf[:4] == b"RIFF":
        meta, payloads = decode_avi(buf)
        return meta, [decode_image(f) for f in payloads]
    if buf[:4] == b"GIF8":
        from .gif import decode_gif_frames

        return decode_gif_frames(buf)
    raise MediaFormatError(
        "unrecognized video payload (AVI/MJPEG and animated GIF supported)")


def video_frame_stats(df: DataFrame, media_col: str, every_n: int = 1,
                      max_frames: Optional[int] = None) -> DataFrame:
    """REAL video frame sampling: parse each container (AVI/MJPEG or
    animated GIF), take every `every_n`-th frame (optionally capped at
    `max_frames`), decode each sampled frame through the pure-numpy
    decoders (MJPG -> JPEG; GIF -> composited LZW frames), and emit one
    row per sampled frame with bit-exactly recomputable stats
    (frame_idx, container n_frames, decoded width/height, integer pixel
    sum). One mapInPandas pass; media bytes never leave the task."""
    if every_n < 1:
        raise ValueError("every_n must be >= 1")

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            src, fidx, nfr, ws, hs, sums = [], [], [], [], [], []
            for i, payload in enumerate(pdf[media_col]):
                meta, frames = decode_video_frames(payload)
                sel = list(range(0, len(frames), every_n))
                if max_frames is not None:
                    sel = sel[:max_frames]
                for fi in sel:
                    img = frames[fi]
                    src.append(i)
                    fidx.append(fi)
                    nfr.append(meta["n_frames"])
                    hs.append(img.shape[0])
                    ws.append(img.shape[1])
                    sums.append(int(img.sum(dtype=np.int64)))
            out = pdf.drop(columns=[media_col]).iloc[src].reset_index(
                drop=True)
            out["frame_idx"] = np.array(fidx, dtype=np.int32)
            out["n_frames"] = np.array(nfr, dtype=np.int32)
            out["width"] = np.array(ws, dtype=np.int32)
            out["height"] = np.array(hs, dtype=np.int32)
            out["px_sum"] = np.array(sums, dtype=np.int64)
            yield out

    keep = [f for f in df.schema.fields if f.name != media_col]
    fields = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in keep)
    return df.mapInPandas(
        fn, f"{fields}, frame_idx int, n_frames int, width int, "
            f"height int, px_sum long")
