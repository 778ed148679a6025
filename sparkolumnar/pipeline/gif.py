"""Pure-numpy GIF87a/89a codec (decoder + encoder) for the multimodal
pipeline: palette-indexed LZW raster data, the four-pass interlace, 89a
graphic-control extensions (transparency, disposal 0-3) and multi-frame
animation compositing on the logical screen.

Derived from the public GIF89a specification (CompuServe, 1990; also
W3C's archived copy) — the LZW variant is the GIF flavor: variable code
width starting at min_code_size+1, LSB-first bit packing across 255-byte
sub-blocks, CLEAR/EOI codes, table frozen at 4096 entries until the next
CLEAR. GIF is lossless, so decoded frames are bit-exact functions of the
payload — every decode is SQL-oracle-able (unlike lossy JPEG, which needs
the constant-tile configuration).

Reference-parity note: the reference engine (loro-dev/columnar) has no
media support at all; this extends the training-data pipeline the same
way pipeline/jpeg.py does (see SURVEY.md §2 pipeline extensions).
"""
from __future__ import annotations

from typing import List, Optional, Tuple

import numpy as np


class GifError(ValueError):
    pass


_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))  # (start, step) rows


def _interlace_order(h: int) -> np.ndarray:
    return np.concatenate([np.arange(s, h, t) for s, t in _INTERLACE_PASSES])


# --- LZW (GIF variant) ------------------------------------------------------

def _lzw_decode(data: bytes, min_code_size: int, n_expected: int) -> np.ndarray:
    """Decode a GIF LZW stream (sub-block bodies already concatenated) to
    exactly n_expected palette indices. Codes are packed LSB-first; the
    table freezes at 4096 entries until a CLEAR arrives (deferred-clear
    files decode correctly)."""
    if not 2 <= min_code_size <= 11:
        raise GifError(f"bad LZW min code size {min_code_size}")
    clear = 1 << min_code_size
    eoi = clear + 1
    # bit reservoir: all bits of the stream as one little-endian integer
    bits = int.from_bytes(data, "little")
    nbits = len(data) * 8
    pos = 0
    width = min_code_size + 1
    table: List[bytes] = [bytes([i]) for i in range(clear)] + [b"", b""]
    prev: Optional[bytes] = None
    out = bytearray()
    while len(out) < n_expected:
        if pos + width > nbits:
            raise GifError("truncated LZW stream")
        code = (bits >> pos) & ((1 << width) - 1)
        pos += width
        if code == clear:
            table = [bytes([i]) for i in range(clear)] + [b"", b""]
            width = min_code_size + 1
            prev = None
            continue
        if code == eoi:
            break
        if code < len(table):
            entry = table[code]
        elif code == len(table) and prev is not None:
            entry = prev + prev[:1]
        else:
            raise GifError(f"LZW code {code} out of range")
        out += entry
        if prev is not None and len(table) < 4096:
            table.append(prev + entry[:1])
            if len(table) == (1 << width) and width < 12:
                width += 1
        prev = entry
    if len(out) < n_expected:
        raise GifError(
            f"LZW stream ended early: {len(out)} of {n_expected} pixels")
    return np.frombuffer(bytes(out[:n_expected]), dtype=np.uint8)


def _lzw_encode(indices: np.ndarray, min_code_size: int) -> bytes:
    """Real GIF LZW compression (string table grown per emitted code,
    CLEAR re-emitted when the table hits 4096) — the round-trip partner
    that makes tests exercise the decoder's dictionary-growth path."""
    clear = 1 << min_code_size
    eoi = clear + 1
    codes: List[Tuple[int, int]] = []  # (code, width-at-emit)

    def reset():
        return {(-1, i): i for i in range(clear)}, eoi + 1, min_code_size + 1

    table, nxt, width = reset()
    codes.append((clear, width))
    cur = -1
    for k in map(int, indices):
        if (cur, k) in table:
            cur = table[(cur, k)]
            continue
        codes.append((cur, width))
        table[(cur, k)] = nxt
        nxt += 1
        # the encoder's table runs ONE entry ahead of the decoder's (the
        # decoder only appends from the second code after a clear), so
        # its width bump fires at nxt-1 where the decoder's fires at its
        # table size — both sides then switch before the same code
        if nxt - 1 == (1 << width) and width < 12:
            width += 1
        if nxt == 4096:
            codes.append((clear, width))
            table, nxt, width = reset()
        cur = k
    if cur != -1:
        codes.append((cur, width))
    codes.append((eoi, width))
    bits = 0
    pos = 0
    for code, w in codes:
        bits |= code << pos
        pos += w
    return bits.to_bytes((pos + 7) // 8, "little")


def _sub_blocks(data: bytes) -> bytes:
    out = bytearray()
    for i in range(0, len(data), 255):
        chunk = data[i:i + 255]
        out.append(len(chunk))
        out += chunk
    out.append(0)
    return bytes(out)


def _read_sub_blocks(buf: bytes, pos: int) -> Tuple[bytes, int]:
    out = bytearray()
    while True:
        if pos >= len(buf):
            raise GifError("truncated sub-block chain")
        n = buf[pos]
        pos += 1
        if n == 0:
            return bytes(out), pos
        if pos + n > len(buf):
            raise GifError("truncated sub-block")
        out += buf[pos:pos + n]
        pos += n


# --- container --------------------------------------------------------------

def decode_gif_frames(data) -> Tuple[dict, List[np.ndarray]]:
    """Decode a GIF payload -> (meta, composited RGB frames).

    Each returned frame is the full logical screen (H, W, 3) uint8 after
    applying that image's rect, palette (local over global), transparency
    and the PREVIOUS frame's disposal method (1 keep, 2 restore to
    background color, 3 restore previous). meta: width, height, n_frames,
    delays_cs (per-frame hundredths of a second), version."""
    buf = bytes(data)
    if buf[:6] not in (b"GIF87a", b"GIF89a"):
        raise GifError("not a GIF payload")
    if len(buf) < 13:
        raise GifError("truncated GIF header")
    w = int.from_bytes(buf[6:8], "little")
    h = int.from_bytes(buf[8:10], "little")
    flags, bg_index = buf[10], buf[11]
    pos = 13
    gct = None
    if flags & 0x80:
        n = 2 << (flags & 0x07)
        if pos + 3 * n > len(buf):
            raise GifError("truncated global color table")
        gct = np.frombuffer(buf[pos:pos + 3 * n],
                            dtype=np.uint8).reshape(n, 3)
        pos += 3 * n
    if gct is not None and bg_index < len(gct):
        canvas = np.tile(gct[bg_index], (h, w, 1))
    else:
        canvas = np.zeros((h, w, 3), dtype=np.uint8)
    frames: List[np.ndarray] = []
    delays: List[int] = []
    transparent: Optional[int] = None
    disposal = 0
    delay = 0
    while True:
        if pos >= len(buf):
            raise GifError("missing GIF trailer")
        block = buf[pos]
        pos += 1
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension
            if pos >= len(buf):
                raise GifError("truncated extension")
            label = buf[pos]
            pos += 1
            body, pos = _read_sub_blocks(buf, pos)
            if label == 0xF9:  # graphic control
                if len(body) < 4:
                    raise GifError("short graphic control extension")
                disposal = (body[0] >> 2) & 0x07
                delay = int.from_bytes(body[1:3], "little")
                transparent = body[3] if body[0] & 0x01 else None
            continue  # comment (0xFE) / application (0xFF): skipped
        if block != 0x2C:
            raise GifError(f"unknown GIF block 0x{block:02x}")
        if pos + 9 > len(buf):
            raise GifError("truncated image descriptor")
        ix = int.from_bytes(buf[pos:pos + 2], "little")
        iy = int.from_bytes(buf[pos + 2:pos + 4], "little")
        iw = int.from_bytes(buf[pos + 4:pos + 6], "little")
        ih = int.from_bytes(buf[pos + 6:pos + 8], "little")
        iflags = buf[pos + 8]
        pos += 9
        if ix + iw > w or iy + ih > h:
            raise GifError("image rect exceeds logical screen")
        pal = gct
        if iflags & 0x80:  # local color table
            n = 2 << (iflags & 0x07)
            if pos + 3 * n > len(buf):
                raise GifError("truncated local color table")
            pal = np.frombuffer(buf[pos:pos + 3 * n],
                                dtype=np.uint8).reshape(n, 3)
            pos += 3 * n
        if pal is None:
            raise GifError("image has neither local nor global color table")
        if pos >= len(buf):
            raise GifError("missing LZW min code size")
        mcs = buf[pos]
        pos += 1
        body, pos = _read_sub_blocks(buf, pos)
        idx = _lzw_decode(body, mcs, iw * ih).reshape(ih, iw)
        if iflags & 0x40:  # interlaced: rows arrive in four-pass order
            rows = np.empty_like(idx)
            rows[_interlace_order(ih)] = idx
            idx = rows
        if int(idx.max(initial=0)) >= len(pal):
            raise GifError("palette index out of range")
        saved = canvas.copy() if disposal == 3 else None
        rect = canvas[iy:iy + ih, ix:ix + iw]
        rgb = pal[idx]
        if transparent is not None:
            mask = idx != transparent
            rect[mask] = rgb[mask]
        else:
            rect[...] = rgb
        frames.append(canvas.copy())
        delays.append(delay)
        if disposal == 2:
            if gct is not None and bg_index < len(gct):
                canvas[iy:iy + ih, ix:ix + iw] = gct[bg_index]
            else:
                canvas[iy:iy + ih, ix:ix + iw] = 0
        elif disposal == 3 and saved is not None:
            canvas = saved
        transparent, disposal, delay = None, 0, 0
    if not frames:
        raise GifError("GIF contains no image data")
    meta = {"width": w, "height": h, "n_frames": len(frames),
            "delays_cs": delays, "version": buf[3:6].decode("ascii")}
    return meta, frames


def decode_gif(data) -> np.ndarray:
    """First composited frame of a GIF payload as (H, W, 3) uint8."""
    return decode_gif_frames(data)[1][0]


def encode_gif(frames, palette, delays_cs=None, transparent=None,
               disposal=1, interlace=False, bg_index: int = 0) -> bytes:
    """Encode palette-index frames (each (H, W) uint8, full logical
    screen) + one global (N, 3) palette as an animated GIF89a (87a when a
    single frame needs no extensions) with REAL LZW compression.
    `transparent` marks that index transparent in every frame after the
    first (the standard delta-animation shape)."""
    frames = [np.asarray(f, dtype=np.uint8) for f in frames]
    if not frames:
        raise GifError("need at least one frame")
    h, w = frames[0].shape
    pal = np.asarray(palette, dtype=np.uint8).reshape(-1, 3)
    npal = 1
    while (1 << npal) < len(pal):
        npal += 1
    if not 1 <= npal <= 8:
        raise GifError("palette must have 2..256 entries")
    pal_full = np.zeros((1 << npal, 3), dtype=np.uint8)
    pal_full[:len(pal)] = pal
    mcs = max(2, npal)
    animated = len(frames) > 1 or transparent is not None
    out = bytearray(b"GIF89a" if animated else b"GIF87a")
    out += w.to_bytes(2, "little") + h.to_bytes(2, "little")
    out.append(0x80 | (npal - 1))  # GCT present, 2^npal entries
    out.append(bg_index)
    out.append(0)  # pixel aspect ratio
    out += pal_full.tobytes()
    for fi, f in enumerate(frames):
        if f.shape != (h, w):
            raise GifError("all frames must match the logical screen")
        if int(f.max(initial=0)) >= len(pal_full):
            raise GifError("frame index exceeds palette")
        if animated:
            gce_flags = (disposal & 0x07) << 2
            tindex = 0
            if transparent is not None and fi > 0:
                gce_flags |= 0x01
                tindex = transparent
            delay = (delays_cs[fi] if delays_cs else 4)
            out += (b"\x21\xF9\x04" + bytes([gce_flags])
                    + int(delay).to_bytes(2, "little")
                    + bytes([tindex, 0]))
        out += b"\x2C" + (0).to_bytes(2, "little") * 2
        out += w.to_bytes(2, "little") + h.to_bytes(2, "little")
        out.append(0x40 if interlace else 0x00)
        idx = f
        if interlace:
            idx = f[_interlace_order(h)]
        out.append(mcs)
        out += _sub_blocks(_lzw_encode(idx.reshape(-1), mcs))
    out.append(0x3B)
    return bytes(out)
