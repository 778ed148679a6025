"""Vectorized (numpy/Arrow) implementations of the reference codec family:
AnyRle, BoolRle, DeltaRle, DeltaOfDelta — byte-identical on the wire to the
scalar model in sparkolumnar.refmodel (and therefore to the reference
loro-dev/columnar formats; see refmodel module docstring for citations).

Hot paths are whole-array numpy; rare extreme-value batches (deltas beyond
i64) fall back to the scalar refmodel for exactness.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .. import refmodel as rm
from .core import (BIN, BOOL, F32, F64, INT, STR, Codec, from_int64,
                   from_str_buffers, register, str_buffers, to_int64)
from .nputil import (CodecError, gather_chunks, interleave_sorted, orbit,
                     repeat_offsets, run_segments, run_starts_from_neq,
                     uvarint_decode, uvarint_encode, uvarint_size,
                     zigzag_decode, zigzag_encode)

MAX_RLE_COUNT = rm.MAX_RLE_COUNT


# ---------------------------------------------------------------------------
# shared group machinery (AnyRle grouping semantics, rle.rs:88-137)
# ---------------------------------------------------------------------------

def _rle_groups(run_lens: np.ndarray):
    """Group maximal runs into AnyRle groups.

    Returns (first_run, runs_per_group, header_values, group_is_run):
    runs of length >= 2 form their own run group (+len header); consecutive
    length-1 runs coalesce into one literal group (-count header).
    """
    k = len(run_lens)
    if k == 0:
        z = np.empty(0, np.int64)
        return z, z, z, np.empty(0, bool)
    is_run = run_lens >= 2
    new_group = np.ones(k, dtype=bool)
    new_group[1:] = is_run[1:] | is_run[:-1]
    first_run = np.flatnonzero(new_group)
    runs_per_group = np.diff(np.append(first_run, k))
    grp_is_run = is_run[first_run]
    headers = np.where(grp_is_run, run_lens[first_run], -runs_per_group)
    return first_run, runs_per_group, headers, grp_is_run


def _encode_groups(headers: np.ndarray, first_run: np.ndarray,
                   val_bytes: np.ndarray, val_offsets: np.ndarray) -> bytes:
    """Interleave zigzag-varint group headers with per-group value spans.

    val_offsets has one entry per run (start of that run's serialized
    representative value in val_bytes) plus a final end sentinel.
    """
    hz = zigzag_encode(headers)
    h_lens = uvarint_size(hz)
    h_bytes = np.frombuffer(uvarint_encode(hz), dtype=np.uint8)
    v_starts = val_offsets[first_run]
    v_ends = val_offsets[np.append(first_run[1:], len(val_offsets) - 1)]
    # group value spans are sorted, contiguous slices of val_bytes and the
    # header varints are already a contiguous stream -> mask interleave
    out = interleave_sorted(h_bytes, h_lens,
                            val_bytes, v_starts, v_ends - v_starts)
    return out.tobytes()


# ---------------------------------------------------------------------------
# AnyRle over int64 (values as zigzag varints, postcard i128-compatible)
# ---------------------------------------------------------------------------

def rle_encode_int64(vals: np.ndarray) -> bytes:
    vals = np.ascontiguousarray(vals, dtype=np.int64)
    starts, lens = run_segments(vals)
    first_run, _, headers, _ = _rle_groups(lens)
    rep = vals[starts]
    zz = zigzag_encode(rep)
    sizes = uvarint_size(zz)
    vbytes = np.frombuffer(uvarint_encode(zz), dtype=np.uint8)
    voff = np.append(np.cumsum(sizes) - sizes, len(vbytes))
    return _encode_groups(headers, first_run, vbytes, voff)


def _scan_varint_groups(payload: bytes, n_vals_max: int):
    """Decode every varint in an all-varint AnyRle stream, then recover the
    group-header positions with a pointer-doubling orbit (O(log n) passes)."""
    w, consumed = uvarint_decode(payload)
    if consumed != len(payload):
        raise CodecError("trailing bytes in rle stream")
    sv = zigzag_decode(w)
    k = len(w)
    if k == 0:
        return w, sv, np.empty(0, np.int64)
    absv = np.abs(sv)
    absv[absv < 0] = k + 2  # i64::MIN; abs overflows — clamp past the end
    step = np.where(sv > 0, 2, 1 + np.minimum(absv, k + 2))
    jump = np.arange(k, dtype=np.int64) + step
    hpos = orbit(jump, 0, min(k, n_vals_max + 1))
    if np.any(np.abs(sv[hpos]) > MAX_RLE_COUNT):
        raise CodecError("decode Rle count is too large")
    if np.any(sv[hpos] == 0):
        raise CodecError("invalid rle count 0")
    end = hpos[-1] + step[hpos[-1]]
    if end != k:
        raise CodecError("rle stream group structure does not cover stream")
    return w, sv, hpos


def _expand_groups_int64(w, sv, hpos, n: int, k: int = -1) -> np.ndarray:
    """Expand parsed AnyRle groups to values; k >= 0 caps expansion at the
    first k values (take_n_finalize, rle.rs:165-246 — the header parse is
    sequential wire format, but value materialization is the O(n) part)."""
    h = sv[hpos]
    counts = np.abs(h)
    if int(counts.sum()) != n:
        raise CodecError(f"rle payload decodes {counts.sum()} values, expected {n}")
    is_lit = h < 0
    if 0 <= k < n:
        cum = np.cumsum(counts)
        g = int(np.searchsorted(cum, k, side="left")) + 1
        counts = counts[:g].copy()
        counts[-1] -= int(cum[g - 1]) - k
        hpos, is_lit = hpos[:g], is_lit[:g]
    piece_id, within = repeat_offsets(counts)
    idx = hpos[piece_id] + 1 + np.where(is_lit[piece_id], within, 0)
    return zigzag_decode(w[idx]).astype(np.int64, copy=False)


def rle_decode_int64(payload: bytes, n: int, k: int = -1) -> np.ndarray:
    if len(payload) == 0:
        if n:
            raise CodecError("empty rle payload")
        return np.empty(0, np.int64)
    try:
        w, sv, hpos = _scan_varint_groups(payload, n)
    except CodecError:
        # extreme i128 payloads: exact scalar fallback
        vals = rm.any_rle_decode(bytes(payload), de=rm.de_i128)
        out = np.array(vals, dtype=np.int64)
        return out[:k] if 0 <= k else out
    return _expand_groups_int64(w, sv, hpos, n, k)


# ---------------------------------------------------------------------------
# AnyRle over strings/binary (values as varint len + payload)
# ---------------------------------------------------------------------------

def _binary_neq(arr: pa.Array) -> np.ndarray:
    n = len(arr)
    if n <= 1:
        return np.empty(0, bool)
    neq = pc.not_equal(arr.slice(1, n - 1), arr.slice(0, n - 1))
    return np.asarray(neq.to_numpy(zero_copy_only=False), dtype=bool)


def rle_encode_binary(arr: pa.Array) -> bytes:
    """AnyRle over a null-free arrow string/binary array."""
    n = len(arr)
    if n == 0:
        return b""
    starts, lens = run_starts_from_neq(_binary_neq(arr), n)
    first_run, _, headers, _ = _rle_groups(lens)
    data, offsets = str_buffers(arr)
    rep_starts = offsets[starts]
    rep_lens = offsets[starts + 1] - rep_starts
    # serialize representatives: varint(len) + bytes, one piece per run
    lz = rep_lens.astype(np.uint64)
    pre_lens = uvarint_size(lz)
    pre_bytes = np.frombuffer(uvarint_encode(lz), dtype=np.uint8)
    # representative slices are sorted + disjoint in data (one per run,
    # in payload order) -> mask interleave, no per-byte index arrays
    vbytes = interleave_sorted(pre_bytes, pre_lens,
                               data, rep_starts, rep_lens)
    piece_sizes = pre_lens + rep_lens
    voff = np.append(np.cumsum(piece_sizes) - piece_sizes, len(vbytes))
    return _encode_groups(headers, first_run, vbytes, voff)


def rle_size_int64(vals: np.ndarray) -> int:
    """Exact encoded size of rle_encode_int64(vals) without encoding."""
    starts, lens = run_segments(np.ascontiguousarray(vals, dtype=np.int64))
    first_run, _, headers, _ = _rle_groups(lens)
    vbytes = int(uvarint_size(zigzag_encode(vals[starts])).sum())
    hbytes = int(uvarint_size(zigzag_encode(headers)).sum())
    return vbytes + hbytes


def int_candidate_sizes(vals: np.ndarray) -> dict:
    """Exact encoded sizes of every INT-domain candidate, computed
    analytically in ~2 passes (no payloads built). Keys missing when the
    codec cannot encode this batch (dod overflow, i64-exceeding deltas).

    The selector encodes only the argmin — turning 5 full encode passes
    per int column into size arithmetic plus one encode.
    """
    vals = np.ascontiguousarray(vals, dtype=np.int64)
    n = len(vals)
    out = {}
    # plain: count varint + zigzag varints
    zz = zigzag_encode(vals)
    out["plain"] = len(rm.uvarint(n)) + int(uvarint_size(zz).sum())
    # rle
    out["rle"] = rle_size_int64(vals)
    # for_bitpack: svarint(frame) + varint(n) + width byte + packed bits
    if n:
        frame = int(vals.min())
        with np.errstate(over="ignore"):
            rel = vals.view(np.uint64) - np.uint64(frame & ((1 << 64) - 1))
        width = int(rel.max()).bit_length()
        out["for_bitpack"] = (len(rm.svarint_bytes(frame)) + len(rm.uvarint(n))
                              + 1 + (n * width + 7) // 8)
    else:
        out["for_bitpack"] = 3
    # delta_rle (fast path only; extreme batches just skip the estimate)
    try:
        d = _deltas_i64(vals)
        out["delta_rle"] = rle_size_int64(d)
    except CodecError:
        pass
    # dod: header + sum of bucket widths
    if n == 0:
        out["dod"] = 2
    else:
        head = len(rm.svarint_bytes(int(vals[0]))) + 2  # tag + last_used byte
        if n == 1:
            out["dod"] = head
        else:
            try:
                d = _deltas_i64(vals)[1:]
                dod = np.empty_like(d)
                dod[0] = d[0]
                with np.errstate(over="ignore"):
                    np.subtract(d[1:], d[:-1], out=dod[1:])
                if len(d) > 1 and np.any((d[1:] >= d[:-1]) != (dod[1:] >= 0)):
                    raise CodecError("dod overflow")
                bits = np.full(len(dod), 69, dtype=np.int64)
                bits[dod == 0] = 1
                for lo, hi, _, plen, pbits, _ in _DOD_BUCKETS:
                    m = (dod >= lo) & (dod <= hi) & (bits == 69) & (dod != 0)
                    bits[m] = plen + pbits
                out["dod"] = head + (int(bits.sum()) + 7) // 8
            except CodecError:
                pass
    return out


def rle_size_binary(arr: pa.Array) -> int:
    """Exact encoded size of rle_encode_binary(arr) WITHOUT encoding —
    same run/group arithmetic, just summed. Lets the selector prove
    rle-vs-split ordering (the reference's strategy set) in one cheap
    comparison pass instead of a worst-case all-literal encode."""
    n = len(arr)
    if n == 0:
        return 0
    starts, lens = run_starts_from_neq(_binary_neq(arr), n)
    first_run, _, headers, _ = _rle_groups(lens)
    _, offsets = str_buffers(arr)
    rep_lens = (offsets[starts + 1] - offsets[starts]).astype(np.uint64)
    vbytes = int(rep_lens.sum()) + int(uvarint_size(rep_lens).sum())
    hbytes = int(uvarint_size(zigzag_encode(headers)).sum())
    return vbytes + hbytes


def rle_decode_binary(payload: bytes, n: int) -> Tuple[np.ndarray, np.ndarray]:
    """Decode AnyRle string payload -> (data uint8, offsets int64).

    Group headers are scanned in a small Python loop (one iteration per
    *group*, not per value); values inside literal groups decode vectorized.
    """
    buf = np.frombuffer(payload, dtype=np.uint8)
    out_starts = []  # per output value: (src_start, length) into buf
    out_lens = []
    pos = 0
    r = rm.Reader(bytes(payload))
    total = 0
    while r.pos < len(buf):
        h = r.read_svarint()
        if abs(h) > MAX_RLE_COUNT:
            raise CodecError("decode Rle count is too large")
        if h == 0:
            raise CodecError("invalid rle count 0")
        if h > 0:
            slen = r.read_uvarint()
            start = r.pos
            r.pos += slen
            out_starts.append(np.full(h, start, dtype=np.int64))
            out_lens.append(np.full(h, slen, dtype=np.int64))
            total += h
        else:
            cnt = -h
            # decode cnt (len, payload) pairs vectorized
            starts = np.empty(cnt, dtype=np.int64)
            lens_ = np.empty(cnt, dtype=np.int64)
            for i in range(cnt):
                slen = r.read_uvarint()
                starts[i] = r.pos
                lens_[i] = slen
                r.pos += slen
            out_starts.append(starts)
            out_lens.append(lens_)
            total += cnt
    if total != n:
        raise CodecError(f"rle payload decodes {total} values, expected {n}")
    if total == 0:
        return np.empty(0, np.uint8), np.zeros(1, np.int64)
    src_starts = np.concatenate(out_starts)
    src_lens = np.concatenate(out_lens)
    data = gather_chunks(buf, src_starts, src_lens)
    offsets = np.empty(total + 1, dtype=np.int64)
    offsets[0] = 0
    np.cumsum(src_lens, out=offsets[1:])
    return data, offsets


# ---------------------------------------------------------------------------
# AnyRle over f64/f32 (values fixed little-endian)
# ---------------------------------------------------------------------------

def rle_encode_float(vals: np.ndarray) -> bytes:
    width = vals.dtype.itemsize
    vals = np.ascontiguousarray(vals)
    # runs must use bit-equality (NaN != NaN under IEEE but the reference's
    # f32/f64 are not Rleable; floats only appear in Generic columns there —
    # we still offer float RLE with bitwise equality for our own format)
    bits = vals.view(np.uint32 if width == 4 else np.uint64)
    starts, lens = run_segments(bits)
    first_run, _, headers, _ = _rle_groups(lens)
    rep = vals[starts].astype(vals.dtype.newbyteorder("<"), copy=False)
    vbytes = np.frombuffer(rep.tobytes(), dtype=np.uint8)
    voff = np.arange(len(starts) + 1, dtype=np.int64) * width
    return _encode_groups(headers, first_run, vbytes, voff)


def rle_decode_float(payload: bytes, n: int, dtype) -> np.ndarray:
    width = np.dtype(dtype).itemsize
    buf = np.frombuffer(payload, dtype=np.uint8)
    r = rm.Reader(bytes(payload))
    starts = []
    lens_ = []
    total = 0
    while r.pos < len(buf):
        h = r.read_svarint()
        if abs(h) > MAX_RLE_COUNT:
            raise CodecError("decode Rle count is too large")
        if h > 0:
            starts.append(np.full(h, r.pos, dtype=np.int64))
            r.pos += width
            total += h
        elif h < 0:
            cnt = -h
            starts.append(r.pos + np.arange(cnt, dtype=np.int64) * width)
            r.pos += cnt * width
            total += cnt
        else:
            raise CodecError("invalid rle count 0")
    if total != n:
        raise CodecError(f"rle payload decodes {total} values, expected {n}")
    if total == 0:
        return np.empty(0, dtype)
    src = np.concatenate(starts)
    data = gather_chunks(buf, src, np.full(total, width, dtype=np.int64))
    return data.view(np.dtype(dtype).newbyteorder("<")).astype(dtype, copy=False)


# ---------------------------------------------------------------------------
# BoolRle (rle.rs:14-43)
# ---------------------------------------------------------------------------

def bool_rle_encode(vals: np.ndarray) -> bytes:
    vals = np.ascontiguousarray(vals, dtype=bool)
    if len(vals) == 0:
        return b""
    starts, lens = run_segments(vals)
    counts = lens.astype(np.uint64)
    if vals[0]:
        counts = np.concatenate([[np.uint64(0)], counts])
    return uvarint_encode(counts)


def bool_rle_decode(payload: bytes, n: int) -> np.ndarray:
    counts, consumed = uvarint_decode(payload)
    if consumed != len(payload):
        raise CodecError("trailing bytes in bool rle stream")
    if np.any(counts > MAX_RLE_COUNT):
        raise CodecError("decode Rle count is too large")
    counts = counts.astype(np.int64)
    if int(counts.sum()) != n:
        raise CodecError(f"bool rle decodes {counts.sum()} values, expected {n}")
    vals = (np.arange(len(counts), dtype=np.int64) % 2).astype(bool)
    return np.repeat(vals, counts)


# ---------------------------------------------------------------------------
# DeltaRle (rle.rs:311-401): AnyRle over first-order deltas (i128 saturating)
# ---------------------------------------------------------------------------

def _deltas_i64(vals: np.ndarray) -> np.ndarray:
    """First-order deltas (first vs 0); raises CodecError if any true delta
    exceeds i64 (caller falls back to the scalar i128 model)."""
    d = np.empty_like(vals)
    if len(vals) == 0:
        return d
    d[0] = vals[0]
    with np.errstate(over="ignore"):
        np.subtract(vals[1:], vals[:-1], out=d[1:])
    if len(vals) > 1 and np.any((vals[1:] >= vals[:-1]) != (d[1:] >= 0)):
        raise CodecError("delta exceeds i64")
    return d


class _ScalarFallback(Exception):
    pass


def delta_rle_encode_int64(vals: np.ndarray) -> bytes:
    vals = np.ascontiguousarray(vals, dtype=np.int64)
    try:
        return rle_encode_int64(_deltas_i64(vals))
    except CodecError:
        return rm.delta_rle_encode([int(v) for v in vals])


def delta_rle_decode_int64(payload: bytes, n: int, k: int = -1) -> np.ndarray:
    try:
        if len(payload) == 0:
            if n:
                raise CodecError("empty delta rle payload")
            return np.empty(0, np.int64)
        w, sv, hpos = _scan_varint_groups(payload, n)
        deltas = _expand_groups_int64(w, sv, hpos, n, k)
        with np.errstate(over="ignore"):
            out = np.cumsum(deltas)
        return out.astype(np.int64, copy=False)
    except CodecError:
        vals = rm.delta_rle_decode(bytes(payload), lo=rm.I64_MIN, hi=rm.I64_MAX)
        if len(vals) != n:
            raise CodecError(f"delta rle decodes {len(vals)}, expected {n}")
        out = np.array(vals, dtype=np.int64)
        return out[:k] if 0 <= k else out


# ---------------------------------------------------------------------------
# DeltaOfDelta (rle.rs:403-672): Gorilla prefix-coded second-order deltas
# ---------------------------------------------------------------------------

_DOD_MAX = 1 << 20
# (lo, hi, prefix_bits, prefix_len, payload_bits, bias)
_DOD_BUCKETS = (
    (-63, 64, 0b10, 2, 7, 63),
    (-255, 256, 0b110, 3, 9, 255),
    (-2047, 2048, 0b1110, 4, 12, 2047),
    (-_DOD_MAX + 1, _DOD_MAX, 0b11110, 5, 21, _DOD_MAX - 1),
)


def dod_encode_int64(vals: np.ndarray) -> bytes:
    vals = np.ascontiguousarray(vals, dtype=np.int64)
    n = len(vals)
    if n == 0:
        return b"\x00\x00"
    head = int(vals[0])
    out = bytearray(b"\x01" + rm.svarint_bytes(head))
    if n == 1:
        out.append(0)
        return bytes(out)
    d = _deltas_i64(vals)[1:]  # deltas vs previous, n-1 of them
    dod = np.empty_like(d)
    dod[0] = d[0]
    with np.errstate(over="ignore"):
        np.subtract(d[1:], d[:-1], out=dod[1:])
    if len(d) > 1 and np.any((d[1:] >= d[:-1]) != (dod[1:] >= 0)):
        raise CodecError("delta of delta overflow 64 bits")
    # classify
    widths = np.full(len(dod), 69, dtype=np.int64)  # 5 + 64 default
    cls = np.full(len(dod), 5, dtype=np.int8)
    zero = dod == 0
    widths[zero] = 1
    cls[zero] = 0
    unassigned = ~zero
    for ci, (lo, hi, _, plen, pbits, _) in enumerate(_DOD_BUCKETS, start=1):
        m = unassigned & (dod >= lo) & (dod <= hi)
        widths[m] = plen + pbits
        cls[m] = ci
        unassigned &= ~m
    offs = np.cumsum(widths) - widths
    total_bits = int(widths.sum())
    bits = np.zeros(total_bits, dtype=np.uint8)
    specs = [(1, 0, 0, 0)] + [(b[3], b[2], b[4], b[5]) for b in _DOD_BUCKETS] + [(5, 0b11111, 64, 0)]
    for ci, (plen, pfx, pbits, bias) in enumerate(specs):
        if ci == 0:
            continue  # dod == 0 encodes as a single 0 bit (already zeroed)
        idx = np.flatnonzero(cls == ci)
        if len(idx) == 0:
            continue
        start = offs[idx]
        for j in range(plen):
            bits[start + j] = (pfx >> (plen - 1 - j)) & 1
        if pbits == 64:
            payload = dod[idx].view(np.uint64)
        else:
            payload = (dod[idx] + bias).view(np.uint64)
        for j in range(pbits):
            bits[start + plen + j] = ((payload >> np.uint64(pbits - 1 - j)) & np.uint64(1)).astype(np.uint8)
    packed = np.packbits(bits)
    last_used = total_bits % 8
    if last_used == 0 and total_bits > 0:
        last_used = 8
    out.append(last_used)
    out += packed.tobytes()
    return bytes(out)


def dod_decode_int64(payload: bytes, n: int) -> np.ndarray:
    r = rm.Reader(bytes(payload))
    tag = r.take(1)[0]
    head = r.read_svarint() if tag else None
    if r.eof():
        raise CodecError("invalid DeltaOfDelta input")
    last_used = r.take(1)[0]
    body = np.frombuffer(payload, dtype=np.uint8)[r.pos:]
    if head is None:
        if n:
            raise CodecError(f"dod decodes 0 values, expected {n}")
        return np.empty(0, np.int64)
    total_bits = 0 if len(body) == 0 else (len(body) - 1) * 8 + int(last_used)
    if n == 1:
        return np.full(1, head, dtype=np.int64)
    bits = np.unpackbits(body)[:max(total_bits, 0)].astype(np.int64)
    if total_bits == 0:
        raise CodecError(f"dod decodes 1 value, expected {n}")
    # step table: prefix class determined by up to 5 leading bits
    pad = np.concatenate([bits, np.zeros(5, np.int64)])
    b0, b1, b2, b3, b4 = (pad[k:k + total_bits] for k in range(5))
    step = np.select(
        [b0 == 0, b1 == 0, b2 == 0, b3 == 0, b4 == 0],
        [1, 9, 12, 16, 26],
        default=69,
    )
    pos = np.arange(total_bits, dtype=np.int64)
    starts = orbit(pos + step, 0, n - 1)
    if len(starts) != n - 1:
        raise CodecError(f"dod decodes {len(starts) + 1} values, expected {n}")
    end = starts[-1] + step[starts[-1]]
    if end > total_bits:
        raise CodecError("truncated DoD payload")
    dod = np.zeros(n - 1, dtype=np.int64)
    scls = np.select(
        [b0[starts] == 0, b1[starts] == 0, b2[starts] == 0, b3[starts] == 0, b4[starts] == 0],
        [0, 1, 2, 3, 4], default=5)
    ubits = np.asarray(np.concatenate([bits, np.zeros(5, np.int64)]), dtype=np.uint64)
    for ci, (plen, pbits, bias) in enumerate(
            [(2, 7, 63), (3, 9, 255), (4, 12, 2047), (5, 21, _DOD_MAX - 1), (5, 64, 0)], start=1):
        idx = np.flatnonzero(scls == ci)
        if len(idx) == 0:
            continue
        s = starts[idx] + plen
        val = np.zeros(len(idx), dtype=np.uint64)
        for j in range(pbits):
            val = (val << np.uint64(1)) | ubits[s + j]
        if pbits == 64:
            dod[idx] = val.view(np.int64)
        else:
            dod[idx] = val.view(np.int64) - bias
    with np.errstate(over="ignore"):
        deltas = np.cumsum(dod)
        out = np.empty(n, dtype=np.int64)
        out[0] = head
        out[1:] = head + np.cumsum(deltas)
    return out


# ---------------------------------------------------------------------------
# Codec classes
# ---------------------------------------------------------------------------

class RleCodec(Codec):
    """AnyRle (reference strategy 'Rle'), byte-identical wire format."""

    name = "rle"
    domains = (INT, STR, BIN, BOOL, F64, F32)

    def encode(self, arr: pa.Array) -> bytes:
        from .core import domain_of
        dom = domain_of(arr.type)
        if dom == INT:
            return rle_encode_int64(to_int64(arr))
        if dom in (STR, BIN):
            return rle_encode_binary(arr)
        if dom == BOOL:
            return rle_encode_int64(to_int64(arr.cast(pa.int64())))
        return rle_encode_float(arr.to_numpy(zero_copy_only=False))

    def decode(self, payload: bytes, n: int, typ: pa.DataType) -> pa.Array:
        from .core import domain_of
        dom = domain_of(typ)
        if dom == INT:
            return from_int64(rle_decode_int64(payload, n), typ)
        if dom in (STR, BIN):
            data, offsets = rle_decode_binary(payload, n)
            return from_str_buffers(data, offsets, typ)
        if dom == BOOL:
            return pa.array(rle_decode_int64(payload, n).astype(bool))
        dtype = np.float64 if dom == F64 else np.float32
        return pa.array(rle_decode_float(payload, n, dtype))

    def decode_prefix(self, payload: bytes, n: int, typ: pa.DataType,
                      k: int) -> pa.Array:
        from .core import domain_of
        if k >= n:
            return self.decode(payload, n, typ)
        dom = domain_of(typ)
        if dom == INT:  # take_n: parse headers, expand only k values
            return from_int64(rle_decode_int64(payload, n, k), typ)
        if dom == BOOL:
            return pa.array(rle_decode_int64(payload, n, k).astype(bool))
        return self.decode(payload, n, typ).slice(0, k)


class BoolRleCodec(Codec):
    name = "bool_rle"
    domains = (BOOL,)

    def encode(self, arr: pa.Array) -> bytes:
        return bool_rle_encode(arr.to_numpy(zero_copy_only=False))

    def decode(self, payload: bytes, n: int, typ: pa.DataType) -> pa.Array:
        return pa.array(bool_rle_decode(payload, n))


class DeltaRleCodec(Codec):
    name = "delta_rle"
    domains = (INT,)

    def encode(self, arr: pa.Array) -> bytes:
        return delta_rle_encode_int64(to_int64(arr))

    def decode(self, payload: bytes, n: int, typ: pa.DataType) -> pa.Array:
        return from_int64(delta_rle_decode_int64(payload, n), typ)

    def decode_prefix(self, payload: bytes, n: int, typ: pa.DataType,
                      k: int) -> pa.Array:
        if k >= n:
            return self.decode(payload, n, typ)
        return from_int64(delta_rle_decode_int64(payload, n, k), typ)


class DeltaOfDeltaCodec(Codec):
    name = "dod"
    domains = (INT,)

    def encode(self, arr: pa.Array) -> bytes:
        return dod_encode_int64(to_int64(arr))

    def decode(self, payload: bytes, n: int, typ: pa.DataType) -> pa.Array:
        return from_int64(dod_decode_int64(payload, n), typ)


register(RleCodec())
register(BoolRleCodec())
register(DeltaRleCodec())
register(DeltaOfDeltaCodec())
