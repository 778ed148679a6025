"""Plain codec — the reference's GenericColumn wire format (postcard seq of
raw values, columnar/src/column/mod.rs:85-125): varint count then values
(ints zigzag varint, strings/binary varint len + payload, floats fixed LE,
bool one byte). Always a selector candidate so the engine can never lose to
the reference on a batch.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .core import (BIN, BOOL, F32, F64, INT, STR, Codec, domain_of,
                   from_int64, from_str_buffers, register, str_buffers,
                   to_int64)
from .nputil import (CodecError, gather_chunks, interleave_sorted,
                     uvarint_decode, uvarint_encode, uvarint_size,
                     zigzag_decode, zigzag_encode)


def plain_encode_int64(vals: np.ndarray) -> bytes:
    vals = np.ascontiguousarray(vals, dtype=np.int64)
    head = uvarint_encode(np.array([len(vals)], dtype=np.uint64))
    return head + uvarint_encode(zigzag_encode(vals))


def plain_decode_int64(payload: bytes, n: int) -> np.ndarray:
    buf = np.frombuffer(payload, dtype=np.uint8)
    cnt, used = uvarint_decode(buf, 1)
    if int(cnt[0]) != n:
        raise CodecError(f"plain payload has {cnt[0]} values, expected {n}")
    vals, used2 = uvarint_decode(buf[used:], n)
    if used + used2 != len(buf):
        raise CodecError("trailing bytes in plain int payload")
    return zigzag_decode(vals).astype(np.int64, copy=False)


def plain_encode_binary(arr: pa.Array) -> bytes:
    data, offsets = str_buffers(arr)
    lens = np.diff(offsets)
    head = uvarint_encode(np.array([len(arr)], dtype=np.uint64))
    pre = uvarint_encode(lens.astype(np.uint64))
    pre_arr = np.frombuffer(pre, dtype=np.uint8)
    pre_sizes = uvarint_size(lens.astype(np.uint64))
    # value slices cover data contiguously in order -> mask interleave
    body = interleave_sorted(pre_arr, pre_sizes, data, offsets[:-1], lens)
    return head + body.tobytes()


def plain_decode_binary(payload: bytes, n: int):
    buf = np.frombuffer(payload, dtype=np.uint8)
    cnt, used = uvarint_decode(buf, 1)
    if int(cnt[0]) != n:
        raise CodecError(f"plain payload has {cnt[0]} values, expected {n}")
    pos = used
    # lengths and payloads interleave, so this scan is sequential; the
    # selector never picks this codec for strings (SplitCodec below is the
    # same size and fully vectorized) — this path exists for wire-format
    # parity with the reference's GenericColumn only.
    starts = np.empty(n, dtype=np.int64)
    lens = np.empty(n, dtype=np.int64)
    is_term = (buf & 0x80) == 0
    b7 = (buf & 0x7F).astype(np.int64)
    p = pos
    for i in range(n):
        # scalar varint read (lengths are tiny; loop is n iterations of a
        # few array reads — acceptable; plain binary decode is dominated by
        # the final gather)
        v = 0
        shift = 0
        while True:
            v |= b7[p] << shift
            term = is_term[p]
            p += 1
            if term:
                break
            shift += 7
        starts[i] = p
        lens[i] = v
        p += v
    if p != len(buf):
        raise CodecError("trailing bytes in plain binary payload")
    data = gather_chunks(buf, starts, lens)
    offsets = np.empty(n + 1, dtype=np.int64)
    offsets[0] = 0
    np.cumsum(lens, out=offsets[1:])
    return data, offsets


def plain_encode_fixed(vals: np.ndarray) -> bytes:
    head = uvarint_encode(np.array([len(vals)], dtype=np.uint64))
    le = vals.astype(vals.dtype.newbyteorder("<"), copy=False)
    return head + le.tobytes()


def plain_decode_fixed(payload: bytes, n: int, dtype) -> np.ndarray:
    buf = np.frombuffer(payload, dtype=np.uint8)
    cnt, used = uvarint_decode(buf, 1)
    if int(cnt[0]) != n:
        raise CodecError(f"plain payload has {cnt[0]} values, expected {n}")
    width = np.dtype(dtype).itemsize
    if len(buf) - used != n * width:
        raise CodecError("plain fixed payload size mismatch")
    return buf[used:].view(np.dtype(dtype).newbyteorder("<")).astype(dtype, copy=False)


class PlainCodec(Codec):
    name = "plain"
    domains = (INT, STR, BIN, BOOL, F64, F32)

    def encode(self, arr: pa.Array) -> bytes:
        dom = domain_of(arr.type)
        if dom == INT:
            return plain_encode_int64(to_int64(arr))
        if dom in (STR, BIN):
            return plain_encode_binary(arr)
        if dom == BOOL:
            vals = arr.to_numpy(zero_copy_only=False).astype(np.uint8)
            head = uvarint_encode(np.array([len(vals)], dtype=np.uint64))
            return head + vals.tobytes()
        return plain_encode_fixed(arr.to_numpy(zero_copy_only=False))

    def decode(self, payload: bytes, n: int, typ: pa.DataType) -> pa.Array:
        dom = domain_of(typ)
        if dom == INT:
            return from_int64(plain_decode_int64(payload, n), typ)
        if dom in (STR, BIN):
            data, offsets = plain_decode_binary(payload, n)
            return from_str_buffers(data, offsets, typ)
        if dom == BOOL:
            buf = np.frombuffer(payload, dtype=np.uint8)
            cnt, used = uvarint_decode(buf, 1)
            if int(cnt[0]) != n:
                raise CodecError("plain bool count mismatch")
            return pa.array(buf[used:used + n].astype(bool))
        dtype = np.float64 if dom == F64 else np.float32
        return pa.array(plain_decode_fixed(payload, n, dtype))


def split_size(arr: pa.Array) -> int:
    """Exact encoded size of SplitCodec.encode(arr) WITHOUT encoding (the
    format is varint count + all length varints + raw data, so the size is
    pure arithmetic). Lets the selector keep split fully priced for the
    <=-reference guarantee while only paying for the encode when split
    actually wins."""
    data, offsets = str_buffers(arr)
    lens = np.diff(offsets).astype(np.uint64)
    n_b = int(uvarint_size(np.array([len(arr)], dtype=np.uint64))[0])
    return n_b + int(uvarint_size(lens).sum()) + len(data)


class SplitCodec(Codec):
    """Column-split variant of plain for strings/binary: varint count, then
    ALL length varints, then all payload bytes. Exactly the same byte count
    as the reference's GenericColumn (same varints, reordered) but decode is
    a single vectorized varint pass + one buffer slice — no per-value work.
    This is what the selector actually uses for incompressible strings.
    """

    name = "split"
    domains = (STR, BIN)

    def encode(self, arr: pa.Array) -> bytes:
        data, offsets = str_buffers(arr)
        lens = np.diff(offsets)
        head = uvarint_encode(np.array([len(arr)], dtype=np.uint64))
        return head + uvarint_encode(lens.astype(np.uint64)) + data.tobytes()

    def decode(self, payload: bytes, n: int, typ: pa.DataType) -> pa.Array:
        buf = np.frombuffer(payload, dtype=np.uint8)
        cnt, used = uvarint_decode(buf, 1)
        if int(cnt[0]) != n:
            raise CodecError(f"split payload has {cnt[0]} values, expected {n}")
        lens, used2 = uvarint_decode(buf[used:], n)
        lens = lens.astype(np.int64)
        data = buf[used + used2:]
        if int(lens.sum()) != len(data):
            raise CodecError("split payload data size mismatch")
        offsets = np.empty(n + 1, dtype=np.int64)
        offsets[0] = 0
        np.cumsum(lens, out=offsets[1:])
        return from_str_buffers(data, offsets, typ)

    def decode_prefix(self, payload: bytes, n: int, typ: pa.DataType,
                      k: int) -> pa.Array:
        """First k strings only: the length varints are all read (tiny),
        but only the first k strings' DATA bytes are touched — bytes past
        the prefix may even be absent (truncated payload)."""
        if k >= n:
            return self.decode(payload, n, typ)
        buf = np.frombuffer(payload, dtype=np.uint8)
        cnt, used = uvarint_decode(buf, 1)
        if int(cnt[0]) != n:
            raise CodecError(f"split payload has {cnt[0]} values, expected {n}")
        lens, used2 = uvarint_decode(buf[used:], n)
        lens = lens[:k].astype(np.int64)
        need = int(lens.sum())
        data = buf[used + used2: used + used2 + need]
        if len(data) < need:
            raise CodecError("split payload shorter than requested prefix")
        offsets = np.empty(k + 1, dtype=np.int64)
        offsets[0] = 0
        np.cumsum(lens, out=offsets[1:])
        return from_str_buffers(data, offsets, typ)

    def decode_range(self, payload: bytes, n: int, typ: pa.DataType,
                     start: int, stop: int) -> pa.Array:
        """Random access: length varints index the data area directly."""
        stop = min(stop, n)
        start = max(0, min(start, stop))
        buf = np.frombuffer(payload, dtype=np.uint8)
        cnt, used = uvarint_decode(buf, 1)
        if int(cnt[0]) != n:
            raise CodecError(f"split payload has {cnt[0]} values, expected {n}")
        all_lens, used2 = uvarint_decode(buf[used:], n)
        head = int(all_lens[:start].sum())
        lens = all_lens[start:stop].astype(np.int64)
        need = int(lens.sum())
        lo = used + used2 + head
        data = buf[lo: lo + need]
        if len(data) < need:
            raise CodecError("split payload shorter than requested range")
        offsets = np.empty(stop - start + 1, dtype=np.int64)
        offsets[0] = 0
        np.cumsum(lens, out=offsets[1:])
        return from_str_buffers(data, offsets, typ)


register(PlainCodec())
register(SplitCodec())
