"""Bit-packing and frame-of-reference codecs (north-rule extensions).

pack_uint/unpack_uint: fixed-width big-endian bit fields via numpy
packbits/unpackbits — the shared primitive for FOR, dict codes and
anything else that needs dense small integers.

Codecs:
  bitpack      — fields relative to 0 (requires min >= 0)
  for_bitpack  — frame-of-reference: subtract the block min, then bit-pack

Format: varint n, zigzag-varint frame (bitpack: frame always 0, omitted),
1 byte width, packed bits. width == 0 means a constant column.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .. import refmodel as rm
from .core import INT, Codec, from_int64, register, to_int64
from .nputil import CodecError, uvarint_decode, uvarint_encode


def pack_uint(vals: np.ndarray, width: int = -1) -> bytes:
    """Pack uint64 values as `width`-bit big-endian fields (width inferred
    from the max when -1). Leads with a varint count + 1 width byte."""
    vals = np.ascontiguousarray(vals, dtype=np.uint64)
    n = len(vals)
    if width < 0:
        width = int(vals.max()).bit_length() if n else 0
    head = uvarint_encode(np.array([n], dtype=np.uint64)) + bytes([width])
    if width == 0 or n == 0:
        return head
    shifts = (np.uint64(width) - np.uint64(1) - np.arange(width, dtype=np.uint64))
    bits = ((vals[:, None] >> shifts[None, :]) & np.uint64(1)).astype(np.uint8)
    return head + np.packbits(bits.ravel()).tobytes()


def unpack_uint(payload: bytes, n_expected: int = -1) -> np.ndarray:
    buf = np.frombuffer(payload, dtype=np.uint8)
    cnt, used = uvarint_decode(buf, 1)
    n = int(cnt[0])
    if n_expected >= 0 and n != n_expected:
        raise CodecError(f"bitpack count {n} != expected {n_expected}")
    width = int(buf[used])
    if width > 64:
        raise CodecError("bitpack width > 64")
    body = buf[used + 1:]
    if width == 0 or n == 0:
        return np.zeros(n, dtype=np.uint64)
    if len(body) * 8 < n * width:
        raise CodecError("bitpack payload too short")
    bits = np.unpackbits(body)[: n * width].reshape(n, width).astype(np.uint64)
    shifts = (np.uint64(width) - np.uint64(1) - np.arange(width, dtype=np.uint64))
    return (bits << shifts[None, :]).sum(axis=1, dtype=np.uint64)


class ForBitpackCodec(Codec):
    """Frame-of-reference + bit-pack for integers/timestamps."""

    name = "for_bitpack"
    domains = (INT,)

    def encode(self, arr: pa.Array) -> bytes:
        vals = to_int64(arr)
        if len(vals) == 0:
            return rm.svarint_bytes(0) + pack_uint(np.empty(0, np.uint64))
        frame = int(vals.min())
        # range (max-min) may exceed i64; uint64 wraparound arithmetic is exact
        with np.errstate(over="ignore"):
            rel = vals.view(np.uint64) - np.uint64(frame & ((1 << 64) - 1))
        return rm.svarint_bytes(frame) + pack_uint(rel)

    def decode(self, payload: bytes, n: int, typ: pa.DataType) -> pa.Array:
        r = rm.Reader(bytes(payload))
        frame = r.read_svarint()
        rel = unpack_uint(payload[r.pos:], n)
        with np.errstate(over="ignore"):
            vals = (rel + np.uint64(frame & ((1 << 64) - 1))).view(np.int64)
        return from_int64(vals, typ)


class BitpackCodec(Codec):
    """Pure bit-packing (frame fixed at 0); only valid when min >= 0."""

    name = "bitpack"
    domains = (INT,)

    def encode(self, arr: pa.Array) -> bytes:
        vals = to_int64(arr)
        if len(vals) and int(vals.min()) < 0:
            raise CodecError("bitpack requires non-negative values")
        return pack_uint(vals.view(np.uint64))

    def decode(self, payload: bytes, n: int, typ: pa.DataType) -> pa.Array:
        return from_int64(unpack_uint(payload, n).view(np.int64), typ)


register(ForBitpackCodec())
register(BitpackCodec())
