"""Byte-plane codec for floats (extension; the reference has no float
strategy beyond Generic, so this can only improve on parity).

A float64 column is transposed into 8 byte planes (plane 7 = MSB: sign +
exponent high bits). Similar-magnitude values share exponent bytes, so the
high planes are long runs; each plane independently picks AnyRle or raw,
recorded in a header bitmap. Decode reassembles planes with one transpose.

Format:
  varint n
  1 byte width (4 or 8)
  width bits (1 byte per plane): 1 = rle plane, 0 = raw plane
  per plane, MSB first: varint payload length + payload
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .core import F32, F64, Codec, register
from .nputil import CodecError, uvarint_encode
from .rle_family import rle_decode_int64, rle_encode_int64
from .. import refmodel as rm


def byteplane_encode(vals: np.ndarray) -> bytes:
    width = vals.dtype.itemsize
    n = len(vals)
    le = np.ascontiguousarray(vals, dtype=vals.dtype.newbyteorder("<"))
    planes = le.view(np.uint8).reshape(n, width) if n else np.empty((0, width), np.uint8)
    out = bytearray()
    out += uvarint_encode(np.array([n], dtype=np.uint64))
    out.append(width)
    flags = bytearray(width)
    payloads = []
    for p in range(width - 1, -1, -1):  # MSB first
        plane = np.ascontiguousarray(planes[:, p]).astype(np.int64)
        rle = rle_encode_int64(plane)
        if len(rle) < n:
            flags[width - 1 - p] = 1
            payloads.append(rle)
        else:
            payloads.append(np.ascontiguousarray(planes[:, p]).tobytes())
    out += flags
    for pl in payloads:
        out += uvarint_encode(np.array([len(pl)], dtype=np.uint64))
        out += pl
    return bytes(out)


def byteplane_decode(payload: bytes, n: int, dtype) -> np.ndarray:
    r = rm.Reader(bytes(payload))
    cnt = r.read_uvarint()
    if cnt != n:
        raise CodecError(f"byteplane has {cnt} values, expected {n}")
    width = r.take(1)[0]
    if width != np.dtype(dtype).itemsize:
        raise CodecError("byteplane width mismatch")
    flags = r.take(width)
    planes = np.empty((n, width), dtype=np.uint8)
    for i, p in enumerate(range(width - 1, -1, -1)):
        ln = r.read_uvarint()
        body = r.take(ln)
        if flags[i]:
            planes[:, p] = rle_decode_int64(bytes(body), n).astype(np.uint8)
        else:
            if ln != n:
                raise CodecError("byteplane raw plane size mismatch")
            planes[:, p] = np.frombuffer(body, dtype=np.uint8)
    flat = planes.reshape(-1).view(np.dtype(dtype).newbyteorder("<"))
    return flat.astype(dtype, copy=False)


class BytePlaneCodec(Codec):
    name = "byteplane"
    domains = (F64, F32)

    def encode(self, arr: pa.Array) -> bytes:
        return byteplane_encode(arr.to_numpy(zero_copy_only=False))

    def decode(self, payload: bytes, n: int, typ: pa.DataType) -> pa.Array:
        dtype = np.float64 if typ == pa.float64() else np.float32
        return pa.array(byteplane_decode(payload, n, dtype))


register(BytePlaneCodec())
