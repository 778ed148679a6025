"""Composite container codecs: struct, map and wide-decimal columns.

The reference encodes map containers (columnar/src/wrap.rs:83-135,
columnar_derive/src/derive/map.rs:7-369) and recursive nested rows
(columnar/tests/integration/attribute.rs:555-594). The Spark-native
equivalents decompose a container column into ordinary sub-columns and run
each through the full codec selector recursively, exactly like
codecs.nested does for list children:

* struct<...>      -> one sub-column per field (by name, with per-field
                      validity streams), so a struct<lang:string, n:int>
                      gets dict/RLE per field like top-level columns;
* map<k,v>         -> delta-RLE'd offsets + keys child + values child
                      (the reference's map = keys vec + values vec view);
* decimal128(p>18) -> two int64 limb columns (lo, hi); the hi limb is a
                      constant 0/-1 run for values that fit 64 bits, so it
                      RLE-collapses to a few bytes (the reference round-
                      trips u64::MAX through i128 arithmetic the same way,
                      fuzz/tests/test.rs:74).

Child payload framing (shared):
  1 flag byte: bit0 = child has nulls
  [if nulls] varint len + bool_rle validity over the child's rows
  varint len(codec name) + codec name utf8
  varint len(payload) + payload
"""

from __future__ import annotations

from typing import Tuple

import numpy as np
import pyarrow as pa

from .core import Codec, DEC128, MAP, STRUCT, U64, register
from .nputil import CodecError, uvarint_encode
from .rle_family import (bool_rle_decode, bool_rle_encode,
                         delta_rle_decode_int64, delta_rle_encode_int64)
from .. import refmodel as rm


def encode_child(arr: pa.Array) -> bytes:
    """Encode a (possibly nullable) child column with the full selector."""
    from ..engine.selector import select_encode

    out = bytearray()
    if arr.null_count:
        validity = bool_rle_encode(
            arr.is_valid().to_numpy(zero_copy_only=False))
        out.append(1)
        out += uvarint_encode(np.array([len(validity)], dtype=np.uint64))
        out += validity
        arr = arr.drop_null()
    else:
        out.append(0)
    choice = select_encode(arr)
    name_b = choice.codec.encode("utf-8")
    out += uvarint_encode(np.array([len(name_b)], dtype=np.uint64))
    out += name_b
    out += uvarint_encode(np.array([len(choice.payload)], dtype=np.uint64))
    out += choice.payload
    return bytes(out)


def skip_child(r: "rm.Reader") -> None:
    """Advance the cursor past one framed child without decoding it."""
    flags = r.take(1)[0]
    if flags & 1:
        r.take(r.read_uvarint())
    r.take(r.read_uvarint())  # codec name
    r.take(r.read_uvarint())  # payload


def decode_child(r: "rm.Reader", n: int, typ: pa.DataType) -> pa.Array:
    """Inverse of encode_child: reads one framed child from the cursor."""
    from ..codecs import get_codec

    flags = r.take(1)[0]
    vmask = None
    n_valid = n
    if flags & 1:
        vlen = r.read_uvarint()
        vmask = bool_rle_decode(bytes(r.take(vlen)), n)
        n_valid = int(vmask.sum())
    clen = r.read_uvarint()
    codec_name = bytes(r.take(clen)).decode("utf-8")
    plen = r.read_uvarint()
    payload = bytes(r.take(plen))
    vals = get_codec(codec_name).decode(payload, n_valid, typ)
    if vmask is not None:
        from .core import reassemble_nulls

        vals = reassemble_nulls(vals, vmask, n, typ)
    return vals


class StructCodec(Codec):
    """struct column -> per-field sub-columns, each through the selector.

    Decode is indexed-optional compatible like the table level
    (engine/decode.py): payload fields missing from the target type are
    ignored, target fields missing from the payload decode as nulls.
    """

    name = "struct"
    domains = (STRUCT,)

    def encode(self, arr: pa.Array) -> bytes:
        arr = arr.combine_chunks() if isinstance(arr, pa.ChunkedArray) else arr
        n = len(arr)
        typ = arr.type
        out = bytearray()
        out += uvarint_encode(np.array([n, typ.num_fields], dtype=np.uint64))
        for i in range(typ.num_fields):
            name_b = typ.field(i).name.encode("utf-8")
            out += uvarint_encode(np.array([len(name_b)], dtype=np.uint64))
            out += name_b
            out += encode_child(arr.field(i))
        return bytes(out)

    def decode(self, payload: bytes, n: int, typ: pa.DataType) -> pa.Array:
        r = rm.Reader(bytes(payload))
        n_rows = r.read_uvarint()
        if n_rows != n:
            raise CodecError(f"struct payload has {n_rows} rows, expected {n}")
        nf = r.read_uvarint()
        want = {typ.field(i).name: typ.field(i).type
                for i in range(typ.num_fields)}
        got = {}
        for _ in range(nf):
            nlen = r.read_uvarint()
            name = bytes(r.take(nlen)).decode("utf-8")
            if name in want:
                got[name] = decode_child(r, n, want[name])
            else:  # unknown field: skip its frame (compat=ignore)
                skip_child(r)
        children = []
        for i in range(typ.num_fields):
            f = typ.field(i)
            children.append(got.get(f.name, pa.nulls(n, f.type)))
        if not children:
            return pa.array([{}] * n, type=typ)
        return pa.StructArray.from_arrays(
            children, fields=[typ.field(i) for i in range(typ.num_fields)])


def _map_parts(arr: pa.Array) -> Tuple[np.ndarray, pa.Array, pa.Array]:
    offsets = np.frombuffer(arr.buffers()[1], dtype=np.int32,
                            count=arr.offset + len(arr) + 1)[arr.offset:]
    lo, hi = int(offsets[0]), int(offsets[-1])
    keys = arr.keys.slice(lo, hi - lo)
    items = arr.items.slice(lo, hi - lo)
    return (offsets - lo).astype(np.int64), keys, items


class MapCodec(Codec):
    """map column -> delta-RLE offsets + keys child + values child."""

    name = "map"
    domains = (MAP,)

    def encode(self, arr: pa.Array) -> bytes:
        arr = arr.combine_chunks() if isinstance(arr, pa.ChunkedArray) else arr
        offsets, keys, items = _map_parts(arr)
        out = bytearray()
        out += uvarint_encode(np.array([len(arr)], dtype=np.uint64))
        off_payload = delta_rle_encode_int64(offsets[1:])
        out += uvarint_encode(np.array([len(off_payload)], dtype=np.uint64))
        out += off_payload
        out += encode_child(keys)
        out += encode_child(items)
        return bytes(out)

    def decode(self, payload: bytes, n: int, typ: pa.DataType) -> pa.Array:
        r = rm.Reader(bytes(payload))
        n_rows = r.read_uvarint()
        if n_rows != n:
            raise CodecError(f"map payload has {n_rows} rows, expected {n}")
        olen = r.read_uvarint()
        offsets = np.zeros(n + 1, dtype=np.int64)
        if n:
            offsets[1:] = delta_rle_decode_int64(bytes(r.take(olen)), n)
        n_child = int(offsets[-1])
        keys = decode_child(r, n_child, typ.key_type)
        items = decode_child(r, n_child, typ.item_type)
        out = pa.MapArray.from_arrays(
            pa.array(offsets, pa.int32()), keys, items)
        return out.cast(typ)


class Dec128Codec(Codec):
    """decimal128(p>18) -> (lo, hi) int64 limb columns through the
    selector; hi is a sign-extension run for small magnitudes."""

    name = "dec128"
    domains = (DEC128,)

    def encode(self, arr: pa.Array) -> bytes:
        arr = arr.combine_chunks() if isinstance(arr, pa.ChunkedArray) else arr
        raw = np.frombuffer(arr.buffers()[1], dtype=np.int64)
        pairs = raw[2 * arr.offset: 2 * (arr.offset + len(arr))]
        lo = pairs[0::2].copy()  # low limb, reinterpreted signed (lossless)
        hi = pairs[1::2].copy()
        out = bytearray()
        out += uvarint_encode(np.array([len(arr)], dtype=np.uint64))
        out += encode_child(pa.array(lo, pa.int64()))
        out += encode_child(pa.array(hi, pa.int64()))
        return bytes(out)

    def decode(self, payload: bytes, n: int, typ: pa.DataType) -> pa.Array:
        r = rm.Reader(bytes(payload))
        n_rows = r.read_uvarint()
        if n_rows != n:
            raise CodecError(f"dec128 payload has {n_rows} rows, expected {n}")
        lo = decode_child(r, n, pa.int64()).to_numpy(zero_copy_only=False)
        hi = decode_child(r, n, pa.int64()).to_numpy(zero_copy_only=False)
        pairs = np.empty((n, 2), dtype=np.int64)
        pairs[:, 0] = lo
        pairs[:, 1] = hi
        return pa.Array.from_buffers(
            typ, n, [None, pa.py_buffer(pairs.tobytes())])


class U64Codec(Codec):
    """uint64 -> int64 bit reinterpretation through the int selector
    (zigzag/delta wraparound is lossless on the bit pattern), matching the
    reference's u64::MAX round-trip (fuzz/tests/test.rs:74)."""

    name = "u64"
    domains = (U64,)

    def encode(self, arr: pa.Array) -> bytes:
        arr = arr.combine_chunks() if isinstance(arr, pa.ChunkedArray) else arr
        vals = arr.to_numpy(zero_copy_only=False).view(np.int64)
        out = bytearray()
        out += uvarint_encode(np.array([len(arr)], dtype=np.uint64))
        out += encode_child(pa.array(vals, pa.int64()))
        return bytes(out)

    def decode(self, payload: bytes, n: int, typ: pa.DataType) -> pa.Array:
        r = rm.Reader(bytes(payload))
        n_rows = r.read_uvarint()
        if n_rows != n:
            raise CodecError(f"u64 payload has {n_rows} rows, expected {n}")
        vals = decode_child(r, n, pa.int64()).to_numpy(zero_copy_only=False)
        return pa.array(vals.view(np.uint64), type=pa.uint64())


register(StructCodec())
register(MapCodec())
register(Dec128Codec())
register(U64Codec())
