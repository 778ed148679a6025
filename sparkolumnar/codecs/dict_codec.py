"""Dictionary codec (north-rule extension; standard Parquet/Arrow-style).

Format (self-describing together with block metadata):
  varint n_dict
  dict values in split layout: n_dict length-varints, then all value bytes
  1 byte code sub-codec tag: 0 = bitpacked codes, 1 = rle(int) codes
  codes payload

Dictionary order is order of first appearance (pyarrow dictionary_encode),
so encoding is deterministic. Codes are 0..n_dict-1; bit-packed width =
ceil(log2(n_dict)) or RLE when runs dominate — whichever is smaller.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .core import (BIN, STR, Codec, from_str_buffers, register, str_buffers)
from .nputil import CodecError, uvarint_decode, uvarint_encode
from .rle_family import rle_decode_int64, rle_encode_int64
from .bitpack import pack_uint, unpack_uint


class DictCodec(Codec):
    name = "dict"
    domains = (STR, BIN)

    def encode(self, arr: pa.Array) -> bytes:
        denc = pc.dictionary_encode(arr)
        if isinstance(denc, pa.ChunkedArray):
            denc = denc.combine_chunks()
        dictionary = denc.dictionary
        codes = denc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        data, offsets = str_buffers(dictionary)
        lens = np.diff(offsets)
        out = bytearray()
        out += uvarint_encode(np.array([len(dictionary)], dtype=np.uint64))
        out += uvarint_encode(lens.astype(np.uint64))
        out += data.tobytes()
        bp = pack_uint(codes.astype(np.uint64))
        rl = rle_encode_int64(codes)
        if len(bp) <= len(rl):
            out += b"\x00" + bp
        else:
            out += b"\x01" + rl
        return bytes(out)

    def decode(self, payload: bytes, n: int, typ: pa.DataType) -> pa.Array:
        buf = np.frombuffer(payload, dtype=np.uint8)
        cnt, used = uvarint_decode(buf, 1)
        n_dict = int(cnt[0])
        lens, used2 = uvarint_decode(buf[used:], n_dict)
        lens = lens.astype(np.int64)
        pos = used + used2
        dsize = int(lens.sum())
        data = buf[pos:pos + dsize]
        pos += dsize
        tag = int(buf[pos])
        pos += 1
        body = payload[pos:]
        if tag == 0:
            codes = unpack_uint(body, n).astype(np.int64)
        elif tag == 1:
            codes = rle_decode_int64(body, n)
        else:
            raise CodecError(f"unknown dict code sub-codec {tag}")
        if n and (codes.min() < 0 or codes.max() >= n_dict):
            raise CodecError("dict code out of range")
        offsets = np.empty(n_dict + 1, dtype=np.int64)
        offsets[0] = 0
        np.cumsum(lens, out=offsets[1:])
        dictionary = from_str_buffers(data, offsets, typ)
        return pc.take(dictionary, pa.array(codes))


register(DictCodec())
