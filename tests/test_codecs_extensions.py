"""Round-trip + compression tests for the north-rule extension codecs
(dict, bitpack, frame-of-reference, FSST)."""

import numpy as np
import pyarrow as pa
import pytest
from hypothesis import given, settings, strategies as st

from sparkolumnar.codecs import get_codec
from sparkolumnar.codecs.bitpack import pack_uint, unpack_uint
from sparkolumnar.codecs import fsst as fs

I64 = st.integers(min_value=-(2**63), max_value=2**63 - 1)


@given(st.lists(st.integers(0, 2**64 - 1), max_size=150),
       st.integers(-1, 64))
@settings(max_examples=150, deadline=None)
def test_pack_uint_roundtrip(xs, width):
    vals = np.array(xs, dtype=np.uint64)
    need = int(vals.max()).bit_length() if len(xs) else 0
    w = width if width >= need else -1
    payload = pack_uint(vals, w)
    out = unpack_uint(payload, len(xs))
    assert out.tolist() == xs


@given(st.lists(I64, max_size=150))
@settings(max_examples=150, deadline=None)
def test_for_bitpack_roundtrip(xs):
    arr = pa.array(xs, type=pa.int64())
    c = get_codec("for_bitpack")
    out = c.decode(c.encode(arr), len(xs), pa.int64())
    assert out.to_pylist() == xs


def test_for_bitpack_compresses_narrow_range():
    vals = pa.array((1_000_000 + np.arange(10000) % 7).tolist(), type=pa.int64())
    c = get_codec("for_bitpack")
    payload = c.encode(vals)
    assert len(payload) < 10000 * 3 / 8 + 16  # 3 bits/value
    assert c.decode(payload, 10000, pa.int64()) == vals


@given(st.lists(st.sampled_from(["en", "de", "fr", "zh", "pt-BR", ""]), max_size=200))
@settings(max_examples=100, deadline=None)
def test_dict_roundtrip(xs):
    arr = pa.array(xs, type=pa.string())
    c = get_codec("dict")
    out = c.decode(c.encode(arr), len(xs), pa.string())
    assert out.to_pylist() == xs


def test_dict_compresses_low_cardinality():
    rng = np.random.default_rng(3)
    vals = [["en", "de", "fr"][i] for i in rng.integers(0, 3, 50000)]
    arr = pa.array(vals, type=pa.string())
    c = get_codec("dict")
    payload = c.encode(arr)
    assert len(payload) < 50000 * 2 / 8 + 64  # 2-bit codes
    assert c.decode(payload, 50000, pa.string()).to_pylist() == vals


@given(st.lists(st.binary(max_size=40), max_size=120))
@settings(max_examples=150, deadline=None)
def test_fsst_roundtrip_binary(xs):
    arr = pa.array(xs, type=pa.binary())
    c = get_codec("fsst")
    out = c.decode(c.encode(arr), len(xs), pa.binary())
    assert out.to_pylist() == xs


@given(st.lists(st.text(max_size=60), max_size=100))
@settings(max_examples=100, deadline=None)
def test_fsst_roundtrip_text(xs):
    arr = pa.array(xs, type=pa.string())
    c = get_codec("fsst")
    out = c.decode(c.encode(arr), len(xs), pa.string())
    assert out.to_pylist() == xs


def test_fsst_escape_heavy():
    # strings full of 0xFF bytes (escape marker collisions)
    xs = [b"\xff" * k for k in range(10)] + [b"a\xff" * 5, b"\xff\xffa" * 3]
    arr = pa.array(xs, type=pa.binary())
    c = get_codec("fsst")
    assert c.decode(c.encode(arr), len(xs), pa.binary()).to_pylist() == xs


def test_fsst_compresses_web_text():
    rng = np.random.default_rng(11)
    vocab = ["the", "quick", "brown", "fox", "jumps", "over", "lazy", "dog",
             "https://", "example.com", "content", "page", "search"]
    docs = [" ".join(vocab[i] for i in rng.zipf(1.5, 40) % len(vocab))
            for _ in range(2000)]
    arr = pa.array(docs, type=pa.string())
    raw = sum(len(d.encode()) for d in docs)
    c = get_codec("fsst")
    payload = c.encode(arr)
    assert c.decode(payload, len(docs), pa.string()).to_pylist() == docs
    assert len(payload) < 0.6 * raw  # must beat plain by a wide margin on text


@given(st.lists(st.floats(allow_nan=False), max_size=150))
@settings(max_examples=150, deadline=None)
def test_byteplane_roundtrip(xs):
    arr = pa.array(xs, type=pa.float64())
    c = get_codec("byteplane")
    out = c.decode(c.encode(arr), len(xs), pa.float64())
    assert out.to_pylist() == xs


def test_byteplane_compresses_uniform_doubles():
    rng = np.random.default_rng(6)
    vals = rng.random(20000)  # uniform [0,1): exponent planes low-entropy
    arr = pa.array(vals, type=pa.float64())
    c = get_codec("byteplane")
    p = c.encode(arr)
    assert len(p) < 0.9 * 8 * len(vals)  # beats plain by >10%
    out = c.decode(p, len(vals), pa.float64())
    assert np.array_equal(out.to_numpy(zero_copy_only=False), vals)


def test_byteplane_f32():
    vals = (np.arange(5000) % 100).astype(np.float32) / 7
    arr = pa.array(vals, type=pa.float32())
    c = get_codec("byteplane")
    p = c.encode(arr)
    out = c.decode(p, len(vals), pa.float32())
    assert np.array_equal(out.to_numpy(zero_copy_only=False), vals)


@given(st.lists(st.one_of(st.none(),
                          st.lists(st.one_of(st.none(), I64), max_size=6)),
                max_size=40))
@settings(max_examples=100, deadline=None)
def test_nested_list_fuzz(xs):
    """Nested codec round-trips arbitrary list<int64> with nulls at both
    levels (top-level nulls handled by the engine; codec sees null-free
    lists with possibly-null children)."""
    arr = pa.array([x for x in xs if x is not None],
                   type=pa.list_(pa.int64()))
    c = get_codec("nested")
    out = c.decode(c.encode(arr), len(arr), arr.type)
    assert out.to_pylist() == arr.to_pylist()


def test_fsst_adversarial_shapes():
    """Edge shapes through the FULL fsst path: all-escape bytes, empty
    strings, single giant string crossing the chunk limit, 1-byte strings,
    and a string of repeated escapes."""
    import numpy as np

    from sparkolumnar.codecs import fsst as fsst_mod

    c = get_codec("fsst")
    cases = [
        pa.array(["\xff" * 3, "", "\xff\xff\xff\xff"] * 40),
        pa.array([""] * 100),
        pa.array(["x"] * 5000),
        pa.array(["ab" * (1 << 19)]),  # one string > CHUNK_BYTES
        pa.array(["q"] + ["the quick brown fox"] * 300 + [""]),
        pa.array([chr(i % 256) for i in range(1, 512)]),
    ]
    for arr in cases:
        arr = arr.cast(pa.string()) if arr.type == pa.string() else arr
        p = c.encode(arr)
        out = c.decode(p, len(arr), arr.type)
        assert out.to_pylist() == arr.to_pylist()
        k = max(1, len(arr) // 2)
        pre = c.decode_prefix(p, len(arr), arr.type, k)
        assert pre.to_pylist() == arr.slice(0, k).to_pylist()


def test_fsst_binary_random_bytes():
    import numpy as np

    rng = np.random.default_rng(123)
    vals = [rng.integers(0, 256, rng.integers(0, 300)).astype("u1").tobytes()
            for _ in range(400)]
    arr = pa.array(vals, type=pa.binary())
    c = get_codec("fsst")
    p = c.encode(arr)
    assert c.decode(p, len(arr), arr.type).to_pylist() == vals


def test_split_size_is_byte_exact():
    from hypothesis import given, settings, strategies as st

    from sparkolumnar.codecs.plain import split_size

    @settings(max_examples=60, deadline=None)
    @given(st.lists(st.binary(max_size=300), max_size=60))
    def check(vals):
        arr = pa.array(vals, type=pa.binary())
        assert split_size(arr) == len(get_codec("split").encode(arr))

    check()
