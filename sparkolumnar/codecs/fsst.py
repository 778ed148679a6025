"""FSST string compression (north-rule extension).

Design follows the published algorithm (Boncz, Neumann, Leis: "FSST: Fast
Random Access String Compression", VLDB 2020): a table of up to 255 symbols
of 1..8 bytes; each input position emits either a 1-byte symbol code or an
escape (0xFF + literal byte). The symbol table is built on a sample by
iterative greedy pair-merging; encoding uses longest-match.

This implementation is written for whole-batch numpy execution:

* symbol lengths snap to {1,2,4,8}; longest-match is computed for every
  byte position with at most 4 vectorized passes, longest first — direct
  256/65536-entry lookup tables for L=1/2 and single-probe multiply-shift
  hash tables for L=4/8 — each shorter pass running only on the positions
  still unmatched;
* the inherently sequential "next token starts after this one ends" chain
  exploits string independence: one frontier pointer per string advances in
  lock-step (nputil.chain_segments), one vectorized gather per round, total
  work ~ token count;
* decode classifies escape markers via parity inside 0xFF-runs (split at
  string boundaries) and assembles output with one vectorized gather.

Wire format:
  varint n_symbols, then per symbol (1 byte len, bytes)
  varint n_strings, n_strings varints of *encoded* lengths
  encoded bytes

Matches never cross string boundaries, so any chunking/parallel split at
string boundaries is safe.
"""

from __future__ import annotations

from collections import Counter
from typing import List, Optional, Tuple

import numpy as np
import pyarrow as pa

from .core import BIN, STR, Codec, from_str_buffers, register, str_buffers
from .nputil import (CodecError, chain_segments, gather_chunks,
                     uvarint_decode, uvarint_encode)

ESCAPE = 255
MAX_SYMBOLS = 255
MAX_LEN = 8
SAMPLE_BYTES = 1 << 15  # 32 KiB sample for table construction
# Encode in string-aligned chunks sized so the chunk plus its rolling-key
# temporaries stay cache-resident: measured 2.3x higher aggregate
# throughput at 16 concurrent workers vs 8 MiB chunks (this is what makes
# many-core scaling near-linear — the match passes stop fighting for DRAM).
CHUNK_BYTES = 1 << 20


# ---------------------------------------------------------------------------
# symbol table
# ---------------------------------------------------------------------------

LENGTHS = (8, 4, 2, 1)  # symbol lengths, longest-first (power-of-two snap)
_HASH_BITS = 13
_HASH_MULT = np.uint64(0x9E3779B97F4A7C15)


class _SymTables:
    """Match tables: direct-index for L=1/2, single-probe hash for L=4/8."""

    def __init__(self, symbols: List[bytes]):
        self.tab1 = np.full(256, -1, dtype=np.int16)
        self.tab2 = np.full(65536, -1, dtype=np.int16)
        self.hash4 = self._build_hash([s for s in symbols], 4)
        self.hash8 = self._build_hash([s for s in symbols], 8)
        self.has = {1: False, 2: False, 4: self.hash4 is not None,
                    8: self.hash8 is not None}
        for c, s in enumerate(symbols):
            if len(s) == 1:
                self.tab1[s[0]] = c
                self.has[1] = True
            elif len(s) == 2:
                self.tab2[(s[0] << 8) | s[1]] = c
                self.has[2] = True

    def _build_hash(self, symbols, L):
        entries = [(int.from_bytes(s, "big"), c)
                   for c, s in enumerate(symbols) if len(s) == L]
        if not entries:
            return None
        size = 1 << _HASH_BITS
        keys = np.zeros(size, dtype=np.uint64)
        codes = np.full(size, -1, dtype=np.int16)
        mult = _HASH_MULT
        for attempt in range(8):
            keys[:] = 0
            codes[:] = -1
            ok = True
            for k, c in entries:
                slot = ((k * int(mult)) & ((1 << 64) - 1)) >> (64 - _HASH_BITS)
                if codes[slot] != -1:
                    ok = False
                    break
                keys[slot] = k
                codes[slot] = c
            if ok:
                return keys, codes, mult
            mult = np.uint64((int(mult) * 0xC2B2AE3D27D4EB4F + 2 * attempt + 1)
                             & ((1 << 64) - 1)) | np.uint64(1)
        # fall back to dropping colliding symbols (keeps correctness)
        keys[:] = 0
        codes[:] = -1
        for k, c in entries:
            slot = ((k * int(_HASH_MULT)) & ((1 << 64) - 1)) >> (64 - _HASH_BITS)
            if codes[slot] == -1:
                keys[slot] = k
                codes[slot] = c
        return keys, codes, _HASH_MULT


def _match_all(data: np.ndarray, max_allowed: np.ndarray, tables: _SymTables):
    """Longest symbol match at every position (lengths 8,4,2,1 only).

    Returns (match_len int64 >=1, match_code int64, code -1 = escape)."""
    n = len(data)
    match_len = np.ones(n, dtype=np.int64)
    match_code = np.full(n, -1, dtype=np.int64)
    if n == 0:
        return match_len, match_code
    # rolling keys, built once
    k2 = k4 = k8 = None
    if tables.has[2] or tables.has[4] or tables.has[8]:
        k2 = (data[:-1].astype(np.uint16) << 8) | data[1:] if n >= 2 else np.empty(0, np.uint16)
    if tables.has[4] or tables.has[8]:
        k4 = ((k2[:-2].astype(np.uint32) << 16) | k2[2:]) if n >= 4 else np.empty(0, np.uint32)
    if tables.has[8]:
        k8 = ((k4[:-4].astype(np.uint64) << np.uint64(32)) | k4[4:]) if n >= 8 else np.empty(0, np.uint64)
    unmatched = None  # bool mask over all n positions; None = all unmatched
    idx = None        # compressed unmatched indices once sparse enough
    for L in LENGTHS:
        if not tables.has[L]:
            continue
        m = n - L + 1
        if m <= 0:
            continue
        if idx is not None:
            # sparse path: gather only at still-unmatched positions
            sub = idx[idx < m]
            if len(sub) == 0:
                continue
            if L == 1:
                code = tables.tab1[data[sub]]
                hit = code >= 0
            elif L == 2:
                code = tables.tab2[k2[sub]]
                hit = code >= 0
            else:
                keys, codes, mult = tables.hash4 if L == 4 else tables.hash8
                key = k4[sub].astype(np.uint64) if L == 4 else k8[sub]
                with np.errstate(over="ignore"):
                    slot = ((key * mult) >> np.uint64(64 - _HASH_BITS)).astype(np.int64)
                code = codes[slot]
                hit = (code >= 0) & (keys[slot] == key)
            hit &= max_allowed[sub] >= L
            hidx = sub[hit]
            match_len[hidx] = L
            match_code[hidx] = code[hit]
            if L > 1:
                idx = np.concatenate([sub[~hit], idx[idx >= m]])
                idx.sort()
            continue
        if L == 1:
            code = tables.tab1[data[:m]]
            ok = code >= 0
        elif L == 2:
            code = tables.tab2[k2[:m]]
            ok = code >= 0
        else:
            keys, codes, mult = tables.hash4 if L == 4 else tables.hash8
            key = k4[:m].astype(np.uint64) if L == 4 else k8[:m]
            with np.errstate(over="ignore"):
                slot = ((key * mult) >> np.uint64(64 - _HASH_BITS)).astype(np.int64)
            code = codes[slot]
            ok = (code >= 0) & (keys[slot] == key)
        ok &= max_allowed[:m] >= L
        sel = ok if unmatched is None else (ok & unmatched[:m])
        match_len[:m][sel] = L
        match_code[:m][sel] = code[sel]
        if L > 1:  # last pass needs no bookkeeping
            if unmatched is None:
                unmatched = np.ones(n, dtype=bool)
            unmatched[:m] &= ~ok
            # switch to the sparse path once most positions are matched
            remaining = int(unmatched.sum())
            if remaining < n // 3:
                idx = np.flatnonzero(unmatched)
                unmatched = None
    return match_len, match_code


def _tokenize(data: np.ndarray, offsets: np.ndarray,
              tables: "_SymTables") -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Token start positions, lengths and codes for the whole buffer."""
    n = len(data)
    if n == 0:
        return (np.empty(0, np.int64),) * 3
    str_lens = np.diff(offsets)
    ends = np.repeat(offsets[1:], str_lens)
    max_allowed = ends - np.arange(n, dtype=np.int64)
    match_len, match_code = _match_all(data, max_allowed, tables)
    # strings are independent chains (matches never cross a boundary), so
    # walk one frontier pointer per string in lock-step instead of one
    # global pointer-doubling orbit
    starts = chain_segments(np.arange(n, dtype=np.int64) + match_len,
                            offsets[:-1], offsets[1:])
    return starts, match_len[starts], match_code[starts]


def build_table(data: np.ndarray, offsets: np.ndarray, rounds: int = 3,
                sample_bytes: Optional[int] = None) -> List[bytes]:
    """Greedy iterative pair-merge symbol table construction on a sample.

    Defaults are tuned for per-batch builds; job-level plans pass a larger
    sample and more rounds (engine/plan.py) since they build once."""
    if len(data) == 0:
        return []
    sample_bytes = sample_bytes or SAMPLE_BYTES
    # sample: prefix of the buffer, aligned to a string boundary
    if len(data) > sample_bytes:
        cut = int(np.searchsorted(offsets, sample_bytes))
        cut = max(1, min(cut, len(offsets) - 1))
        s_off = offsets[:cut + 1].astype(np.int64)
        s_data = data[: int(s_off[-1])]
    else:
        s_off = offsets
        s_data = data
    sbytes = s_data.tobytes()
    symbols: List[bytes] = []
    for _ in range(rounds):
        starts, lens, codes = _tokenize(s_data, s_off, _SymTables(symbols))
        if len(starts) == 0:
            break
        gains: Counter = Counter()
        tok = [sbytes[int(s): int(s) + int(l)] for s, l in zip(starts, lens)]
        # which string each token belongs to (pairs must not cross)
        sid = np.searchsorted(s_off, starts, side="right")
        snap = (0, 1, 2, 2, 4, 4, 4, 4, 8)  # snap to power-of-two lengths
        for i, t in enumerate(tok):
            gains[t] += len(t)
            if i + 1 < len(tok) and sid[i] == sid[i + 1]:
                cat = t + tok[i + 1]
                cat = cat[: snap[min(len(cat), MAX_LEN)]]
                if len(cat) > len(t):
                    gains[cat] += len(cat)
        # gains[s] = occurrences * len(s); require >= 2 occurrences
        ranked = sorted(gains.items(), key=lambda kv: (-kv[1], kv[0]))
        symbols = [s for s, g in ranked[:MAX_SYMBOLS]
                   if len(s) <= MAX_LEN and g >= 2 * len(s)]
    return symbols


# ---------------------------------------------------------------------------
# encode / decode
# ---------------------------------------------------------------------------

def fsst_encode(data: np.ndarray, offsets: np.ndarray,
                symbols: Optional[List[bytes]] = None) -> bytes:
    """Encode; `symbols` lets a job-level plan supply a pre-built table
    (built once from a sample, broadcast to every batch) — the per-batch
    table build is the expensive part of FSST."""
    n_strings = len(offsets) - 1
    if symbols is None:
        symbols = build_table(data, offsets)
    tables = _SymTables(symbols)
    head = bytearray()
    head += uvarint_encode(np.array([len(symbols)], dtype=np.uint64))
    for s in symbols:
        head.append(len(s))
        head += s
    enc_parts: List[np.ndarray] = []
    part_lens: List[np.ndarray] = []  # encoded length per string
    start_str = 0
    total = len(data)
    while start_str < n_strings or (n_strings == 0 and start_str == 0):
        if n_strings == 0:
            break
        # chunk of whole strings totalling <= CHUNK_BYTES (at least 1 string)
        limit = offsets[start_str] + CHUNK_BYTES
        end_str = int(np.searchsorted(offsets, limit, side="left"))
        end_str = max(start_str + 1, min(end_str, n_strings))
        lo, hi = int(offsets[start_str]), int(offsets[end_str])
        c_off = offsets[start_str:end_str + 1].astype(np.int64) - lo
        c_data = data[lo:hi]
        starts, lens, codes = _tokenize(c_data, c_off, tables)
        is_code = codes >= 0
        out_len = np.where(is_code, 1, 2)
        out_pos = np.cumsum(out_len) - out_len
        out = np.empty(int(out_len.sum()), dtype=np.uint8)
        cp = out_pos[is_code]
        out[cp] = codes[is_code]
        ep = out_pos[~is_code]
        out[ep] = ESCAPE
        out[ep + 1] = c_data[starts[~is_code]]
        # encoded length per string: tokens per string via boundaries
        tok_out_end = np.concatenate([[0], np.cumsum(out_len)])
        ntok_before = np.searchsorted(starts, c_off[1:], side="left")
        enc_end = tok_out_end[ntok_before]
        enc_lens = np.diff(np.concatenate([[0], enc_end]))
        enc_parts.append(out)
        part_lens.append(enc_lens.astype(np.uint64))
        start_str = end_str
    all_lens = (np.concatenate(part_lens) if part_lens
                else np.empty(0, np.uint64))
    body = b"".join(p.tobytes() for p in enc_parts)
    head += uvarint_encode(np.array([n_strings], dtype=np.uint64))
    head += uvarint_encode(all_lens)
    return bytes(head) + body


def fsst_decode(payload: bytes, n: int) -> Tuple[np.ndarray, np.ndarray]:
    buf = np.frombuffer(payload, dtype=np.uint8)
    cnt, used = uvarint_decode(buf, 1)
    n_sym = int(cnt[0])
    pos = used
    sym_lens = np.empty(n_sym, dtype=np.int64)
    sym_starts = np.empty(n_sym, dtype=np.int64)
    for i in range(n_sym):  # n_sym <= 255, trivial
        L = int(buf[pos])
        if not (1 <= L <= MAX_LEN):
            raise CodecError("bad fsst symbol length")
        sym_lens[i] = L
        sym_starts[i] = pos + 1
        pos += 1 + L
    ns, used2 = uvarint_decode(buf[pos:], 1)
    if int(ns[0]) != n:
        raise CodecError(f"fsst has {ns[0]} strings, expected {n}")
    pos += used2
    enc_lens, used3 = uvarint_decode(buf[pos:], n)
    enc_lens = enc_lens.astype(np.int64)
    pos += used3
    E = buf[pos:]
    if int(enc_lens.sum()) != len(E):
        raise CodecError("fsst encoded size mismatch")
    ne = len(E)
    if ne == 0:
        return np.empty(0, np.uint8), np.concatenate([[0], np.zeros(n, np.int64)]).astype(np.int64)
    enc_off = np.concatenate([[0], np.cumsum(enc_lens)]).astype(np.int64)
    # decode in string-aligned ~CHUNK_BYTES chunks (cache-resident working
    # set; same reason as the encoder's chunking)
    data_parts = []
    len_parts = []
    s = 0
    while s < n:
        e = int(np.searchsorted(enc_off, enc_off[s] + CHUNK_BYTES, "left"))
        e = max(s + 1, min(e, n))
        d, ls = _decode_chunk(buf, pos, enc_off[s:e + 1], n_sym,
                              sym_lens, sym_starts)
        data_parts.append(d)
        len_parts.append(ls)
        s = e
    data = np.concatenate(data_parts) if data_parts else np.empty(0, np.uint8)
    str_out_lens = (np.concatenate(len_parts) if len_parts
                    else np.empty(0, np.int64))
    offsets = np.empty(n + 1, dtype=np.int64)
    offsets[0] = 0
    np.cumsum(str_out_lens, out=offsets[1:])
    return data, offsets


def _decode_chunk(buf: np.ndarray, e_base: int, enc_off: np.ndarray,
                  n_sym: int, sym_lens: np.ndarray, sym_starts: np.ndarray):
    """Decode the strings whose encoded bytes span
    buf[e_base+enc_off[0] : e_base+enc_off[-1]]; returns (out_bytes,
    out_len_per_string)."""
    lo = int(enc_off[0])
    E = buf[e_base + lo: e_base + int(enc_off[-1])]
    ne = len(E)
    if ne == 0:
        return np.empty(0, np.uint8), np.zeros(len(enc_off) - 1, np.int64)
    rel_off = enc_off - lo
    # escape-marker classification: runs of 0xFF split at string starts;
    # within each run the 1st, 3rd, ... byte is a marker
    is_ff = E == ESCAPE
    is_start = np.zeros(ne, dtype=bool)
    starts_in = rel_off[:-1][np.diff(enc_off) > 0]
    is_start[starts_in] = True
    neq = (is_ff[1:] != is_ff[:-1]) | is_start[1:]
    run_starts = np.concatenate([[0], np.flatnonzero(neq) + 1])
    run_id = np.cumsum(np.concatenate([[True], neq])) - 1
    off_in_run = np.arange(ne, dtype=np.int64) - run_starts[run_id]
    is_marker = is_ff & (off_in_run % 2 == 0)
    is_literal = np.zeros(ne, dtype=bool)
    is_literal[1:] = is_marker[:-1]
    is_codebyte = ~is_marker & ~is_literal
    if np.any(E[is_codebyte] >= n_sym):
        raise CodecError("fsst code byte out of range")
    out_len = np.zeros(ne, dtype=np.int64)
    out_len[is_literal] = 1
    out_len[is_codebyte] = sym_lens[E[is_codebyte]]
    cum = np.concatenate([[0], np.cumsum(out_len)])
    str_out_lens = cum[rel_off[1:]] - cum[rel_off[:-1]]
    # assemble: pieces in byte order; sources: symbol area (within buf) for
    # codes, E itself for literals
    p_idx = np.flatnonzero(out_len > 0)
    p_lens = out_len[p_idx]
    p_starts = np.empty(len(p_idx), dtype=np.int64)
    lit = is_literal[p_idx]
    p_starts[lit] = e_base + lo + p_idx[lit]  # literal byte inside E
    cb = ~lit
    p_starts[cb] = sym_starts[E[p_idx[cb]]]
    return gather_chunks(buf, p_starts, p_lens), str_out_lens


class FsstCodec(Codec):
    name = "fsst"
    domains = (STR, BIN)

    def encode(self, arr: pa.Array, symbols: Optional[List[bytes]] = None) -> bytes:
        data, offsets = str_buffers(arr)
        return fsst_encode(data, offsets, symbols=symbols)

    def decode(self, payload: bytes, n: int, typ: pa.DataType) -> pa.Array:
        data, offsets = fsst_decode(payload, n)
        return from_str_buffers(data, offsets, typ)


register(FsstCodec())
