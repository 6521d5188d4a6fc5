"""Gorilla XOR float codec + delta-of-delta timestamp codec (numpy).

Implements the two compression schemes from the Gorilla paper (Pelkonen et
al., "Gorilla: A Fast, Scalable, In-Memory Time Series Database", VLDB 2015)
as pure-numpy encode/decode over whole arrays, wrapped in Arrow-vectorized
Spark UDFs (`spark_codecs.py`). No per-row Python in the encode path: field
computation (XOR, leading/trailing zero counts, bucket selection) is fully
vectorized, and bit-packing runs in O(max_bits) vectorized passes instead of
O(n) Python iterations.

Encoding variant notes (documented deviations, both within the Gorilla
format family and bit-exactly round-trippable):
- float XOR: a non-zero XOR emits either the '10' reuse-previous-window
  control (when the previous (leading-zeros, sig-bits) window still covers
  the XOR — worth ~2% of ratio, measured in BENCH/BASELINE.md) or '11'
  with a fresh window, matching the paper's two-control scheme; the
  reuse decision is vectorized like every other field computation.
- delta-of-delta buckets: '0' (dod=0), '10'+7b, '110'+9b, '1110'+12b,
  '1111'+64b (the paper's 32-bit top bucket widened to 64 so arbitrary
  int64 timestamps round-trip).

Round-trip is bit-exact for every float64 payload (NaN, ±0, subnormals —
only bit ops touch the values) — property-tested in tests/test_codecs.py.
"""

from __future__ import annotations

import numpy as np

CODEC_VERSION = 1


# ---------------------------------------------------------------------------
# bit-level helpers (vectorized)
# ---------------------------------------------------------------------------

def _msb_pos(x: np.ndarray) -> np.ndarray:
    """Position of the most significant set bit (0..63) for x > 0, vectorized."""
    n = np.zeros(x.shape, dtype=np.int64)
    y = x.copy()
    for shift in (32, 16, 8, 4, 2, 1):
        high = (y >> np.uint64(shift)) != 0
        n = np.where(high, n + shift, n)
        y = np.where(high, y >> np.uint64(shift), y)
    return n


def _clz64(x: np.ndarray) -> np.ndarray:
    return 63 - _msb_pos(x)


def _ctz64(x: np.ndarray) -> np.ndarray:
    lowbit = x & (~x + np.uint64(1))
    return _msb_pos(lowbit)


def _pack_bits(codes: np.ndarray, nbits: np.ndarray) -> bytes:
    """MSB-first concatenation of the low `nbits[i]` bits of codes[i].

    Vectorized flat: one `repeat` expands each code over its own bit
    positions, a ramp built from cumsum gives every output bit its shift,
    then a single shift+mask and `packbits` finish — ~4 full-length array
    ops total, no per-bit-position passes (the previous per-bit scatter
    loop was 64 passes and ~6× slower on day-sized segments)."""
    codes = codes.astype(np.uint64)
    nbits = nbits.astype(np.int64)
    total = int(nbits.sum())
    if total == 0:
        return b""
    ends = np.cumsum(nbits)
    # per output bit: which value it comes from, and its MSB-first shift =
    # (end_of_value - 1 - global_bit_index)
    value_id = np.repeat(np.arange(len(codes)), nbits)
    shift = (np.repeat(ends, nbits) - 1 - np.arange(total)).astype(np.uint64)
    buf = ((codes[value_id] >> shift) & np.uint64(1)).astype(np.uint8)
    return np.packbits(buf).tobytes()


class _BitReader:
    """Sequential bit reader for decode (decode is inherently sequential —
    field lengths depend on previously read control bits). Each read slices
    ≤ 10 raw bytes and masks — O(1), no per-bit Python loop."""

    __slots__ = ("buf", "pos")

    def __init__(self, payload: bytes):
        self.buf = payload
        self.pos = 0

    def read(self, n: int) -> int:
        pos = self.pos
        self.pos = pos + n
        start = pos >> 3
        end = (pos + n + 7) >> 3
        window = int.from_bytes(self.buf[start:end], "big")
        shift = (end - start) * 8 - (pos - start * 8) - n
        return (window >> shift) & ((1 << n) - 1)


# ---------------------------------------------------------------------------
# Gorilla XOR float64 codec
# ---------------------------------------------------------------------------

def gorilla_encode(values: np.ndarray) -> bytes:
    """Encode float64 array → Gorilla XOR bitstream. Empty array → b''."""
    v = np.ascontiguousarray(values, dtype=np.float64)
    n = len(v)
    if n == 0:
        return b""
    bits = v.view(np.uint64)
    if n == 1:
        return _pack_bits(bits[:1], np.array([64]))

    xors = bits[1:] ^ bits[:-1]
    zero = xors == 0
    nz = ~zero
    # window for each non-zero xor: lz capped at 31 (5-bit field), sig 1..64
    lz = np.minimum(_clz64(np.where(nz, xors, np.uint64(1))), 31)
    tz = _ctz64(np.where(nz, xors, np.uint64(1)))
    sig = 64 - lz - tz
    meaningful = xors >> tz.astype(np.uint64)

    counts = np.where(zero, 1, 2)
    slots = np.concatenate(([0], np.cumsum(counts)[:-1])) + 1  # slot 0 = header
    total = int(counts.sum()) + 1
    codes = np.zeros(total, dtype=np.uint64)
    nbits = np.zeros(total, dtype=np.int64)
    codes[0], nbits[0] = bits[0], 64
    # zero-xor: single '0' bit
    codes[slots[zero]], nbits[slots[zero]] = 0, 1
    # '10' reuse-window control: emitted when a non-zero xor's window EQUALS
    # the previous non-zero xor's window. Sound without a sequential scan:
    # along an equality chain the decoder's active window after entry i-1 is
    # w_{i-1} whether i-1 wrote '11' or '10' (induction), so "equal to the
    # consecutive predecessor" ⟺ "equal to the active window" — one
    # vectorized compare+mask, saving 11 header bits per repeat.
    lz_nz, sig_nz = lz[nz], sig[nz]
    reuse = np.zeros(len(lz_nz), dtype=bool)
    if len(lz_nz) > 1:
        reuse[1:] = (lz_nz[1:] == lz_nz[:-1]) & (sig_nz[1:] == sig_nz[:-1])
    # non-reuse: '11' + 5-bit lz + 6-bit (sig-1); reuse: bare '10'
    new_header = (
        (np.uint64(0b11) << np.uint64(11))
        | (lz_nz.astype(np.uint64) << np.uint64(6))
        | (sig_nz - 1).astype(np.uint64)
    )
    codes[slots[nz]] = np.where(reuse, np.uint64(0b10), new_header)
    nbits[slots[nz]] = np.where(reuse, 2, 13)
    codes[slots[nz] + 1], nbits[slots[nz] + 1] = meaningful[nz], sig_nz
    return _pack_bits(codes, nbits)


def gorilla_decode(payload: bytes, n: int) -> np.ndarray:
    """Decode n float64 values from a Gorilla XOR bitstream."""
    if n == 0:
        return np.empty(0, dtype=np.float64)
    r = _BitReader(payload)
    out = np.empty(n, dtype=np.uint64)
    out[0] = r.read(64)
    prev = int(out[0])
    lz = sig = 0
    for i in range(1, n):
        if r.read(1) == 0:
            out[i] = prev
            continue
        if r.read(1) == 1:  # '11' new window ('10' = reuse previous window)
            lz = r.read(5)
            sig = r.read(6) + 1
        tz = 64 - lz - sig
        xor = r.read(sig) << tz
        prev ^= xor
        out[i] = prev
    return out.view(np.float64)


# ---------------------------------------------------------------------------
# delta-of-delta int64 timestamp codec
# ---------------------------------------------------------------------------

_DOD_BUCKETS = (  # (control, control_bits, payload_bits, offset)
    (0b10, 2, 7, 63),
    (0b110, 3, 9, 255),
    (0b1110, 4, 12, 2047),
)


def dod_encode(ts: np.ndarray) -> bytes:
    """Encode int64 array (e.g. epoch seconds) → delta-of-delta bitstream."""
    t = np.ascontiguousarray(ts, dtype=np.int64)
    n = len(t)
    if n == 0:
        return b""
    if n == 1:
        return _pack_bits(t.astype(np.uint64), np.array([64]))
    d = np.diff(t)
    header_codes = np.array([t[0], d[0]], dtype=np.int64).astype(np.uint64)
    header_bits = np.array([64, 64])
    if n == 2:
        return _pack_bits(header_codes, header_bits)

    dod = d[1:] - d[:-1]
    m = len(dod)
    zero = dod == 0
    b1 = ~zero & (dod >= -63) & (dod <= 64)
    b2 = ~zero & ~b1 & (dod >= -255) & (dod <= 256)
    b3 = ~zero & ~b1 & ~b2 & (dod >= -2047) & (dod <= 2048)
    b4 = ~zero & ~b1 & ~b2 & ~b3

    counts = np.where(b4, 2, 1)
    slots = np.concatenate(([0], np.cumsum(counts)[:-1])) + 2  # 2 header slots
    total = int(counts.sum()) + 2
    codes = np.zeros(total, dtype=np.uint64)
    nbits = np.zeros(total, dtype=np.int64)
    codes[:2], nbits[:2] = header_codes, header_bits
    codes[slots[zero]], nbits[slots[zero]] = 0, 1
    for mask, (ctl, cbits, pbits, off) in zip((b1, b2, b3), _DOD_BUCKETS):
        val = (dod[mask] + off).astype(np.uint64)
        codes[slots[mask]] = (np.uint64(ctl) << np.uint64(pbits)) | val
        nbits[slots[mask]] = cbits + pbits
    # '1111' + full 64-bit two's complement
    codes[slots[b4]], nbits[slots[b4]] = 0b1111, 4
    codes[slots[b4] + 1], nbits[slots[b4] + 1] = dod[b4].astype(np.uint64), 64
    return _pack_bits(codes, nbits)


def _wrap64(x: int) -> int:
    """Two's-complement wrap to int64 (mirrors numpy's int64 arithmetic)."""
    return (x + (1 << 63)) % (1 << 64) - (1 << 63)


def dod_decode(payload: bytes, n: int) -> np.ndarray:
    """Decode n int64 values from a delta-of-delta bitstream."""
    if n == 0:
        return np.empty(0, dtype=np.int64)
    r = _BitReader(payload)
    out = np.empty(n, dtype=np.int64)
    out[0] = _wrap64(r.read(64))
    if n == 1:
        return out
    delta = _wrap64(r.read(64))
    out[1] = _wrap64(int(out[0]) + delta)
    for i in range(2, n):
        if r.read(1) == 0:
            dod = 0
        elif r.read(1) == 0:
            dod = r.read(7) - 63
        elif r.read(1) == 0:
            dod = r.read(9) - 255
        elif r.read(1) == 0:
            dod = r.read(12) - 2047
        else:
            dod = _wrap64(r.read(64))
        delta = _wrap64(delta + dod)
        out[i] = _wrap64(int(out[i - 1]) + delta)
    return out


# ---------------------------------------------------------------------------
# v2 "split-stream" layout: same Gorilla XOR / delta-of-delta field
# semantics, but control metadata and payload bits live in separate
# vectorizable streams instead of being interleaved bit-by-bit. The
# interleaved v1 decoder is inherently sequential (each entry's length
# depends on its own control bits); v2 moves every length into byte-wide
# side arrays so DECODE is also whole-array numpy:
#
#   gorilla v2: [first:8B][zero-xor bitmap][lz:u8 ×m][sig-1:u8 ×m]
#               [meaningful bits, MSB-first]
#   dod v2:     [t0:8B][d0:8B][zero-dod bitmap][cat:u8 ×k]
#               [bucket-encoded dod bits, MSB-first]
#
# Value reconstruction is a cumulative XOR (np.bitwise_xor.accumulate) /
# double cumsum — no per-point Python anywhere. Chunk rows carry
# codec_version, so v1 and v2 chunks coexist in one table and the reader
# dispatches per row.
# ---------------------------------------------------------------------------

CODEC_VERSION_V2 = 2

_DOD_CATS = (  # cat id → (payload_bits, offset); cat 4 = raw 64-bit
    (7, 63),
    (9, 255),
    (12, 2047),
)


def _unpack_bits(payload: bytes, nbits: np.ndarray, bit_offset: int = 0) -> np.ndarray:
    """Inverse of `_pack_bits`: read len(nbits) MSB-first fields starting at
    `bit_offset` in payload. Vectorized via unpackbits + weighted reduceat."""
    nbits = nbits.astype(np.int64)
    if len(nbits) == 0:
        return np.empty(0, dtype=np.uint64)
    total = int(nbits.sum())
    bits = np.unpackbits(
        np.frombuffer(payload, dtype=np.uint8), count=bit_offset + total
    )[bit_offset:].astype(np.uint64)
    ends = np.cumsum(nbits)
    offs = ends - nbits
    weights = np.uint64(1) << (np.repeat(ends, nbits) - 1 - np.arange(total)).astype(
        np.uint64
    )
    return np.add.reduceat(bits * weights, offs)


def gorilla_encode_v2(values: np.ndarray) -> bytes:
    v = np.ascontiguousarray(values, dtype=np.float64)
    n = len(v)
    if n == 0:
        return b""
    bits = v.view(np.uint64)
    head = bits[:1].byteswap().tobytes()  # big-endian first value
    if n == 1:
        return head
    xors = bits[1:] ^ bits[:-1]
    zero = xors == 0
    nz = ~zero
    lz = np.minimum(_clz64(np.where(nz, xors, np.uint64(1))), 31)
    tz = _ctz64(np.where(nz, xors, np.uint64(1)))
    sig = 64 - lz - tz
    meaningful = (xors >> tz.astype(np.uint64))[nz]
    return b"".join(
        (
            head,
            np.packbits(zero.astype(np.uint8)).tobytes(),
            lz[nz].astype(np.uint8).tobytes(),
            (sig[nz] - 1).astype(np.uint8).tobytes(),
            _pack_bits(meaningful, sig[nz]),
        )
    )


def gorilla_decode_v2(payload: bytes, n: int) -> np.ndarray:
    if n == 0:
        return np.empty(0, dtype=np.float64)
    first = np.frombuffer(payload[:8], dtype=">u8")[0]
    if n == 1:
        return np.array([first], dtype=np.uint64).view(np.float64)
    pos = 8
    nbytes_map = (n - 1 + 7) // 8
    zero = np.unpackbits(
        np.frombuffer(payload[pos : pos + nbytes_map], dtype=np.uint8), count=n - 1
    ).astype(bool)
    pos += nbytes_map
    m = int((~zero).sum())
    lz = np.frombuffer(payload[pos : pos + m], dtype=np.uint8).astype(np.uint64)
    pos += m
    sig = np.frombuffer(payload[pos : pos + m], dtype=np.uint8).astype(np.int64) + 1
    pos += m
    meaningful = _unpack_bits(payload[pos:], sig)
    tz = (64 - lz - sig.astype(np.uint64)).astype(np.uint64)
    xors = np.zeros(n - 1, dtype=np.uint64)
    xors[~zero] = meaningful << tz
    out = np.empty(n, dtype=np.uint64)
    out[0] = first
    out[1:] = xors
    return np.bitwise_xor.accumulate(out).view(np.float64)


def dod_encode_v2(ts: np.ndarray) -> bytes:
    t = np.ascontiguousarray(ts, dtype=np.int64)
    n = len(t)
    if n == 0:
        return b""
    head = t[:1].astype(">i8").tobytes()
    if n == 1:
        return head
    d = np.diff(t)
    head += d[:1].astype(">i8").tobytes()
    if n == 2:
        return head
    dod = d[1:] - d[:-1]
    zero = dod == 0
    nzv = dod[~zero]
    cat = np.full(len(nzv), 4, dtype=np.uint8)
    pbits = np.full(len(nzv), 64, dtype=np.int64)
    enc = nzv.astype(np.uint64)
    for ci, (pb, off) in enumerate(_DOD_CATS, start=1):
        lo, hi = -off, off + 1
        m = (cat == 4) & (nzv >= lo) & (nzv <= hi)
        cat[m] = ci
        pbits[m] = pb
        enc[m] = (nzv[m] + off).astype(np.uint64)
    return b"".join(
        (
            head,
            np.packbits(zero.astype(np.uint8)).tobytes(),
            cat.tobytes(),
            _pack_bits(enc, pbits),
        )
    )


def dod_decode_v2(payload: bytes, n: int) -> np.ndarray:
    if n == 0:
        return np.empty(0, dtype=np.int64)
    t0 = int(np.frombuffer(payload[:8], dtype=">i8")[0])
    if n == 1:
        return np.array([t0], dtype=np.int64)
    d0 = int(np.frombuffer(payload[8:16], dtype=">i8")[0])
    if n == 2:
        return np.array([t0, t0 + d0], dtype=np.int64)
    pos = 16
    m = n - 2
    nbytes_map = (m + 7) // 8
    zero = np.unpackbits(
        np.frombuffer(payload[pos : pos + nbytes_map], dtype=np.uint8), count=m
    ).astype(bool)
    pos += nbytes_map
    k = int((~zero).sum())
    cat = np.frombuffer(payload[pos : pos + k], dtype=np.uint8)
    pos += k
    pbits = np.full(k, 64, dtype=np.int64)
    for ci, (pb, _off) in enumerate(_DOD_CATS, start=1):
        pbits[cat == ci] = pb
    raw = _unpack_bits(payload[pos:], pbits)
    nzv = raw.astype(np.int64)
    for ci, (_pb, off) in enumerate(_DOD_CATS, start=1):
        sel = cat == ci
        nzv[sel] = raw[sel].astype(np.int64) - off
    dod = np.zeros(m, dtype=np.int64)
    dod[~zero] = nzv
    deltas = np.empty(n - 1, dtype=np.int64)
    deltas[0] = d0
    deltas[1:] = dod
    np.cumsum(deltas, out=deltas)  # dod chain → per-step deltas d_i
    np.cumsum(deltas, out=deltas)  # deltas → offsets from t0
    # int64 wraparound in both cumsums == v1's _wrap64 chain
    out = np.empty(n, dtype=np.int64)
    out[0] = t0
    out[1:] = t0 + deltas
    return out
