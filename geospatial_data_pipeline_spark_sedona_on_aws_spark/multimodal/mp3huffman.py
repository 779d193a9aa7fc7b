"""Layer III spectral Huffman machinery (r13, VERDICT r12 item 2) — the
layer below the r12 region structure: decode big_values (x, y) pairs and
count1 (v, w, x, y) quadruples from the part3 bitstream to actual spectral
lines, so per-band energy is queryable without PCM synthesis.

What is SPEC-TRUE here (ISO/IEC 11172-3 §2.4.1.7 / §2.4.2.7):

- the table SHAPES: per-table (xlen, ylen) dimensions and linbits widths
  for tables 0..31 (tables 4 and 14 carry no codebook; like minimp3's
  table map, a region selecting them decodes as all-zero — libmad errors
  instead, a documented divergence);
- ESC semantics: in a table with linbits > 0 a coordinate of 15 is an
  escape — the decoder reads `linbits` extra bits and adds them to 15;
- sign coding: each nonzero decoded magnitude is followed by one sign bit
  (1 = negative), in (x-linbits, x-sign, y-linbits, y-sign) order;
- count1 structure: after 2·big_values lines, quadruples of {0,1} values
  each followed by its sign bit, selected by count1table_select, ending
  exactly at the part2_3_length bit boundary (and never past line 576);
- the continuous main_data bitstream: part2 (scalefactors) and part3
  (Huffman) abut BIT-aligned per (granule, channel) — no byte padding
  between granules (mp3frames.mp3_spectrum walks this layout).

What is ENGINE-DEFINED (documented boundary, NOT a spec claim): the
codeword assignments themselves. ISO Table B.7 lists ~1.2k explicit
(hlen, hcod) entries per table; this engine instead derives each table's
codes as a deterministic canonical Huffman code over the spec's symbol
alphabet (weights favor small |x|+|y|, mirroring the spec tables' design
intent). Every codebook is a valid prefix code with the spec's exact
alphabet and escape/sign semantics, and the fixture encoder and decoder
share it — but the literal bit patterns differ from ISO B.7, so this
module parses its OWN spec-shaped streams, not third-party MP3 files.
count1 table B is the one spec-literal book: the fixed 4-bit complement
code (hcod = ~quad & 0xF, hlen = 4).
"""

from __future__ import annotations

from .mp3frames import Mp3Error

#: (xlen, ylen, linbits) per table id — public ISO 11172-3 B.7 structure.
#: Tables 4 and 14 are unused in the spec (no codebook): regions selecting
#: them decode as zeros, like table 0.
TABLE_DIMS = {
    0: (0, 0, 0),
    1: (2, 2, 0), 2: (3, 3, 0), 3: (3, 3, 0),
    4: (0, 0, 0),
    5: (4, 4, 0), 6: (4, 4, 0),
    7: (6, 6, 0), 8: (6, 6, 0), 9: (6, 6, 0),
    10: (8, 8, 0), 11: (8, 8, 0), 12: (8, 8, 0),
    13: (16, 16, 0),
    14: (0, 0, 0),
    15: (16, 16, 0),
    16: (16, 16, 1), 17: (16, 16, 2), 18: (16, 16, 3), 19: (16, 16, 4),
    20: (16, 16, 6), 21: (16, 16, 8), 22: (16, 16, 10), 23: (16, 16, 13),
    24: (16, 16, 4), 25: (16, 16, 5), 26: (16, 16, 6), 27: (16, 16, 7),
    28: (16, 16, 8), 29: (16, 16, 9), 30: (16, 16, 11), 31: (16, 16, 13),
}

#: fixture value-law cap for ESC linbits (keeps worst-case part3 bounded)
ESC_LAW_CAP = 10


def table_vmax(t: int) -> int:
    """Largest magnitude the fixture value law emits for a region coded
    with table t: 0 for the no-codebook tables, xlen-1 for non-ESC books,
    and 15 + min(2^linbits - 1, ESC_LAW_CAP) for ESC books (the cap keeps
    the law's worst-case bit cost bounded; the DECODER accepts the full
    2^linbits escape range regardless)."""
    xlen, _ylen, linbits = TABLE_DIMS[t]
    if xlen == 0:
        return 0
    if linbits == 0:
        return xlen - 1
    return 15 + min((1 << linbits) - 1, ESC_LAW_CAP)


def _huffman_lengths(weights: list) -> list:
    """Deterministic Huffman code lengths (integer weights, ties broken
    by insertion order via a monotone sequence number)."""
    import heapq

    n = len(weights)
    if n == 1:
        return [1]
    heap = [(w, i, ("leaf", i)) for i, w in enumerate(weights)]
    heapq.heapify(heap)
    seq = n
    while len(heap) > 1:
        w1, _s1, n1 = heapq.heappop(heap)
        w2, _s2, n2 = heapq.heappop(heap)
        heapq.heappush(heap, (w1 + w2, seq, ("node", n1, n2)))
        seq += 1
    depths = [0] * n
    stack = [(heap[0][2], 0)]
    while stack:
        node, d = stack.pop()
        if node[0] == "leaf":
            depths[node[1]] = max(d, 1)
        else:
            stack.append((node[1], d + 1))
            stack.append((node[2], d + 1))
    return depths


def _canonical(lengths: list) -> dict:
    """Canonical code assignment: symbols sorted by (length, symbol id),
    codes count up with left shifts at each length increase. Returns
    {symbol: (code, length)} — a prefix code by construction."""
    syms = sorted(range(len(lengths)), key=lambda s: (lengths[s], s))
    codes = {}
    code = 0
    prev = 0
    for s in syms:
        ln = lengths[s]
        code <<= (ln - prev)
        prev = ln
        codes[s] = (code, ln)
        code += 1
    return codes


_BOOK_CACHE: dict = {}


def pair_book(t: int) -> dict:
    """Engine-canonical codebook for big_values table t: symbol index
    x * ylen + y -> (code, length). Weights 1024 // (1 + x + y) + 1 —
    small magnitudes get short codes, the spec tables' design intent.
    Raises for the no-codebook tables (0, 4, 14): callers must not emit
    bits for their regions."""
    if t not in _BOOK_CACHE:
        xlen, ylen, _lb = TABLE_DIMS[t]
        if xlen == 0:
            raise Mp3Error(f"table {t} carries no codebook")
        weights = [1024 // (1 + x + y) + 1
                   for x in range(xlen) for y in range(ylen)]
        _BOOK_CACHE[t] = _canonical(_huffman_lengths(weights))
    return _BOOK_CACHE[t]


def count1_book(select: int) -> dict:
    """count1 codebook: select 0 = table A (engine-canonical, weights
    favor fewer nonzero values); select 1 = table B, the spec's literal
    fixed 4-bit complement code (hcod = ~quad & 0xF)."""
    key = ("c1", select)
    if key not in _BOOK_CACHE:
        if select == 1:
            _BOOK_CACHE[key] = {q: ((~q) & 0xF, 4) for q in range(16)}
        else:
            weights = [1 + 2 * (4 - bin(q).count("1")) for q in range(16)]
            _BOOK_CACHE[key] = _canonical(_huffman_lengths(weights))
    return _BOOK_CACHE[key]


def _decode_table(book: dict) -> dict:
    """(length, code) -> symbol inverse map, memoized per book id."""
    key = ("inv", id(book))
    if key not in _BOOK_CACHE:
        _BOOK_CACHE[key] = {(ln, code): s for s, (code, ln) in book.items()}
    return _BOOK_CACHE[key]


def max_code_len(book: dict) -> int:
    return max(ln for _c, ln in book.values())


# ----------------------------------------------------------- bit plumbing

def write_symbol(w, book: dict, sym: int) -> int:
    code, ln = book[sym]
    w.put(code, ln)
    return ln


def read_symbol(r, book: dict) -> int:
    """Walk bits until a codeword of the prefix code matches."""
    inv = _decode_table(book)
    acc = 0
    for ln in range(1, max_code_len(book) + 1):
        acc = (acc << 1) | r.get(1)
        sym = inv.get((ln, acc))
        if sym is not None:
            return sym
    raise Mp3Error("part3 bits do not decode under the selected codebook")


def encode_value(w, book_t: int, book: dict, mag: int, neg: bool) -> int:
    """Bits AFTER the pair codeword for one coordinate: linbits escape
    extension (coordinate 15 in an ESC table) then the sign bit for any
    nonzero magnitude. Returns bits written."""
    linbits = TABLE_DIMS[book_t][2]
    bits = 0
    if mag >= 15 and linbits > 0:
        w.put(mag - 15, linbits)
        bits += linbits
    if mag != 0:
        w.put(1 if neg else 0, 1)
        bits += 1
    return bits


def decode_value(r, book_t: int, coord: int) -> tuple:
    """(signed value, escape flag) for one decoded coordinate."""
    linbits = TABLE_DIMS[book_t][2]
    esc = coord == 15 and linbits > 0
    mag = coord + (r.get(linbits) if esc else 0)
    if mag != 0 and r.get(1):
        return -mag, esc
    return mag, esc
