"""HPACK header compression (RFC 7541) for the h2c transport (SURVEY
§2.1 S3; ref: core/downloader/handlers/http2.py — upstream delegates to
the ``h2``/``hpack`` packages; this is a from-scratch implementation over
the public RFC, no external deps).

Scope: integer/string primitives, the full static table, dynamic-table
insertion/eviction/size-update, all five field representations, and RFC
7541 §5.2 Huffman string coding — decode of H=1 strings (what real
servers emit for nearly every response header) plus encode (chosen per
string when it is shorter than the plain form, the standard peer
behavior). The code table is Appendix B verbatim; padding must be the
EOS-prefix (all ones, <8 bits) and a full EOS symbol inside the string
is a decode error, both per §5.2. Vectors: RFC 7541 Appendix C.4/C.6.
"""

from __future__ import annotations

# RFC 7541 Appendix A — the static table, verbatim (1-indexed).
STATIC_TABLE: list[tuple[str, str]] = [
    (":authority", ""),
    (":method", "GET"),
    (":method", "POST"),
    (":path", "/"),
    (":path", "/index.html"),
    (":scheme", "http"),
    (":scheme", "https"),
    (":status", "200"),
    (":status", "204"),
    (":status", "206"),
    (":status", "304"),
    (":status", "400"),
    (":status", "404"),
    (":status", "500"),
    ("accept-charset", ""),
    ("accept-encoding", "gzip, deflate"),
    ("accept-language", ""),
    ("accept-ranges", ""),
    ("accept", ""),
    ("access-control-allow-origin", ""),
    ("age", ""),
    ("allow", ""),
    ("authorization", ""),
    ("cache-control", ""),
    ("content-disposition", ""),
    ("content-encoding", ""),
    ("content-language", ""),
    ("content-length", ""),
    ("content-location", ""),
    ("content-range", ""),
    ("content-type", ""),
    ("cookie", ""),
    ("date", ""),
    ("etag", ""),
    ("expect", ""),
    ("expires", ""),
    ("from", ""),
    ("host", ""),
    ("if-match", ""),
    ("if-modified-since", ""),
    ("if-none-match", ""),
    ("if-range", ""),
    ("if-unmodified-since", ""),
    ("last-modified", ""),
    ("link", ""),
    ("location", ""),
    ("max-forwards", ""),
    ("proxy-authenticate", ""),
    ("proxy-authorization", ""),
    ("range", ""),
    ("referer", ""),
    ("refresh", ""),
    ("retry-after", ""),
    ("server", ""),
    ("set-cookie", ""),
    ("strict-transport-security", ""),
    ("transfer-encoding", ""),
    ("user-agent", ""),
    ("vary", ""),
    ("via", ""),
    ("www-authenticate", ""),
]

_ENTRY_OVERHEAD = 32  # RFC 7541 §4.1: size = len(name) + len(value) + 32

# RFC 7541 Appendix B — the Huffman code, verbatim: HUFFMAN_CODES[sym] =
# (code, nbits) for byte symbols 0..255; EOS (sym 256) is the final row.
HUFFMAN_CODES: list[tuple[int, int]] = [
    (0x1FF8, 13), (0x7FFFD8, 23), (0xFFFFFE2, 28), (0xFFFFFE3, 28),
    (0xFFFFFE4, 28), (0xFFFFFE5, 28), (0xFFFFFE6, 28), (0xFFFFFE7, 28),
    (0xFFFFFE8, 28), (0xFFFFEA, 24), (0x3FFFFFFC, 30), (0xFFFFFE9, 28),
    (0xFFFFFEA, 28), (0x3FFFFFFD, 30), (0xFFFFFEB, 28), (0xFFFFFEC, 28),
    (0xFFFFFED, 28), (0xFFFFFEE, 28), (0xFFFFFEF, 28), (0xFFFFFF0, 28),
    (0xFFFFFF1, 28), (0xFFFFFF2, 28), (0x3FFFFFFE, 30), (0xFFFFFF3, 28),
    (0xFFFFFF4, 28), (0xFFFFFF5, 28), (0xFFFFFF6, 28), (0xFFFFFF7, 28),
    (0xFFFFFF8, 28), (0xFFFFFF9, 28), (0xFFFFFFA, 28), (0xFFFFFFB, 28),
    (0x14, 6), (0x3F8, 10), (0x3F9, 10), (0xFFA, 12),
    (0x1FF9, 13), (0x15, 6), (0xF8, 8), (0x7FA, 11),
    (0x3FA, 10), (0x3FB, 10), (0xF9, 8), (0x7FB, 11),
    (0xFA, 8), (0x16, 6), (0x17, 6), (0x18, 6),
    (0x0, 5), (0x1, 5), (0x2, 5), (0x19, 6),
    (0x1A, 6), (0x1B, 6), (0x1C, 6), (0x1D, 6),
    (0x1E, 6), (0x1F, 6), (0x5C, 7), (0xFB, 8),
    (0x7FFC, 15), (0x20, 6), (0xFFB, 12), (0x3FC, 10),
    (0x1FFA, 13), (0x21, 6), (0x5D, 7), (0x5E, 7),
    (0x5F, 7), (0x60, 7), (0x61, 7), (0x62, 7),
    (0x63, 7), (0x64, 7), (0x65, 7), (0x66, 7),
    (0x67, 7), (0x68, 7), (0x69, 7), (0x6A, 7),
    (0x6B, 7), (0x6C, 7), (0x6D, 7), (0x6E, 7),
    (0x6F, 7), (0x70, 7), (0x71, 7), (0x72, 7),
    (0xFC, 8), (0x73, 7), (0xFD, 8), (0x1FFB, 13),
    (0x7FFF0, 19), (0x1FFC, 13), (0x3FFC, 14), (0x22, 6),
    (0x7FFD, 15), (0x3, 5), (0x23, 6), (0x4, 5),
    (0x24, 6), (0x5, 5), (0x25, 6), (0x26, 6),
    (0x27, 6), (0x6, 5), (0x74, 7), (0x75, 7),
    (0x28, 6), (0x29, 6), (0x2A, 6), (0x7, 5),
    (0x2B, 6), (0x76, 7), (0x2C, 6), (0x8, 5),
    (0x9, 5), (0x2D, 6), (0x77, 7), (0x78, 7),
    (0x79, 7), (0x7A, 7), (0x7B, 7), (0x7FFE, 15),
    (0x7FC, 11), (0x3FFD, 14), (0x1FFD, 13), (0xFFFFFFC, 28),
    (0xFFFE6, 20), (0x3FFFD2, 22), (0xFFFE7, 20), (0xFFFE8, 20),
    (0x3FFFD3, 22), (0x3FFFD4, 22), (0x3FFFD5, 22), (0x7FFFD9, 23),
    (0x3FFFD6, 22), (0x7FFFDA, 23), (0x7FFFDB, 23), (0x7FFFDC, 23),
    (0x7FFFDD, 23), (0x7FFFDE, 23), (0xFFFFEB, 24), (0x7FFFDF, 23),
    (0xFFFFEC, 24), (0xFFFFED, 24), (0x3FFFD7, 22), (0x7FFFE0, 23),
    (0xFFFFEE, 24), (0x7FFFE1, 23), (0x7FFFE2, 23), (0x7FFFE3, 23),
    (0x7FFFE4, 23), (0x1FFFDC, 21), (0x3FFFD8, 22), (0x7FFFE5, 23),
    (0x3FFFD9, 22), (0x7FFFE6, 23), (0x7FFFE7, 23), (0xFFFFEF, 24),
    (0x3FFFDA, 22), (0x1FFFDD, 21), (0xFFFE9, 20), (0x3FFFDB, 22),
    (0x3FFFDC, 22), (0x7FFFE8, 23), (0x7FFFE9, 23), (0x1FFFDE, 21),
    (0x7FFFEA, 23), (0x3FFFDD, 22), (0x3FFFDE, 22), (0xFFFFF0, 24),
    (0x1FFFDF, 21), (0x3FFFDF, 22), (0x7FFFEB, 23), (0x7FFFEC, 23),
    (0x1FFFE0, 21), (0x1FFFE1, 21), (0x3FFFE0, 22), (0x1FFFE2, 21),
    (0x7FFFED, 23), (0x3FFFE1, 22), (0x7FFFEE, 23), (0x7FFFEF, 23),
    (0xFFFEA, 20), (0x3FFFE2, 22), (0x3FFFE3, 22), (0x3FFFE4, 22),
    (0x7FFFF0, 23), (0x3FFFE5, 22), (0x3FFFE6, 22), (0x7FFFF1, 23),
    (0x3FFFFE0, 26), (0x3FFFFE1, 26), (0xFFFEB, 20), (0x7FFF1, 19),
    (0x3FFFE7, 22), (0x7FFFF2, 23), (0x3FFFE8, 22), (0x1FFFFEC, 25),
    (0x3FFFFE2, 26), (0x3FFFFE3, 26), (0x3FFFFE4, 26), (0x7FFFFDE, 27),
    (0x7FFFFDF, 27), (0x3FFFFE5, 26), (0xFFFFF1, 24), (0x1FFFFED, 25),
    (0x7FFF2, 19), (0x1FFFE3, 21), (0x3FFFFE6, 26), (0x7FFFFE0, 27),
    (0x7FFFFE1, 27), (0x3FFFFE7, 26), (0x7FFFFE2, 27), (0xFFFFF2, 24),
    (0x1FFFE4, 21), (0x1FFFE5, 21), (0x3FFFFE8, 26), (0x3FFFFE9, 26),
    (0xFFFFFFD, 28), (0x7FFFFE3, 27), (0x7FFFFE4, 27), (0x7FFFFE5, 27),
    (0xFFFEC, 20), (0xFFFFF3, 24), (0xFFFED, 20), (0x1FFFE6, 21),
    (0x3FFFE9, 22), (0x1FFFE7, 21), (0x1FFFE8, 21), (0x7FFFF3, 23),
    (0x3FFFEA, 22), (0x3FFFEB, 22), (0x1FFFFEE, 25), (0x1FFFFEF, 25),
    (0xFFFFF4, 24), (0xFFFFF5, 24), (0x3FFFFEA, 26), (0x7FFFF4, 23),
    (0x3FFFFEB, 26), (0x7FFFFE6, 27), (0x3FFFFEC, 26), (0x3FFFFED, 26),
    (0x7FFFFE7, 27), (0x7FFFFE8, 27), (0x7FFFFE9, 27), (0x7FFFFEA, 27),
    (0x7FFFFEB, 27), (0xFFFFFFE, 28), (0x7FFFFEC, 27), (0x7FFFFED, 27),
    (0x7FFFFEE, 27), (0x7FFFFEF, 27), (0x7FFFFF0, 27), (0x3FFFFEE, 26),
    (0x3FFFFFFF, 30),  # EOS
]

#: (code, nbits) → symbol, for the incremental prefix-walk decoder.
#: Valid because Huffman codes are prefix-free: at most one (acc, n)
#: pair along a bit walk can be a codeword.
_HUFF_DECODE: dict[tuple[int, int], int] = {
    (code, bits): sym for sym, (code, bits) in enumerate(HUFFMAN_CODES)
}
_EOS_SYM = 256


def huffman_encode(raw: bytes) -> bytes:
    """RFC 7541 §5.2 string encoding: concatenated MSB-first codes,
    padded to a byte boundary with the EOS prefix (all ones)."""
    acc = 0
    nbits = 0
    out = bytearray()
    for b in raw:
        code, bits = HUFFMAN_CODES[b]
        acc = (acc << bits) | code
        nbits += bits
        while nbits >= 8:
            nbits -= 8
            out.append((acc >> nbits) & 0xFF)
        # drop the emitted high bits: without this, acc grows into an
        # O(n)-bit bignum and each shift turns encoding quadratic in
        # the string length (multi-KB cookie/path values are common)
        acc &= (1 << nbits) - 1
    if nbits:
        pad = 8 - nbits
        out.append(((acc << pad) | ((1 << pad) - 1)) & 0xFF)
    return bytes(out)


def huffman_decode(data: bytes) -> bytes:
    """RFC 7541 §5.2 string decoding. Raises ValueError on the two
    malformed paddings the spec calls out: padding longer than 7 bits /
    not the EOS prefix (not all ones), and an actual EOS in the body."""
    out = bytearray()
    acc = 0
    nbits = 0
    for byte in data:
        for shift in (7, 6, 5, 4, 3, 2, 1, 0):
            acc = (acc << 1) | ((byte >> shift) & 1)
            nbits += 1
            sym = _HUFF_DECODE.get((acc, nbits))
            if sym is not None:
                if sym == _EOS_SYM:
                    raise ValueError("HPACK Huffman: EOS inside string")
                out.append(sym)
                acc = 0
                nbits = 0
    if nbits >= 8 or acc != (1 << nbits) - 1:
        raise ValueError("HPACK Huffman: padding is not a valid EOS prefix")
    return bytes(out)


def encode_int(value: int, prefix_bits: int, first_byte_flags: int = 0) -> bytes:
    """RFC 7541 §5.1 prefix-coded integer."""
    limit = (1 << prefix_bits) - 1
    if value < limit:
        return bytes([first_byte_flags | value])
    out = bytearray([first_byte_flags | limit])
    value -= limit
    while value >= 128:
        out.append((value % 128) + 128)
        value //= 128
    out.append(value)
    return bytes(out)


def decode_int(data: bytes, pos: int, prefix_bits: int) -> tuple[int, int]:
    """→ (value, new_pos)."""
    limit = (1 << prefix_bits) - 1
    value = data[pos] & limit
    pos += 1
    if value < limit:
        return value, pos
    shift = 0
    while True:
        b = data[pos]
        pos += 1
        value += (b & 0x7F) << shift
        shift += 7
        if not (b & 0x80):
            return value, pos


def _encode_str(s: str, huffman: bool = True) -> bytes:
    raw = s.encode("utf-8")
    if huffman:
        coded = huffman_encode(raw)
        if len(coded) < len(raw):  # standard peer behavior: shorter wins
            return encode_int(len(coded), 7, 0x80) + coded
    return encode_int(len(raw), 7, 0x00) + raw  # H=0: plain coding


def _decode_str(data: bytes, pos: int) -> tuple[str, int]:
    huffman = bool(data[pos] & 0x80)
    length, pos = decode_int(data, pos, 7)
    raw = data[pos : pos + length]
    pos += length
    if huffman:
        raw = huffman_decode(raw)
    return raw.decode("utf-8"), pos


class _DynamicTable:
    """Shared insertion/eviction/lookup for encoder and decoder sides."""

    def __init__(self, max_size: int = 4096):
        self.max_size = max_size
        self.entries: list[tuple[str, str]] = []  # most recent first
        self.size = 0

    def add(self, name: str, value: str) -> None:
        need = len(name.encode()) + len(value.encode()) + _ENTRY_OVERHEAD
        while self.entries and self.size + need > self.max_size:
            en, ev = self.entries.pop()
            self.size -= len(en.encode()) + len(ev.encode()) + _ENTRY_OVERHEAD
        if need <= self.max_size:
            self.entries.insert(0, (name, value))
            self.size += need

    def resize(self, new_max: int) -> None:
        self.max_size = new_max
        while self.entries and self.size > self.max_size:
            en, ev = self.entries.pop()
            self.size -= len(en.encode()) + len(ev.encode()) + _ENTRY_OVERHEAD

    def at(self, index: int) -> tuple[str, str]:
        """1-based HPACK index → (name, value) across static + dynamic."""
        if 1 <= index <= len(STATIC_TABLE):
            return STATIC_TABLE[index - 1]
        dyn = index - len(STATIC_TABLE) - 1
        if 0 <= dyn < len(self.entries):
            return self.entries[dyn]
        raise ValueError(f"HPACK index {index} out of range")


class Encoder:
    """Header-list → header-block encoder with incremental indexing: exact
    (name, value) hits emit 1–2 byte indexed fields, repeated names reuse
    the table — the compression that makes per-request h2 headers cheap
    on politeness-heavy hosts (the S3 use case)."""

    def __init__(self, max_table_size: int = 4096, huffman: bool = True):
        self.table = _DynamicTable(max_table_size)
        self._pending_resize: int | None = None
        self.huffman = huffman  # False → always plain (H=0) strings

    def resize(self, new_max: int) -> None:
        """Apply the peer's SETTINGS_HEADER_TABLE_SIZE (RFC 7541 §4.2):
        the new cap takes effect now, and the NEXT header block must open
        with a dynamic-table size update (§6.3) so the peer's decoder
        evicts in lockstep. Setting an int attribute is atomic, so the
        h2 reader thread may call this while a writer encodes."""
        self._pending_resize = new_max

    def encode(self, headers: list[tuple[str, str]]) -> bytes:
        out = bytearray()
        if self._pending_resize is not None:
            new_max, self._pending_resize = self._pending_resize, None
            self.table.resize(new_max)
            out += encode_int(new_max, 5, 0x20)  # §6.3 size update
        for name, value in headers:
            name = name.lower()
            idx_exact = idx_name = 0
            for i, (n, v) in enumerate(STATIC_TABLE, start=1):
                if n == name:
                    if v == value:
                        idx_exact = i
                        break
                    idx_name = idx_name or i
            if not idx_exact:
                base = len(STATIC_TABLE)
                for i, (n, v) in enumerate(self.table.entries, start=base + 1):
                    if n == name:
                        if v == value:
                            idx_exact = i
                            break
                        idx_name = idx_name or i
            if idx_exact:
                out += encode_int(idx_exact, 7, 0x80)  # §6.1 indexed
                continue
            # §6.2.1 literal with incremental indexing
            if idx_name:
                out += encode_int(idx_name, 6, 0x40)
            else:
                out += b"\x40" + _encode_str(name, self.huffman)
            out += _encode_str(value, self.huffman)
            self.table.add(name, value)
        return bytes(out)


class Decoder:
    """Header-block → header-list decoder (all five field forms)."""

    def __init__(self, max_table_size: int = 4096):
        self.table = _DynamicTable(max_table_size)

    def decode(self, block: bytes) -> list[tuple[str, str]]:
        out: list[tuple[str, str]] = []
        pos = 0
        while pos < len(block):
            b = block[pos]
            if b & 0x80:  # §6.1 indexed field
                index, pos = decode_int(block, pos, 7)
                out.append(self.table.at(index))
            elif b & 0x40:  # §6.2.1 literal, incremental indexing
                index, pos = decode_int(block, pos, 6)
                name = self.table.at(index)[0] if index else None
                if name is None:
                    name, pos = _decode_str(block, pos)
                value, pos = _decode_str(block, pos)
                self.table.add(name, value)
                out.append((name, value))
            elif b & 0x20:  # §6.3 dynamic table size update
                new_max, pos = decode_int(block, pos, 5)
                self.table.resize(new_max)
            else:  # §6.2.2 without indexing (0x00) / §6.2.3 never (0x10)
                index, pos = decode_int(block, pos, 4)
                name = self.table.at(index)[0] if index else None
                if name is None:
                    name, pos = _decode_str(block, pos)
                value, pos = _decode_str(block, pos)
                out.append((name, value))
        return out


__all__ = [
    "Encoder",
    "Decoder",
    "STATIC_TABLE",
    "HUFFMAN_CODES",
    "encode_int",
    "decode_int",
    "huffman_encode",
    "huffman_decode",
]
