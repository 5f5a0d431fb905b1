"""HPACK header compression (RFC 7541) for the h2c transport (SURVEY
§2.1 S3; ref: core/downloader/handlers/http2.py — upstream delegates to
the ``h2``/``hpack`` packages; this is a from-scratch implementation over
the public RFC, no external deps).

Scope honestly stated: integer/string primitives, the full static table,
dynamic-table insertion/eviction/size-update, and all five field
representations are implemented and round-trip-tested. **Huffman string
coding is NOT implemented**: the encoder always emits plain (H=0)
strings — spec-legal, every peer must accept them — and the decoder
raises on H=1 strings rather than mis-decoding. Real-world servers often
Huffman-code response headers, so wiring this transport to the open
internet needs the RFC 7541 Appendix B code table dropped into
``_huffman_decode`` (the one TODO seam); inside the sandbox the only
reachable peer is the loopback test server, which round-trips the plain
coding bit-exactly.
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


def _encode_str(s: str) -> bytes:
    raw = s.encode("utf-8")
    return encode_int(len(raw), 7, 0x00) + raw  # H=0: plain coding


def _decode_str(data: bytes, pos: int) -> tuple[str, int]:
    huffman = bool(data[pos] & 0x80)
    length, pos = decode_int(data, pos, 7)
    raw = data[pos : pos + length]
    pos += length
    if huffman:
        # documented seam: RFC 7541 Appendix B table goes here
        raise NotImplementedError(
            "HPACK Huffman-coded string received; this transport only "
            "supports plain (H=0) string coding"
        )
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

    def __init__(self, max_table_size: int = 4096):
        self.table = _DynamicTable(max_table_size)
        self._pending_resize: int | None = None

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
                out += b"\x40" + _encode_str(name)
            out += _encode_str(value)
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


__all__ = ["Encoder", "Decoder", "STATIC_TABLE", "encode_int", "decode_int"]
