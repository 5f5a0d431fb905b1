"""HTTP/2 cleartext (h2c, prior-knowledge) transport — the S3 operator
(SURVEY §2.1 S3; ref: core/downloader/handlers/http2.py::
H2DownloadHandler ≈L30 — upstream builds on Twisted + the ``h2`` stack;
this is a from-scratch RFC 9113 subset over stdlib sockets, matching the
reference handler's surface: one connection per authority, many
concurrent GET streams).

Why it matters at crawl scale: politeness-heavy hosts bound a crawler by
per-domain concurrency, and HTTP/1.1 pays one TCP connection per
in-flight request. h2 multiplexes CONCURRENT_REQUESTS_PER_DOMAIN streams
over ONE connection per slot — the loopback e2e asserts exactly that
(N requests, 1 connection).

Subset implemented (client side): connection preface + SETTINGS
exchange/ACK, HEADERS(+CONTINUATION) with shared-HPACK header blocks,
DATA with receive-side flow control (WINDOW_UPDATE replenish), PING ACK,
RST_STREAM / GOAWAY error surfacing, odd-stream allocation under the
server's MAX_CONCURRENT_STREAMS. Not implemented (documented): TLS/ALPN
upgrade (h2c prior-knowledge only — in-sandbox there is no CA/TLS peer),
request bodies (the crawler only GETs), PUSH_PROMISE (disabled via
SETTINGS_ENABLE_PUSH=0) and priorities. HPACK Huffman strings are fully
supported (functions/hpack.py, RFC 7541 §5.2 + Appendix B) — both peers
here emit Huffman-coded literals by default, as real servers do.

The engine reaches this through ``CrawlConfig.transport="h2c"`` →
``netfetch._fetch_one`` dispatch; responses come back in the exact
``_fetch_one`` tuple shape so every downstream operator (redirects,
cookies, retries, charset, link extraction) is transport-agnostic.
"""

from __future__ import annotations

import socket
import ssl
import struct
import threading
from urllib.parse import urlsplit

from ..functions.hpack import Decoder, Encoder

PREFACE = b"PRI * HTTP/2.0\r\n\r\nSM\r\n\r\n"

# frame types (RFC 9113 §6)
DATA, HEADERS, PRIORITY, RST_STREAM, SETTINGS = 0, 1, 2, 3, 4
PUSH_PROMISE, PING, GOAWAY, WINDOW_UPDATE, CONTINUATION = 5, 6, 7, 8, 9

FLAG_END_STREAM = 0x1
FLAG_ACK = 0x1
FLAG_END_HEADERS = 0x4
FLAG_PADDED = 0x8
FLAG_PRIORITY = 0x20

SETTINGS_HEADER_TABLE_SIZE = 0x1
SETTINGS_ENABLE_PUSH = 0x2
SETTINGS_MAX_CONCURRENT_STREAMS = 0x3
SETTINGS_INITIAL_WINDOW_SIZE = 0x4
SETTINGS_MAX_FRAME_SIZE = 0x5

DEFAULT_WINDOW = 65535


def pack_frame(ftype: int, flags: int, stream_id: int, payload: bytes) -> bytes:
    return (
        struct.pack("!I", len(payload))[1:]
        + bytes([ftype, flags])
        + struct.pack("!I", stream_id & 0x7FFFFFFF)
        + payload
    )


def read_exact(sock: socket.socket, n: int) -> bytes:
    buf = bytearray()
    while len(buf) < n:
        chunk = sock.recv(n - len(buf))
        if not chunk:
            raise ConnectionError("peer closed")
        buf += chunk
    return bytes(buf)


def read_frame(sock: socket.socket) -> tuple[int, int, int, bytes]:
    """→ (type, flags, stream_id, payload)."""
    hdr = read_exact(sock, 9)
    length = int.from_bytes(hdr[:3], "big")
    ftype, flags = hdr[3], hdr[4]
    stream_id = int.from_bytes(hdr[5:9], "big") & 0x7FFFFFFF
    payload = read_exact(sock, length) if length else b""
    return ftype, flags, stream_id, payload


def _strip_padding(flags: int, payload: bytes) -> bytes:
    if flags & FLAG_PADDED:
        pad = payload[0]
        return payload[1 : len(payload) - pad]
    return payload


def settings_payload(**kv: int) -> bytes:
    names = {
        "enable_push": SETTINGS_ENABLE_PUSH,
        "max_concurrent_streams": SETTINGS_MAX_CONCURRENT_STREAMS,
        "initial_window_size": SETTINGS_INITIAL_WINDOW_SIZE,
        "max_frame_size": SETTINGS_MAX_FRAME_SIZE,
    }
    return b"".join(struct.pack("!HI", names[k], v) for k, v in kv.items())


class _Stream:
    __slots__ = ("event", "headers", "body", "error")

    def __init__(self):
        self.event = threading.Event()
        self.headers: list[tuple[str, str]] = []
        self.body = bytearray()
        self.error: str | None = None


class _DynLimiter:
    """Context-manager concurrency gate whose limit can change at runtime
    — a Semaphore can't shrink, but the server's MAX_CONCURRENT_STREAMS
    arrives AFTER streams may already be in flight. In-flight streams
    above a lowered limit finish normally (RFC 9113 §6.5.2 — a reduced
    limit applies to new streams); new requests wait."""

    def __init__(self, limit: int):
        self._cond = threading.Condition()
        self._limit = max(1, limit)
        self._inflight = 0

    @property
    def limit(self) -> int:
        return self._limit

    def set_limit(self, n: int) -> None:
        with self._cond:
            self._limit = max(1, n)
            self._cond.notify_all()

    def __enter__(self) -> "_DynLimiter":
        with self._cond:
            while self._inflight >= self._limit:
                self._cond.wait()
            self._inflight += 1
        return self

    def __exit__(self, *exc) -> None:
        with self._cond:
            self._inflight -= 1
            self._cond.notify_all()


class H2Connection:
    """One h2c client connection; thread-safe ``request()`` multiplexes
    concurrent streams. A dead connection marks itself ``closed`` and the
    pool replaces it (transient-error semantics: callers get an error
    tuple, the engine's retry path re-queues)."""

    def __init__(
        self,
        host: str,
        port: int,
        timeout_s: float = 30.0,
        ssl_context=None,
        server_hostname: str | None = None,
    ):
        raw = socket.create_connection((host, port), timeout=timeout_s)
        if ssl_context is not None:
            # h2-over-TLS (RFC 9113 §3.1): verified handshake + ALPN —
            # the peer MUST negotiate "h2" or the connection is refused.
            # (One reader thread + locked writers: SSLSocket supports the
            # one-reader/one-writer pattern on blocking sockets.)
            self.sock = ssl_context.wrap_socket(
                raw, server_hostname=server_hostname or host
            )
            if self.sock.selected_alpn_protocol() != "h2":
                self.sock.close()
                raise ConnectionError(
                    "TLS peer did not negotiate h2 via ALPN"
                )
        else:
            self.sock = raw  # h2c: cleartext prior-knowledge
        self.scheme = "https" if ssl_context is not None else "http"
        # blocking reads after connect: the reader thread parks on recv
        # between responses (an idle pooled connection must not time out);
        # per-REQUEST deadlines live in request()'s event wait instead
        self.sock.settimeout(None)
        self.timeout_s = timeout_s
        self.encoder = Encoder()
        self.decoder = Decoder()
        self.write_lock = threading.Lock()
        self.state_lock = threading.Lock()
        self.streams: dict[int, _Stream] = {}
        self.next_stream_id = 1
        self.closed = False
        # conservative default under RFC-recommended server minimums; the
        # engine's per-slot politeness cap (CONCURRENT_REQUESTS_PER_DOMAIN,
        # default 8) sits well below it anyway
        self.max_concurrent = 32
        self.max_frame_size = 16384
        # CONTINUATION accumulation: sid → [block bytes, END_STREAM latch].
        # END_STREAM can only appear on the initiating HEADERS frame
        # (CONTINUATION never carries it, RFC 9113 §6.10), so it is
        # latched there and applied when END_HEADERS finally arrives.
        self._hdr_buf: dict[int, list] = {}
        # handshake: preface + our SETTINGS (push off)
        with self.write_lock:
            self.sock.sendall(
                PREFACE
                + pack_frame(SETTINGS, 0, 0, settings_payload(enable_push=0))
            )
        self._sem = _DynLimiter(self.max_concurrent)
        self.reader = threading.Thread(target=self._read_loop, daemon=True)
        self.reader.start()

    # ------------------------------------------------------------ reader
    def _read_loop(self) -> None:
        try:
            while True:
                ftype, flags, sid, payload = read_frame(self.sock)
                if ftype == SETTINGS and not flags & FLAG_ACK:
                    for off in range(0, len(payload) - 5, 6):
                        ident, value = struct.unpack_from("!HI", payload, off)
                        if ident == SETTINGS_MAX_CONCURRENT_STREAMS:
                            self.max_concurrent = value
                            self._sem.set_limit(value)
                        elif ident == SETTINGS_MAX_FRAME_SIZE:
                            self.max_frame_size = value
                        elif ident == SETTINGS_HEADER_TABLE_SIZE:
                            # bounds OUR encoder's dynamic table; next
                            # header block opens with a §6.3 size update
                            self.encoder.resize(value)
                    self._send(pack_frame(SETTINGS, FLAG_ACK, 0, b""))
                elif ftype == PING and not flags & FLAG_ACK:
                    self._send(pack_frame(PING, FLAG_ACK, 0, payload))
                elif ftype in (HEADERS, CONTINUATION):
                    ent = self._hdr_buf.setdefault(sid, [bytearray(), False])
                    block = _strip_padding(flags, payload)
                    if ftype == HEADERS:
                        if flags & FLAG_PRIORITY:
                            block = block[5:]
                        # latch: CONTINUATION never carries END_STREAM
                        ent[1] = bool(flags & FLAG_END_STREAM)
                    ent[0] += block
                    if flags & FLAG_END_HEADERS:
                        # HPACK blocks MUST decode in arrival order — the
                        # single reader thread guarantees it
                        headers = self.decoder.decode(bytes(ent[0]))
                        end_stream = ent[1]
                        del self._hdr_buf[sid]
                        st = self.streams.get(sid)
                        if st is not None:
                            st.headers += headers
                            if end_stream:
                                self._finish(sid)
                elif ftype == DATA:
                    body = _strip_padding(flags, payload)
                    st = self.streams.get(sid)
                    if st is not None:
                        st.body += body
                    if len(payload):  # replenish both flow-control windows
                        wu = struct.pack("!I", len(payload))
                        self._send(
                            pack_frame(WINDOW_UPDATE, 0, 0, wu)
                            + pack_frame(WINDOW_UPDATE, 0, sid, wu)
                        )
                    if flags & FLAG_END_STREAM:
                        self._finish(sid)
                elif ftype == RST_STREAM:
                    st = self.streams.get(sid)
                    if st is not None:
                        st.error = f"RST_STREAM code {int.from_bytes(payload[:4], 'big')}"
                        self._finish(sid)
                elif ftype == GOAWAY:
                    raise ConnectionError(
                        f"GOAWAY code {int.from_bytes(payload[4:8], 'big')}"
                    )
                # PRIORITY / PUSH_PROMISE / unknown: ignored (push disabled)
        except Exception as e:  # noqa: BLE001 — fail all pending streams
            with self.state_lock:
                self.closed = True
                pending = list(self.streams.values())
            for st in pending:
                if not st.event.is_set():
                    st.error = f"{type(e).__name__}: {e}"
                    st.event.set()
            try:
                self.sock.close()
            except OSError:
                pass

    def _finish(self, sid: int) -> None:
        st = self.streams.pop(sid, None)
        if st is not None:
            st.event.set()

    def _send(self, data: bytes) -> None:
        with self.write_lock:
            self.sock.sendall(data)

    # ----------------------------------------------------------- request
    def request(
        self, path: str, authority: str, extra_headers: dict | None = None
    ) -> tuple[int, bytes, dict, list, str | None]:
        """GET ``path`` → (status, body, headers, set_cookie, error)."""
        hdrs = [
            (":method", "GET"),
            (":scheme", self.scheme),
            (":authority", authority),
            (":path", path),
        ]
        for k, v in (extra_headers or {}).items():
            hdrs.append((k.lower(), v))
        st = _Stream()
        with self._sem:
            with self.state_lock:
                if self.closed:
                    return 0, b"", {}, [], "ConnectionError: connection closed"
                sid = self.next_stream_id
                self.next_stream_id += 2
                self.streams[sid] = st
            try:
                # encoder state is connection-level: serialize encode+send
                with self.write_lock:
                    block = self.encoder.encode(hdrs)
                    self.sock.sendall(
                        pack_frame(
                            HEADERS,
                            FLAG_END_HEADERS | FLAG_END_STREAM,
                            sid,
                            block,
                        )
                    )
            except Exception as e:  # noqa: BLE001
                self.streams.pop(sid, None)
                return 0, b"", {}, [], f"{type(e).__name__}: {e}"
            if not st.event.wait(self.timeout_s):
                self.streams.pop(sid, None)
                return 0, b"", {}, [], "TimeoutError: h2 stream timed out"
        if st.error:
            return 0, b"", {}, [], st.error
        status = 0
        plain: dict[str, str] = {}
        set_cookie: list[str] = []
        for name, value in st.headers:
            if name == ":status":
                status = int(value)
            elif name == "set-cookie":
                set_cookie.append(value)
            else:
                plain[name] = value
        return status, bytes(st.body), plain, set_cookie, None

    def close(self) -> None:
        with self.state_lock:
            self.closed = True
        try:
            self.sock.close()
        except OSError:
            pass


class H2Pool:
    """authority → one shared H2Connection (the per-slot connection the
    module docstring promises). Worker-process-global, like netfetch's
    executor-local resolver memo; dead connections are replaced on the
    next request (callers see a retryable error row meanwhile)."""

    def __init__(self, timeout_s: float = 30.0, ca_file: str | None = None):
        self.timeout_s = timeout_s
        self.ca_file = ca_file
        self._conns: dict[tuple, H2Connection] = {}
        self._lock = threading.Lock()
        # per-authority connect locks: a blocking TCP connect/handshake to
        # one dead host (up to timeout_s) must never serialize fetches to
        # OTHER authorities, so the pool-global lock only guards the dicts
        self._key_locks: dict[tuple, threading.Lock] = {}
        self._ssl_ctx = None  # lazy: built on the first https fetch

    def _tls_context(self):
        if self._ssl_ctx is None:
            ctx = ssl.create_default_context(cafile=self.ca_file)
            ctx.set_alpn_protocols(["h2"])
            self._ssl_ctx = ctx
        return self._ssl_ctx

    def connect_count(self) -> int:
        return len(self._conns)

    def fetch(
        self,
        url: str,
        extra_headers: dict | None = None,
        maxsize: int = 10 * 1024 * 1024,
    ) -> tuple[int, bytes, dict, list, bool, str | None]:
        """``_fetch_one``-shaped: (status, body, headers, set_cookie,
        truncated, error). ``https`` URLs get h2-over-TLS (verified
        handshake + ALPN); ``http`` stays h2c prior-knowledge."""
        parts = urlsplit(url)
        tls = parts.scheme == "https"
        host, port = parts.hostname, parts.port or (443 if tls else 80)
        path = parts.path or "/"
        if parts.query:
            path += "?" + parts.query
        key = (host, port, tls)
        with self._lock:
            conn = self._conns.get(key)
            klock = self._key_locks.setdefault(key, threading.Lock())
        if conn is None or conn.closed:
            # connect OUTSIDE the pool-global lock: only same-authority
            # requests wait on this handshake (and they'd share the
            # resulting connection anyway)
            with klock:
                with self._lock:
                    conn = self._conns.get(key)
                if conn is None or conn.closed:
                    try:
                        conn = H2Connection(
                            host,
                            port,
                            self.timeout_s,
                            ssl_context=self._tls_context() if tls else None,
                        )
                    except Exception as e:  # noqa: BLE001 — refused/DNS/TLS
                        return 0, b"", {}, [], False, f"{type(e).__name__}: {e}"
                    with self._lock:
                        self._conns[key] = conn
        status, body, headers, set_cookie, error = conn.request(
            path, parts.netloc, extra_headers
        )
        truncated = len(body) > maxsize
        return status, body[:maxsize], headers, set_cookie, truncated, error

    def close(self) -> None:
        with self._lock:
            for conn in self._conns.values():
                conn.close()
            self._conns.clear()


# ---------------------------------------------------------------- server
class H2Server:
    """Minimal h2c loopback server for tests — the only reachable h2 peer
    in the sandbox (no network, SURVEY §0). Handler signature:
    ``handler(path, headers_dict) -> (status, extra_headers, body)``.
    Counts connections and streams so tests can assert multiplexing.
    Response header blocks use the shared HPACK encoder with incremental
    indexing, so the CLIENT's dynamic-table decode path is genuinely
    exercised (not just static hits)."""

    def __init__(self, handler, tls: tuple[str, str] | None = None):
        """``tls=(certfile, keyfile)`` serves h2-over-TLS: the listener
        wraps accepted sockets with an ALPN-h2 TLS context (RFC 9113
        §3.1), exactly what a real h2 origin does."""
        self.handler = handler
        self.connections = 0
        self.requests = 0
        self._lock = threading.Lock()
        self._tls_ctx = None
        if tls is not None:
            self._tls_ctx = ssl.SSLContext(ssl.PROTOCOL_TLS_SERVER)
            self._tls_ctx.load_cert_chain(*tls)
            self._tls_ctx.set_alpn_protocols(["h2"])
        self.sock = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
        self.sock.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        self.sock.bind(("127.0.0.1", 0))
        self.sock.listen(32)
        self.port = self.sock.getsockname()[1]
        self._accepting = True
        threading.Thread(target=self._accept_loop, daemon=True).start()

    def _accept_loop(self) -> None:
        while self._accepting:
            try:
                conn, _ = self.sock.accept()
            except OSError:
                return  # listener closed
            try:
                if self._tls_ctx is not None:
                    conn = self._tls_ctx.wrap_socket(conn, server_side=True)
            except OSError:
                # a failed/aborted handshake must not kill the listener —
                # NOTE ssl.SSLError IS an OSError, so this clause must be
                # separate from the accept() one above (a single client
                # timing out mid-handshake under host load used to return
                # here and EOF every later connection)
                continue
            with self._lock:
                self.connections += 1
            threading.Thread(
                target=self._serve_conn, args=(conn,), daemon=True
            ).start()

    def _serve_conn(self, sock: socket.socket) -> None:
        try:
            if read_exact(sock, len(PREFACE)) != PREFACE:
                sock.close()
                return
            wlock = threading.Lock()
            with wlock:
                sock.sendall(
                    pack_frame(
                        SETTINGS, 0, 0, settings_payload(max_concurrent_streams=64)
                    )
                )
            decoder, encoder = Decoder(), Encoder()
            hdr_buf: dict[int, bytearray] = {}
            while True:
                ftype, flags, sid, payload = read_frame(sock)
                if ftype == SETTINGS and not flags & FLAG_ACK:
                    with wlock:
                        sock.sendall(pack_frame(SETTINGS, FLAG_ACK, 0, b""))
                elif ftype == PING and not flags & FLAG_ACK:
                    with wlock:
                        sock.sendall(pack_frame(PING, FLAG_ACK, 0, payload))
                elif ftype in (HEADERS, CONTINUATION):
                    buf = hdr_buf.setdefault(sid, bytearray())
                    block = _strip_padding(flags, payload)
                    if ftype == HEADERS and flags & FLAG_PRIORITY:
                        block = block[5:]
                    buf += block
                    if flags & FLAG_END_HEADERS:
                        headers = dict(decoder.decode(bytes(buf)))
                        del hdr_buf[sid]
                        with self._lock:
                            self.requests += 1
                        threading.Thread(
                            target=self._respond,
                            args=(sock, wlock, encoder, sid, headers),
                            daemon=True,
                        ).start()
                elif ftype == WINDOW_UPDATE:
                    pass  # responses are small; send window never exhausted
                elif ftype == GOAWAY:
                    return
        except (ConnectionError, OSError):
            pass
        finally:
            sock.close()

    def _respond(self, sock, wlock, encoder, sid, headers) -> None:
        status, extra, body = self.handler(headers.get(":path", "/"), headers)
        hdrs = [(":status", str(status))] + [
            (k.lower(), v) for k, v in extra.items()
        ]
        # encoder is connection-level shared state: encode under the
        # write lock so blocks hit the wire in encode order
        with wlock:
            frames = pack_frame(
                HEADERS,
                FLAG_END_HEADERS | (0 if body else FLAG_END_STREAM),
                sid,
                encoder.encode(hdrs),
            )
            if body:
                for off in range(0, len(body), 16384):
                    chunk = body[off : off + 16384]
                    last = off + 16384 >= len(body)
                    frames += pack_frame(
                        DATA, FLAG_END_STREAM if last else 0, sid, chunk
                    )
            try:
                sock.sendall(frames)
            except OSError:
                pass

    def close(self) -> None:
        self._accepting = False
        self.sock.close()


__all__ = ["H2Connection", "H2Pool", "H2Server", "pack_frame", "read_frame"]
