"""TLS (verified https), HTTP-proxy routing, and basic-auth injection on
the real fetch path (S2/S4 extensions; ref: handlers/http11.py ≈L40 for
the Twisted TLS client, downloadermiddlewares/httpproxy.py ≈L20,
httpauth.py ≈L15). All against live loopback servers: an ssl-wrapped
HTTP server with a self-signed cert (verified via a custom CA file — the
trust-root config upstream exposes through its client context factory),
a minimal absolute-URI forwarding proxy, and a 401-challenging origin."""

from __future__ import annotations

import base64
import datetime
import http.server
import ipaddress
import ssl
import threading
import urllib.request

import pytest
from pyspark.sql import functions as F

from scrapy_spark.config import CrawlConfig
from scrapy_spark.operators.netfetch import engine_fetch, http_fetch

cryptography = pytest.importorskip("cryptography")


# --------------------------------------------------------------- fixtures
def _make_self_signed(tmp_path):
    """Self-signed cert for 127.0.0.1 (SAN IP) + its key, PEM paths."""
    from cryptography import x509
    from cryptography.hazmat.primitives import hashes, serialization
    from cryptography.hazmat.primitives.asymmetric import rsa
    from cryptography.x509.oid import NameOID

    key = rsa.generate_private_key(public_exponent=65537, key_size=2048)
    name = x509.Name(
        [x509.NameAttribute(NameOID.COMMON_NAME, "127.0.0.1")]
    )
    now = datetime.datetime.now(datetime.timezone.utc)
    cert = (
        x509.CertificateBuilder()
        .subject_name(name)
        .issuer_name(name)
        .public_key(key.public_key())
        .serial_number(x509.random_serial_number())
        .not_valid_before(now - datetime.timedelta(days=1))
        .not_valid_after(now + datetime.timedelta(days=1))
        .add_extension(
            x509.SubjectAlternativeName(
                [x509.IPAddress(ipaddress.ip_address("127.0.0.1"))]
            ),
            critical=False,
        )
        .sign(key, hashes.SHA256())
    )
    cert_pem = tmp_path / "cert.pem"
    key_pem = tmp_path / "key.pem"
    cert_pem.write_bytes(cert.public_bytes(serialization.Encoding.PEM))
    key_pem.write_bytes(
        key.private_bytes(
            serialization.Encoding.PEM,
            serialization.PrivateFormat.TraditionalOpenSSL,
            serialization.NoEncryption(),
        )
    )
    return str(cert_pem), str(key_pem)


class _Echo(http.server.BaseHTTPRequestHandler):
    def log_message(self, *a):
        pass

    def do_GET(self):
        if self.path.startswith("/auth"):
            # echo whether (and which) Authorization header arrived
            got = self.headers.get("Authorization", "")
            body = f"auth={got}".encode()
        elif self.path.startswith("/page"):
            body = b'<html><body><a href="/leaf">x</a></body></html>'
            self.send_response(200)
            self.send_header("Content-Type", "text/html; charset=utf-8")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)
            return
        else:
            body = b"hello-tls"
        self.send_response(200)
        self.send_header("Content-Type", "text/plain")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)


@pytest.fixture(scope="module")
def tls_site(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("tls")
    cert_pem, key_pem = _make_self_signed(tmp)
    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), _Echo)
    ctx = ssl.SSLContext(ssl.PROTOCOL_TLS_SERVER)
    ctx.load_cert_chain(cert_pem, key_pem)
    srv.socket = ctx.wrap_socket(srv.socket, server_side=True)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    yield {
        "base": f"https://127.0.0.1:{srv.server_address[1]}",
        "ca": cert_pem,
    }
    srv.shutdown()


def _reqs(spark, urls):
    return spark.createDataFrame(
        [(u.encode(), u, "127.0.0.1") for u in urls],
        "fp binary, url string, slot string",
    )


# -------------------------------------------------------------------- TLS
def test_https_fetch_with_custom_ca(spark, tls_site):
    out = http_fetch(
        _reqs(spark, [f"{tls_site['base']}/hello"]),
        timeout_s=10.0,
        ca_file=tls_site["ca"],
    ).collect()
    assert len(out) == 1
    assert out[0].status == 200 and out[0].error is None
    assert bytes(out[0].body) == b"hello-tls"


def test_https_verification_is_enforced(spark, tls_site):
    """Without the CA file the self-signed peer must FAIL verification —
    an error row (retryable), never a silent insecure fetch."""
    out = http_fetch(
        _reqs(spark, [f"{tls_site['base']}/hello"]),
        timeout_s=10.0,
        ca_file=None,
    ).collect()
    assert out[0].status == 0
    assert "CERTIFICATE_VERIFY_FAILED" in (out[0].error or "")


def test_engine_fetch_over_tls(spark, tls_site):
    """The engine-shaped fetch adapter (engine_fetch) carries
    cfg.tls_ca_file into the worker-side TLS context."""
    cfg = CrawlConfig(
        fetch_backend="http",
        download_timeout_s=10.0,
        tls_ca_file=tls_site["ca"],
    )
    df = spark.createDataFrame(
        [
            (
                1,
                f"{tls_site['base']}/page",
                f"{tls_site['base']}/page",
                "127.0.0.1",
                "127.0.0.1",
                "QUEUED",
            )
        ],
        "seq long, url string, url_canon string, domain string,"
        " slot string, status string",
    )
    rows = engine_fetch(df, cfg, epoch_ts=0).collect()
    assert rows[0].status == 200
    assert b"/leaf" in bytes(rows[0].body)


# ------------------------------------------------------------------ proxy
class _Proxy(http.server.BaseHTTPRequestHandler):
    """Minimal forwarding proxy: absolute-URI GET, records what passed
    through (the loopback e2e evidence that routing actually happened)."""

    seen: list[str] = []

    def log_message(self, *a):
        pass

    def do_GET(self):
        _Proxy.seen.append(self.path)  # absolute URI per RFC 7230 §5.3.2
        try:
            # proxies disabled downstream so the forward is direct
            opener = urllib.request.build_opener(
                urllib.request.ProxyHandler({})
            )
            with opener.open(self.path, timeout=10) as resp:
                body = resp.read()
                self.send_response(resp.status)
                self.send_header("Content-Type", "text/plain")
                self.send_header("X-Via-Proxy", "1")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)
        except Exception as e:  # noqa: BLE001
            self.send_response(502)
            self.send_header("Content-Length", "0")
            self.end_headers()


@pytest.fixture()
def origin_and_proxy():
    origin = http.server.ThreadingHTTPServer(("127.0.0.1", 0), _Echo)
    proxy = http.server.ThreadingHTTPServer(("127.0.0.1", 0), _Proxy)
    _Proxy.seen = []
    for srv in (origin, proxy):
        threading.Thread(target=srv.serve_forever, daemon=True).start()
    yield (
        f"http://127.0.0.1:{origin.server_address[1]}",
        f"http://127.0.0.1:{proxy.server_address[1]}",
    )
    origin.shutdown()
    proxy.shutdown()


def test_proxy_routing_batch_default(spark, origin_and_proxy):
    origin, proxy = origin_and_proxy
    url = f"{origin}/hello"
    out = http_fetch(
        _reqs(spark, [url]), timeout_s=10.0, proxy=proxy
    ).collect()
    assert out[0].status == 200 and bytes(out[0].body) == b"hello-tls"
    assert url in _Proxy.seen  # the request really crossed the proxy


def test_proxy_meta_override_and_direct(spark, origin_and_proxy):
    """Per-request proxy column overrides the batch default; rows with a
    NULL proxy column fall back to it (meta['proxy'] semantics)."""
    origin, proxy = origin_and_proxy
    df = spark.createDataFrame(
        [
            (b"a", f"{origin}/hello", "127.0.0.1", proxy),
            (b"b", f"{origin}/auth", "127.0.0.1", None),
        ],
        "fp binary, url string, slot string, prx string",
    )
    out = {
        bytes(r.fp): r
        for r in http_fetch(
            df, timeout_s=10.0, proxy="", proxy_col="prx"
        ).collect()
    }
    assert out[b"a"].status == 200 and out[b"b"].status == 200
    assert f"{origin}/hello" in _Proxy.seen  # row a went via proxy
    assert f"{origin}/auth" not in _Proxy.seen  # row b went direct ("")


# ------------------------------------------------------------- basic auth
def test_engine_fetch_injects_basic_auth_scoped_to_domain(spark, origin_and_proxy):
    """cfg.http_user/http_pass → Authorization: Basic, sent ONLY to
    http_auth_domain (and subdomains) like upstream HttpAuthMiddleware —
    localhost and 127.0.0.1 hit the same server but only the configured
    domain gets credentials."""
    origin, _ = origin_and_proxy
    port = origin.rsplit(":", 1)[1]
    cfg = CrawlConfig(
        fetch_backend="http",
        download_timeout_s=10.0,
        http_user="bob",
        http_pass="s3cret",
        http_auth_domain="127.0.0.1",
    )
    df = spark.createDataFrame(
        [
            (1, f"{origin}/auth", f"{origin}/auth", "127.0.0.1", "127.0.0.1", "QUEUED"),
            (2, f"http://localhost:{port}/auth", f"http://localhost:{port}/auth",
             "localhost", "localhost", "QUEUED"),
        ],
        "seq long, url string, url_canon string, domain string,"
        " slot string, status string",
    )
    rows = {r.domain: r for r in engine_fetch(df, cfg, epoch_ts=0).collect()}
    expected = base64.b64encode(b"bob:s3cret").decode()
    assert bytes(rows["127.0.0.1"].body) == f"auth=Basic {expected}".encode()
    assert bytes(rows["localhost"].body) == b"auth="  # out of scope: no leak
