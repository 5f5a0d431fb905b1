"""Real network fetch path (SURVEY §2.1 S2/S3; ref:
core/downloader/handlers/http11.py ≈L40).

The round-1 gap: the fetch stage was a documented seam with only the
synthetic in-sandbox fetcher behind it. This module is the production
operator: popped frontier rows → ``mapInPandas`` → per-partition thread
pool issuing real HTTP requests. Two transports (``transport=``):
"h1" — stdlib ``urllib`` HTTP/1.1, one connection per request; "h2c" —
the from-scratch HTTP/2 cleartext client (operators/http2.py, S3): ONE
multiplexed connection per authority, pooled worker-globally.

Semantics mirrored from the reference downloader:

- redirects are NOT followed — the 30x response is returned with its
  Location header and the ENGINE re-queues the child request
  (RedirectMiddleware, SEMANTICS 7), exactly like the reference's
  handler/middleware split;
- per-slot concurrency is capped inside each partition with per-slot
  semaphores (CONCURRENT_REQUESTS_PER_DOMAIN); politeness DELAY stays in
  the engine's watermark join — the fetcher only bounds parallelism;
- DOWNLOAD_MAXSIZE / DOWNLOAD_TIMEOUT analogs truncate / fail a request
  without killing the batch; every failure comes back as a row with
  ``error`` set, never an exception (ref: errback path).

Scale shape: at cluster scale call ``repartition_by_slot`` first so a
slot's cap is enforced once, not once per partition; hot slots stay
bounded by the semaphore and everything else in the partition proceeds —
the thread pool is the natural async substrate for latency-bound I/O
(32 threads/partition ≈ 32-way overlap with zero CPU cost while blocked).
"""

from __future__ import annotations

import concurrent.futures as cf
import ssl
import threading
import time
import urllib.error
import urllib.request
from collections import defaultdict
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

FETCH_SCHEMA = T.StructType(
    [
        T.StructField("fp", T.BinaryType()),
        T.StructField("url", T.StringType()),
        T.StructField("slot", T.StringType()),
        T.StructField("status", T.IntegerType()),
        T.StructField("body", T.BinaryType()),
        T.StructField("content_type", T.StringType()),
        T.StructField("content_encoding", T.StringType()),
        T.StructField("location", T.StringType()),
        T.StructField("set_cookie", T.ArrayType(T.StringType())),
        T.StructField("latency_ms", T.LongType()),
        T.StructField("truncated", T.BooleanType()),
        T.StructField("error", T.StringType()),
        # RFC 9111 cache metadata (HttpCacheMiddleware RFC2616 policy;
        # ref: extensions/httpcache.py::RFC2616Policy ≈L120): validators
        # + freshness computed AT FETCH TIME (the worker holds the raw
        # headers and the response wall-clock, so the JVM replay side
        # only ever compares two longs)
        T.StructField("etag", T.StringType()),
        T.StructField("last_modified", T.StringType()),
        T.StructField("fetched_wall", T.LongType()),  # unix secs
        T.StructField("fresh_until", T.LongType()),  # unix secs; -1 = no-store
        # True when the response carried EXPLICIT freshness info
        # (Cache-Control max-age/no-cache/no-store, or Expires) — a 304
        # without it inherits the stored entry's lifetime on merge
        # (RFC 9111 §4.3.4: update stored headers, then recompute)
        T.StructField("fresh_explicit", T.BooleanType()),
    ]
)


def cache_freshness(lower: dict, now: float) -> tuple:
    """(etag, last_modified, fetched_wall, fresh_until, explicit) from
    lowercase response headers — the RFC 9111 freshness-lifetime
    computation the reference's RFC2616Policy performs
    (extensions/httpcache.py ≈L150): max-age beats Expires beats the
    Last-Modified heuristic (10% of age, capped at a day); ``no-store``
    → fresh_until = -1 (never persisted); ``no-cache`` / no information
    → lifetime 0 (stored, but every replay must revalidate).
    ``explicit`` is True when the response itself stated a freshness
    directive (max-age / no-cache / no-store / Expires) — a 304 that
    carries none inherits the stored entry's lifetime at merge time
    (RFC 9111 §4.3.4: stored headers persist unless the 304 overrides
    them)."""
    import email.utils
    import re as _re

    etag = lower.get("etag")
    last_mod = lower.get("last-modified")
    cc = (lower.get("cache-control") or "").lower()
    if "no-store" in cc:
        return etag, last_mod, int(now), -1, True

    def _http_date(v):
        try:
            return email.utils.parsedate_to_datetime(v).timestamp()
        except Exception:
            return None

    date = _http_date(lower.get("date") or "") or now
    lifetime = None
    explicit = False
    m = _re.search(r"max-age=(\d+)", cc)
    if m:
        lifetime = int(m.group(1))
        explicit = True
    if "no-cache" in cc:
        lifetime = 0
        explicit = True
    if lifetime is None and "expires" in lower:
        exp = _http_date(lower["expires"])
        lifetime = max(0, int(exp - date)) if exp is not None else 0
        explicit = True
    if lifetime is None and last_mod is not None:
        lm = _http_date(last_mod)
        if lm is not None:
            lifetime = min(max(0, int(0.1 * (date - lm))), 86_400)
    if lifetime is None:
        lifetime = 0
    return etag, last_mod, int(now), int(now) + lifetime, explicit


class _NoRedirect(urllib.request.HTTPRedirectHandler):
    """Return the 30x itself instead of following it (the engine owns
    redirect semantics, like RedirectMiddleware does upstream)."""

    def redirect_request(self, req, fp, code, msg, headers, newurl):
        return None


#: per-worker cache of verified-TLS contexts keyed by CA-bundle path
#: (None = system trust store); building a context loads and parses the
#: bundle, so do it once per worker, not once per request
_SSL_CTX: dict[str | None, ssl.SSLContext] = {}
_SSL_CTX_LOCK = threading.Lock()


def _ssl_context(ca_file: str | None) -> ssl.SSLContext:
    with _SSL_CTX_LOCK:
        ctx = _SSL_CTX.get(ca_file)
        if ctx is None:
            # create_default_context = verification ON (CERT_REQUIRED +
            # hostname check) — a handshake against an untrusted peer
            # fails into the error row, never a silent insecure fetch
            ctx = ssl.create_default_context(cafile=ca_file)
            _SSL_CTX[ca_file] = ctx
    return ctx


def _fetch_one(
    url: str,
    timeout_s: float,
    maxsize: int,
    user_agent: str,
    extra_headers: dict | None = None,
    ca_file: str | None = None,
    proxy: str | None = None,
) -> tuple[int, bytes, dict, list, bool, str | None]:
    """→ (status, body, headers, set_cookie, truncated, error). Never
    raises. ``extra_headers`` carries per-request headers the middleware
    chain attached (Referer under REFERRER_POLICY, Cookie from the slot
    jar, Authorization from HttpAuth). ``set_cookie`` is the FULL list of
    Set-Cookie header lines — a plain dict would collapse the (legal,
    common) duplicates.

    ``ca_file``: PEM CA bundle for https verification (None = system
    store). ``proxy``: None = environment proxies (upstream
    HttpProxyMiddleware's getproxies() fallback), "" = proxies disabled,
    else the proxy URL for both schemes (meta['proxy'] analog)."""
    if url.startswith("ftp://"):
        # per-scheme handler dispatch (S4, ref handlers/__init__.py
        # ≈L20): ftp rows ride the same thread pool / fetch_log path
        from .handlers import ftp_fetch_one

        status, body, truncated, error = ftp_fetch_one(url, timeout_s, maxsize)
        return status, body, {}, [], truncated, error
    from ..functions.http import accept_encoding_header

    headers = {"User-Agent": user_agent,
               "Accept-Encoding": accept_encoding_header()}
    if extra_headers:
        headers.update(extra_headers)
    req = urllib.request.Request(url, headers=headers)
    handlers: list = [_NoRedirect()]
    if url.startswith("https:") or (proxy or "").startswith("https:"):
        handlers.append(
            urllib.request.HTTPSHandler(context=_ssl_context(ca_file))
        )
    if proxy is not None:
        handlers.append(
            urllib.request.ProxyHandler(
                {"http": proxy, "https": proxy} if proxy else {}
            )
        )
    opener = urllib.request.build_opener(*handlers)
    try:
        with opener.open(req, timeout=timeout_s) as resp:
            body = resp.read(maxsize + 1)
            truncated = len(body) > maxsize
            sc = resp.headers.get_all("Set-Cookie") or []
            return resp.status, body[:maxsize], dict(resp.headers), sc, truncated, None
    except urllib.error.HTTPError as e:  # 30x/4xx/5xx: still a response
        body = e.read(maxsize + 1) if e.fp else b""
        sc = e.headers.get_all("Set-Cookie") or []
        return e.code, body[:maxsize], dict(e.headers), sc, len(body) > maxsize, None
    except Exception as e:  # noqa: BLE001 — DNS/conn/timeout → error row
        return 0, b"", {}, [], False, f"{type(e).__name__}: {e}"


#: worker-process-global h2 connection pools (like the ipslots resolver
#: memo), one per CA bundle: one connection per authority inside each,
#: reused across Arrow batches for the lifetime of the Python worker.
#: Lock: the fetch thread pool races the lazy init (32 threads, first
#: batch).
_H2_POOLS: dict[str | None, object] = {}
_H2_POOL_LOCK = threading.Lock()


def _fetch_one_h2(
    url: str,
    timeout_s: float,
    maxsize: int,
    user_agent: str,
    extra_headers: dict | None = None,
    ca_file: str | None = None,
) -> tuple[int, bytes, dict, list, bool, str | None]:
    """S3 transport: same contract as ``_fetch_one`` over one multiplexed
    h2 connection per authority (operators/http2.py) — cleartext
    prior-knowledge for http URLs, verified TLS + ALPN for https. Pools
    are cached per CA bundle (ca_file is engine-constant config, but a
    long-lived worker may serve sessions with different trust roots)."""
    with _H2_POOL_LOCK:
        pool = _H2_POOLS.get(ca_file)
        if pool is None:
            from .http2 import H2Pool

            pool = _H2_POOLS[ca_file] = H2Pool(timeout_s, ca_file=ca_file)
    from ..functions.http import accept_encoding_header

    headers = {"user-agent": user_agent,
               "accept-encoding": accept_encoding_header()}
    if extra_headers:
        headers.update({k.lower(): v for k, v in extra_headers.items()})
    return pool.fetch(url, headers, maxsize)


def http_fetch(
    requests: DataFrame,
    url_col: str = "url",
    slot_col: str = "slot",
    concurrent_per_slot: int = 8,
    pool_size: int = 32,
    timeout_s: float = 30.0,
    maxsize: int = 10 * 1024 * 1024,  # DOWNLOAD_MAXSIZE flavor
    user_agent: str = "scrapy-spark/2.0",
    repartition_by_slot: bool = False,
    headers_col: str | None = None,
    key_col: str = "fp",
    transport: str = "h1",
    ca_file: str | None = None,
    proxy: str | None = None,
    proxy_col: str | None = None,
) -> DataFrame:
    """Fetch every row's URL; returns FETCH_SCHEMA rows 1:1 with input.

    ``repartition_by_slot=True`` co-locates each politeness slot in one
    partition so the per-slot cap is global — required on a multi-
    executor cluster, unnecessary in one-partition tests.

    ``headers_col`` names an optional map<string,string> column of
    per-request headers (Referer, Cookie, …) merged over the defaults.

    ``key_col`` names the binary column echoed back as ``fp`` in the
    output — pass a per-ROW unique key (not the fingerprint) when the
    batch may contain duplicate fps (dont_filter requests).

    ``transport``: "h1" (thread-pooled stdlib HTTP/1.1, default) or
    "h2c" (S3: one multiplexed HTTP/2 cleartext connection per
    authority — operators/http2.py).

    ``ca_file``/``proxy`` follow ``_fetch_one``'s semantics (h1 only —
    the h2c transport is cleartext prior-knowledge, no TLS or CONNECT
    tunneling); ``proxy_col`` names an optional per-request proxy-URL
    column (meta['proxy'] analog) that overrides ``proxy``."""
    if repartition_by_slot:
        requests = requests.repartition(F.col(slot_col))
    sel = [
        F.col(key_col).alias("fp"),
        F.col(url_col).alias("url"),
        F.col(slot_col).alias("slot"),
    ]
    if headers_col is not None:
        sel.append(F.col(headers_col).alias("__hdrs"))
    if proxy_col is not None:
        sel.append(F.col(proxy_col).alias("__proxy"))
    cols = requests.select(*sel)

    def _run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        sems: dict[str, threading.Semaphore] = defaultdict(
            lambda: threading.Semaphore(concurrent_per_slot)
        )

        def work(fp, url, slot, extra, row_proxy):
            # Arrow maps arrive as list-of-(k,v)-tuples; null rows as
            # None/NaN — normalize to dict | None
            if extra is not None and not isinstance(extra, dict):
                extra = dict(extra) if not isinstance(extra, float) else None
            if not isinstance(row_proxy, str):
                row_proxy = None  # NaN / None → fall back to batch proxy
            sem = sems[slot]
            with sem:
                t0 = time.monotonic()
                # non-HTTP schemes dispatch BEFORE the transport split:
                # ftp:// must reach the FTP handler under every
                # transport (the h2 pool would otherwise dial the host
                # as a bogus cleartext h2 peer)
                if transport == "h2c" and not url.startswith("ftp://"):
                    eff_proxy = row_proxy if row_proxy is not None else proxy
                    if eff_proxy:
                        # proxy routing is h1-only (no CONNECT tunneling
                        # in the h2 client) — surface an error row
                        # instead of silently going direct, which would
                        # leak traffic the config routed through a proxy
                        status, body, headers, set_cookie, truncated, error = (
                            0, b"", {}, [], False,
                            "ProxyUnsupported: proxy routing requires "
                            "transport='h1'",
                        )
                    else:
                        status, body, headers, set_cookie, truncated, error = (
                            _fetch_one_h2(
                                url, timeout_s, maxsize, user_agent, extra,
                                ca_file=ca_file,
                            )
                        )
                else:
                    status, body, headers, set_cookie, truncated, error = (
                        _fetch_one(
                            url, timeout_s, maxsize, user_agent, extra,
                            ca_file=ca_file,
                            proxy=row_proxy if row_proxy is not None else proxy,
                        )
                    )
                latency = int((time.monotonic() - t0) * 1000)
            lower = {k.lower(): v for k, v in headers.items()}
            etag, last_mod, fetched_wall, fresh_until, fresh_explicit = (
                cache_freshness(lower, time.time())
            )
            return (
                fp,
                url,
                slot,
                status,
                body,
                lower.get("content-type"),
                lower.get("content-encoding"),
                lower.get("location"),
                set_cookie,
                latency,
                truncated,
                error,
                etag,
                last_mod,
                fetched_wall,
                fresh_until,
                fresh_explicit,
            )

        with cf.ThreadPoolExecutor(max_workers=pool_size) as pool:
            for pdf in batches:
                hdr_lists = (
                    pdf["__hdrs"].tolist()
                    if "__hdrs" in pdf.columns
                    else [None] * len(pdf)
                )
                proxy_list = (
                    pdf["__proxy"].tolist()
                    if "__proxy" in pdf.columns
                    else [None] * len(pdf)
                )
                futs = [
                    pool.submit(work, bytes(fp), url, slot, hdrs, prx)
                    for fp, url, slot, hdrs, prx in zip(
                        pdf["fp"], pdf["url"], pdf["slot"], hdr_lists,
                        proxy_list,
                    )
                ]
                rows = [f.result() for f in futs]
                yield pd.DataFrame(
                    rows, columns=[f.name for f in FETCH_SCHEMA.fields]
                )

    return cols.mapInPandas(_run, schema=FETCH_SCHEMA)


# ----------------------------------------------------- engine integration
@F.pandas_udf(T.StringType())
def _urljoin_udf(urls: pd.Series, locations: pd.Series) -> pd.Series:
    """Resolve a Location header against the request URL — full RFC 3986
    reference resolution (relative paths included), like the reference's
    ``response.urljoin`` in RedirectMiddleware."""
    from urllib.parse import urljoin

    return pd.Series(
        [
            urljoin(u, loc) if loc else None
            for u, loc in zip(urls, locations)
        ]
    )


def is_image_response() -> F.Column:
    """Content-type predicate marking a 200 body as an image payload
    (→ ITEMS row via the ImagesPipeline analog). Shared by the live
    fetch shaping below and the httpcache replay path so a cached
    response classifies identically to the fetch it replays."""
    return F.col("content_type").startswith("image/") | (
        # the deterministic sandbox codecs carry their own magic, served
        # as octet-stream by plain file servers
        F.col("content_type") == "application/octet-stream"
    )


def engine_fetch(to_fetch: DataFrame, cfg, epoch_ts: int) -> DataFrame:
    """Adapt ``http_fetch`` to the engine's fetched-batch contract
    (operators/fetch.py::synthetic_fetch shape): adds image_id (the
    url_canon of image responses — their payload becomes the item),
    redirect_to (Location resolved against the request URL), status,
    latency_ms, fetched_at, plus the body columns the html/items branches
    consume. Network errors surface as status 0 (retryable, like the
    reference's connection-error retry path).

    Per-request headers: the frontier's ``referer`` column (U3, applied
    by the engine under REFERRER_POLICY) is sent as the Referer header;
    an optional ``cookie_header`` column (per-slot jar fold, cookies
    middleware) as Cookie; basic-auth Authorization when cfg.http_user
    is set, gated to cfg.http_auth_domain and its subdomains exactly as
    upstream HttpAuthMiddleware (credentials never leak to other hosts;
    a None auth-domain sends everywhere — the documented legacy mode).
    Proxy routing (HttpProxyMiddleware): per-request meta['proxy'] wins,
    then cfg.http_proxy, then the environment (None). Proxying is
    h1-only (the h2 client has no CONNECT tunneling): cfg.http_proxy
    with transport='h2c' fails fast here, and a per-request
    meta['proxy'] row under h2c surfaces as a status-0 error row rather
    than silently bypassing the proxy."""
    if cfg.transport == "h2c" and getattr(cfg, "http_proxy", None):
        raise ValueError(
            "http_proxy requires transport='h1' — the h2 client has no "
            "CONNECT tunneling"
        )
    hdr_pairs = []
    if "referer" in to_fetch.columns:
        hdr_pairs.append(("Referer", F.col("referer")))
    if "cookie_header" in to_fetch.columns:
        hdr_pairs.append(("Cookie", F.col("cookie_header")))
    # conditional-GET validators (RFC2616 cache policy revalidation;
    # ref: extensions/httpcache.py ≈L180 — the policy attaches
    # If-None-Match / If-Modified-Since from the stale cached response;
    # null on non-revalidation rows ⇒ map_filter drops the header)
    if "cache_etag" in to_fetch.columns:
        hdr_pairs.append(("If-None-Match", F.col("cache_etag")))
    if "cache_last_modified" in to_fetch.columns:
        hdr_pairs.append(("If-Modified-Since", F.col("cache_last_modified")))
    if getattr(cfg, "http_user", None):
        import base64

        cred = base64.b64encode(
            f"{cfg.http_user}:{cfg.http_pass or ''}".encode()
        ).decode()
        auth_domain = getattr(cfg, "http_auth_domain", None)
        in_scope = (
            (F.col("domain") == F.lit(auth_domain))
            | F.col("domain").endswith(f".{auth_domain}")
            if auth_domain
            else F.lit(True)
        )
        hdr_pairs.append(
            ("Authorization", F.when(in_scope, F.lit(f"Basic {cred}")))
        )
    headers_col = None
    if hdr_pairs:
        # map of the non-null headers only (map_filter drops null values)
        m = F.map_filter(
            F.map_from_arrays(
                F.array(*[F.lit(k) for k, _ in hdr_pairs]),
                F.array(*[v for _, v in hdr_pairs]),
            ),
            lambda k, v: v.isNotNull(),
        )
        to_fetch = to_fetch.withColumn("__req_headers", m)
        headers_col = "__req_headers"
    # Join the fetch results back on the UNIQUE row key, never on fp: a
    # popped batch may carry duplicate fps (dont_filter requests — e.g.
    # redirect children of dont_filter seeds converging on one URL, which
    # upstream fetches once per request too) and an fp-keyed join would
    # multiply k fetches into k×k rows.
    to_fetch = to_fetch.withColumn(
        "__key", F.encode(F.col("seq").cast("string"), "UTF-8")
    )
    proxy_col = None
    if "meta_json" in to_fetch.columns:
        from ..functions.meta import meta_get

        to_fetch = to_fetch.withColumn(
            "__meta_proxy", meta_get(F.col("meta_json"), "proxy")
        )
        proxy_col = "__meta_proxy"
    raw = http_fetch(
        to_fetch,
        concurrent_per_slot=cfg.concurrent_per_domain,
        timeout_s=cfg.download_timeout_s,
        maxsize=cfg.download_maxsize,
        user_agent=cfg.user_agent,
        headers_col=headers_col,
        key_col="__key",
        transport=cfg.transport,
        ca_file=getattr(cfg, "tls_ca_file", None),
        proxy=getattr(cfg, "http_proxy", None),
        proxy_col=proxy_col,
    ).select(
        F.col("fp").alias("__key"), "status", "body", "content_type",
        "content_encoding", "location", "set_cookie", "latency_ms",
        "truncated", "etag", "last_modified", "fetched_wall", "fresh_until",
        "fresh_explicit",
    )
    # the frontier's own `status` column ('QUEUED') is superseded by the
    # HTTP status, exactly as synthetic_fetch overwrites it
    joined = (
        to_fetch.drop(
            "status", "__req_headers", "__meta_proxy",
            "cache_etag", "cache_last_modified",
        )
        .join(raw, "__key")
        .drop("__key")
    )
    is_image = is_image_response()
    return (
        joined.withColumn(
            "redirect_to", _urljoin_udf(F.col("url"), F.col("location"))
        )
        .withColumn(
            "image_id",
            F.when((F.col("status") == 200) & is_image, F.col("url_canon")),
        )
        .withColumn("fetched_at", (F.lit(epoch_ts) + F.col("latency_ms")).cast("long"))
    )


@F.pandas_udf(T.StringType())
def decode_text_udf(body: pd.Series, ctype: pd.Series, cenc: pd.Series) -> pd.Series:
    """body bytes → unicode via the C7 decompress + C6 charset-detect
    pipeline (functions/http.py), Arrow-batched. Shared by the HTML link
    path and the robots.txt fetch path."""
    from ..functions.http import decode_response_text

    return pd.Series(
        [
            decode_response_text(bytes(b) if b is not None else b"", t, e)
            for b, t, e in zip(body, ctype, cenc)
        ]
    )


def html_pages(done: DataFrame) -> DataFrame:
    """text/html rows → decoded unicode ``html`` column. When the engine
    already decoded the bodies (the meta-refresh pass caches an ``html``
    column on the epoch's fetched rows), reuse it — zero extra Arrow
    decode passes."""
    pages = done.filter(F.col("content_type").startswith("text/html"))
    if "html" in done.columns:
        return pages
    return pages.withColumn(
        "html",
        decode_text_udf(
            F.col("body"), F.col("content_type"), F.col("content_encoding")
        ),
    )


def fetch_robots(new_domain_urls: DataFrame, cfg) -> DataFrame:
    """Live robots.txt fetch for newly discovered domains (F2 × S2; ref:
    downloadermiddlewares/robotstxt.py ≈L60 — the middleware issues a
    real ``Request(scheme://netloc/robots.txt)`` per first-seen netloc).

    ``new_domain_urls`` is (domain, url) with one representative frontier
    URL per domain — the robots URL derives from ITS authority so a
    nonstandard port survives (the domain alone is only the hostname).
    Returns (domain, rules): decoded text for 200s, NULL otherwise —
    the gate treats NULL as allow-all, matching the reference's
    fetch-error behavior. Runs during the domain's one-epoch wait, so
    the next epoch's gate sees the rules with zero added latency."""
    reqs = new_domain_urls.select(
        F.encode(F.col("domain"), "UTF-8").alias("fp"),
        F.concat(
            F.regexp_extract(F.col("url"), r"^(https?://[^/]+)", 1),
            F.lit("/robots.txt"),
        ).alias("url"),
        F.col("domain").alias("slot"),
    )
    raw = http_fetch(
        reqs,
        concurrent_per_slot=cfg.concurrent_per_domain,
        timeout_s=cfg.download_timeout_s,
        maxsize=cfg.download_maxsize,
        user_agent=cfg.user_agent,
        transport=cfg.transport,
        ca_file=getattr(cfg, "tls_ca_file", None),
        proxy=getattr(cfg, "http_proxy", None),
    )
    return raw.select(
        F.col("slot").alias("domain"),
        F.when(
            F.col("status") == 200,
            decode_text_udf(
                F.col("body"), F.col("content_type"), F.col("content_encoding")
            ),
        ).alias("rules"),
    )


def payload_items(done_images: DataFrame, epoch: int) -> DataFrame:
    """Image responses → ITEMS-shaped rows: decode the fetched bytes with
    the repo codec (Pillow on a real cluster, imaging.py `_HAS_PIL`) for
    (w, h, fmt, phash); undecodable payloads are dropped, as the
    reference's ImagesPipeline drops corrupt downloads."""
    from ..functions.imaging import decode_image, phash64
    from ..functions.meta import meta_get
    from ..plans import schemas

    # caption = the discovering page's alt/anchor text, carried through
    # the frontier as meta['caption'] (input_hint: image + caption pairs)
    cap = (
        meta_get(F.col("meta_json"), "caption")
        if "meta_json" in done_images.columns
        else F.lit(None).cast("string")
    )
    src = done_images.withColumn("__caption", cap).select(
        "image_id", "body", "fp", "__caption"
    )

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for iid, body, fp, cp in zip(
                pdf.image_id, pdf.body, pdf.fp, pdf["__caption"]
            ):
                try:
                    arr, fmt = decode_image(bytes(body))
                except (ValueError, NotImplementedError):
                    continue
                rows.append(
                    (
                        iid,
                        bytes(body),
                        int(arr.shape[1]),
                        int(arr.shape[0]),
                        fmt,
                        cp if isinstance(cp, str) else None,
                        phash64(arr),
                        bytes(fp),
                        epoch,
                    )
                )
            yield pd.DataFrame(
                rows, columns=[f.name for f in schemas.ITEMS.fields]
            )

    return src.mapInPandas(_decode, schema=schemas.ITEMS)


__all__ = [
    "http_fetch",
    "FETCH_SCHEMA",
    "engine_fetch",
    "html_pages",
    "fetch_robots",
    "decode_text_udf",
    "payload_items",
]
