"""Crawl configuration (SURVEY §2 settings surface).

Mirrors the reference's settings the engine actually reads
(ref: scrapy/settings/default_settings.py — defaults quoted per public
Scrapy 2.11 docs), as one frozen dataclass threaded through every operator.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field


@dataclass(frozen=True)
class CrawlConfig:
    # --- dedupe / fingerprinting -------------------------------------
    fingerprint_impl: str = "2.7"  # REQUEST_FINGERPRINTER_IMPLEMENTATION
    dupefilter_debug: bool = False  # DUPEFILTER_DEBUG

    # --- scheduling (ref: pqueues.py, spidermiddlewares/depth.py) ----
    depth_limit: int = 0  # DEPTH_LIMIT, 0 = unlimited
    depth_priority: int = 0  # DEPTH_PRIORITY (>0 BFS, <0 DFS-ish)
    queue_order: str = "lifo"  # memory queue default LIFO ⇒ DFS tie-break
    downloader_aware: bool = True  # SCHEDULER_PRIORITY_QUEUE choice

    # --- politeness / concurrency (ref: downloader/__init__.py) ------
    concurrent_requests: int = 16  # CONCURRENT_REQUESTS — global budget/epoch
    concurrent_per_domain: int = 8  # CONCURRENT_REQUESTS_PER_DOMAIN
    download_delay_ms: int = 0  # DOWNLOAD_DELAY (ms here; ref uses seconds)
    randomize_delay: bool = False  # RANDOMIZE_DOWNLOAD_DELAY — off for parity

    # --- fetch backend (ref: core/downloader/handlers — handler choice) --
    # "synthetic": deterministic fixture-join fetcher (parity/bench);
    # "http": real network fetch via operators/netfetch.py (thread-pooled
    # stdlib client, per-slot caps). Links then come from the fetched HTML
    # bodies (C6+C7+C13) and image payloads become items.
    fetch_backend: str = "synthetic"
    # Wire transport for the http backend (S3; ref: handlers/http2.py —
    # upstream selects the handler per DOWNLOAD_HANDLERS). "h1" =
    # thread-pooled stdlib HTTP/1.1; "h2c" = HTTP/2 cleartext prior-
    # knowledge, ONE multiplexed connection per authority
    # (operators/http2.py) — the politeness-heavy-host path.
    transport: str = "h1"
    download_timeout_s: float = 30.0  # DOWNLOAD_TIMEOUT
    download_maxsize: int = 10 * 1024 * 1024  # DOWNLOAD_MAXSIZE
    # DOWNLOAD_FAIL_ON_DATALOSS (upstream default True): a truncated body
    # (maxsize cut) is a download failure → retried like a transport
    # error; False passes the partial response through as a normal one
    # (upstream sets the 'dataloss' response flag instead)
    download_fail_on_dataloss: bool = True
    user_agent: str = "scrapy-spark/2.0"  # USER_AGENT
    # TLS trust root for https fetches: path to a PEM CA bundle, None =
    # the system store (ref: upstream's DOWNLOADER_CLIENTCONTEXTFACTORY /
    # Twisted trust root, handlers/http11.py ≈L40). Verification is
    # always ON — a failed handshake surfaces as an error row, retried
    # like any transport error.
    tls_ca_file: str | None = None
    # HTTP proxy for h1 fetches (ref: downloadermiddlewares/httpproxy.py
    # ≈L20): explicit setting wins; per-request meta['proxy'] overrides;
    # None falls back to the http_proxy/https_proxy environment like
    # upstream's getproxies(). "" disables env lookup entirely.
    http_proxy: str | None = None
    # Basic auth (ref: downloadermiddlewares/httpauth.py ≈L15): upstream
    # reads spider.http_user/http_pass and ONLY sends the header to
    # http_auth_domain (and subdomains) to avoid credential leaks.
    http_user: str | None = None
    http_pass: str | None = None
    http_auth_domain: str | None = None

    # --- link extraction regions (F8; ref: linkextractors/lxmlhtml.py
    # restrict_xpaths/restrict_css ≈L150). Applied on the http backend's
    # HTML link path: only anchors inside a matching region element are
    # extracted. CSS = simple-selector subset; XPath = the //tag /
    # [@attr='v'] / contains() subset (functions/linkextract.py).
    restrict_css: tuple = ()
    restrict_xpaths: tuple = ()
    # Treat <img src> as extractable links (upstream LinkExtractor
    # tags=['img'], attrs=['src']) — the image+caption harvest mode: the
    # img's alt text (or the enclosing anchor's text) rides the request
    # as meta['caption'] and persists with the fetched payload.
    extract_img_links: bool = False

    # --- sitemaps (S5; ref: spiders/sitemap.py::SitemapSpider ≈L15) ---
    # Engine-level SitemapSpider analog on the http backend: XML sitemap
    # responses feed the frontier — <urlset> locs become link candidates
    # (normal filter chain), <sitemapindex> locs become sitemap fetches
    # (bypassing LinkExtractor predicates, as upstream _parse_sitemap
    # requests do). With robots_source="http", ``Sitemap:`` lines in
    # fetched robots.txt seed sitemap fetches (sitemap_urls from
    # robots.txt, ref sitemap.py ≈L60). Default off for crawl parity.
    sitemap_follow: bool = False
    # regex filter on <sitemapindex> children (upstream sitemap_follow,
    # whose default [''] matches everything); empty = follow all
    sitemap_follow_patterns: tuple[str, ...] = ()

    # --- user hooks (U2; ref: core/downloadermw.py process_request /
    # process_response — the user-middleware slots of the chain) --------
    # DataFrame→DataFrame transforms at the INNERMOST middleware
    # position: ``pre_fetch_hook`` runs on the popped batch right before
    # the downloader (after the built-in Referer/Cookie folds, so it may
    # overwrite those columns; rows it filters out are not fetched and
    # consume no politeness delay — the short-circuit analog), and
    # ``post_fetch_hook`` on the fetched batch before outcome
    # classification (cache replays skip it, as responses short-circuited
    # by HttpCacheMiddleware skip downloader-ward middlewares upstream).
    # Hooks must preserve the batch contract columns; use Arrow/pandas
    # UDFs inside, never driver-side loops.
    pre_fetch_hook: Callable | None = None
    post_fetch_hook: Callable | None = None

    # --- cookies (ref: downloadermiddlewares/cookies.py ≈L30) ---------
    # COOKIES_ENABLED (upstream default True). Active on the http fetch
    # backend: per-slot jar state table, Set-Cookie → jar → Cookie header
    # (operators/cookies.py). The synthetic fetcher has no headers, so
    # the flag is a no-op there.
    cookies_enabled: bool = True

    # --- referer (ref: spidermiddlewares/referer.py ≈L250) ------------
    # REFERRER_POLICY: policy applied to every link candidate (parent
    # response URL → child request Referer header). One of
    # functions/referer.py::POLICIES; upstream default is scrapy-default
    # (no-referrer-when-downgrade, http(s) parents only).
    referrer_policy: str = "scrapy-default"

    # --- download slots (ref: downloader/__init__.py::get_slot_key ≈L105)
    # "domain": slot = request domain (upstream default). "ip": slot =
    # resolved IP (CONCURRENT_REQUESTS_PER_IP > 0 upstream) — vhosts that
    # share a server share one politeness slot; resolution is memoized
    # per-executor (operators/ipslots.py, J4 DNS cache).
    slot_key_mode: str = "domain"

    # --- robots (ref: downloadermiddlewares/robotstxt.py) ------------
    robotstxt_obey: bool = True  # ROBOTSTXT_OBEY (ref default False; our
    # engine defaults on because the north_rule names robots gating)
    robots_user_agent: str = "*"  # ROBOTSTXT_USER_AGENT fallback
    # Where rules come from. "table": the engine's robots fixture table
    # (synthetic backend / pre-seeded). "http": live-fetch
    # ``scheme://authority/robots.txt`` once per newly discovered slot
    # during its one-epoch robots wait (ref robotstxt.py ≈L60 issues a
    # real Request per first-seen netloc); fetched rules persist in the
    # store's ``robots_http`` table so resumes never re-fetch. Requires
    # fetch_backend="http".
    robots_source: str = "table"

    # --- filters (ref: spidermiddlewares/*) ---------------------------
    url_length_limit: int = 2083  # URLLENGTH_LIMIT
    allowed_domains: tuple[str, ...] = ()  # OffsiteMiddleware allow-list
    # LxmlLinkExtractor allow/deny URL regexes (ref: linkextractors/
    # lxmlhtml.py::_link_allowed ≈L90): with allow patterns set a URL must
    # re.search-match at least one; any deny match drops. Allow is checked
    # before deny, matching upstream's predicate order.
    allow_url_patterns: tuple[str, ...] = ()
    deny_url_patterns: tuple[str, ...] = ()
    deny_extensions: tuple[str, ...] = (
        # IGNORED_EXTENSIONS flavor (ref: linkextractors/__init__.py ≈L15)
        "7z", "apk", "avi", "bin", "bmp2", "css", "dmg", "doc", "docx",
        "exe", "flv", "gz", "iso", "js", "mkv", "mov", "mp3", "mp4",
        "pdf", "rar", "tar", "wav", "xls", "xlsx", "zip",
    )

    # --- retries (ref: downloadermiddlewares/retry.py) ----------------
    retry_times: int = 2  # RETRY_TIMES
    retry_http_codes: tuple[int, ...] = (500, 502, 503, 504, 522, 524, 408, 429)
    retry_priority_adjust: int = -1  # RETRY_PRIORITY_ADJUST

    # --- redirects (ref: downloadermiddlewares/redirect.py) -----------
    redirect_max_times: int = 20  # REDIRECT_MAX_TIMES
    redirect_priority_adjust: int = 2  # REDIRECT_PRIORITY_ADJUST
    # MetaRefreshMiddleware (redirect.py ≈L90): follow
    # <meta http-equiv=refresh> on 200 HTML responses like a redirect.
    # http backend only (the synthetic parity fetcher carries no HTML).
    metarefresh_enabled: bool = True  # METAREFRESH_ENABLED
    metarefresh_maxdelay: int = 100  # METAREFRESH_MAXDELAY (strict <)
    # METAREFRESH_IGNORE_TAGS — ["noscript"] since upstream's 2.11.2 fix
    metarefresh_ignore_tags: tuple[str, ...] = ("noscript",)

    # --- http cache (ref: extensions/httpcache.py; default off like
    # HTTPCACHE_ENABLED — cache replay skips politeness delay, so the
    # parity contract is defined with it disabled) --------------------
    httpcache_enabled: bool = False
    # HTTPCACHE_POLICY analog: "dummy" (DummyPolicy — every stored 200
    # replays unconditionally, the upstream default) or "rfc2616"
    # (RFC2616Policy — HTTP freshness: fresh entries replay, stale ones
    # with validators revalidate via conditional GET and a 304 serves
    # the stored body, no-store responses are never cached)
    httpcache_policy: str = "dummy"

    # --- autothrottle (ref: extensions/throttle.py; default off like
    # AUTOTHROTTLE_ENABLED — parity runs use fixed fixture delays) -----
    autothrottle_enabled: bool = False
    autothrottle_target_concurrency: float = 1.0  # AUTOTHROTTLE_TARGET_CONCURRENCY
    autothrottle_max_delay_ms: int = 60_000  # AUTOTHROTTLE_MAX_DELAY

    # --- epoch loop (ours; ST1/ST2) -----------------------------------
    epoch_quantum_ms: int = 1000  # virtual-clock step per epoch
    epoch_budget: int = 0  # 0 ⇒ derive: concurrent_requests × slots heuristic
    max_epochs: int = 1000
    close_itemcount: int = 0  # CLOSESPIDER_ITEMCOUNT, 0 = off
    close_pagecount: int = 0  # CLOSESPIDER_PAGECOUNT
    close_errorcount: int = 0  # CLOSESPIDER_ERRORCOUNT (terminal failures)
    # Per-domain page budget (beyond upstream; Heritrix maxDocsPerHost /
    # Nutch generate.max.count analog): once a slot's cumulative pops
    # reach this, its remaining frontier rows are dropped like robots
    # denials (metric domain_budget/dropped). 0 = off. Enforced at epoch
    # granularity (may overshoot by one epoch's slot concurrency).
    domain_page_budget: int = 0
    # CLOSESPIDER_TIMEOUT, but on the VIRTUAL clock (ST2) so runs stay
    # deterministic: close once e·epoch_quantum has covered this many
    # seconds of simulated crawl time. 0 = off.
    close_timeout_s: float = 0.0

    # --- physical tuning ----------------------------------------------
    frontier_partitions: int = 32  # P for pmod(xxhash64(fp), P) layout
    bloom_fpr: float = 1e-3
    bloom_enabled: bool = True
    # seen-set probe structure: "bloom" (default; OR-mergeable bit arrays)
    # or "cuckoo" (operators/cuckoo.py — supports per-key DELETION for
    # recrawl/expiry policies, lower FPR at similar space), or
    # "cuckoo-disk" (operators/diskfilter.py — EXECUTOR-RESIDENT shards
    # on shared storage, probe/absorb/delete shard-owner-side, driver
    # holds only the manifest: the 10^10-key design point where a whole-
    # filter broadcast would be ~GBs per epoch). "none" or
    # bloom_enabled=False disables the prefilter; the exact anti-join is
    # always the correctness bar either way.
    seen_filter: str = "bloom"
    # recrawl TTL: expire url_seen rows ttl epochs after insertion so the
    # URL re-enters the frontier on its next sighting (0 = never expire —
    # upstream behavior). Pairs naturally with seen_filter="cuckoo"
    # (per-key delete); the bloom path rebuilds from the retained set.
    seen_ttl_epochs: int = 0
    arrow_batch_urls: int = 200_000  # maxRecordsPerBatch for URL-only stages
    arrow_batch_images: int = 10_000  # for binary-payload stages

    extra: dict = field(default_factory=dict, compare=False)
