"""scrapy_spark — a from-scratch, PySpark-native crawl-frontier engine.

Re-creates the crawl semantics of the reference (singhmaneesh/scrapy, a fork
of upstream Scrapy — see SURVEY.md §0 for provenance) as declarative Spark
dataflow over frontier tables:

- request fingerprinting: SHA1 over canonicalized URL (ref:
  scrapy/utils/request.py::fingerprint ≈L75) → ``functions.fingerprint``
- RFPDupeFilter seen-set (ref: scrapy/dupefilters.py::RFPDupeFilter ≈L32)
  → ``operators.dedupe`` (bloom prefilter + exact LEFT ANTI join)
- ScrapyPriorityQueue / DownloaderAwarePriorityQueue pops (ref:
  scrapy/pqueues.py ≈L40/≈L150) → ``operators.pop`` (window-ranked,
  two-phase skew-proof)
- per-domain politeness / download delay (ref:
  scrapy/core/downloader/__init__.py::Slot ≈L20) → ``operators.politeness``
- robots.txt gating (ref: scrapy/downloadermiddlewares/robotstxt.py ≈L30)
  → ``operators.robots_gate`` + ``functions.robots`` (RFC 9309 parser)
- the Twisted engine tick (ref: scrapy/core/engine.py::_next_request ≈L220)
  → ``streaming.engine`` batch-epoch loop with a deterministic virtual clock.

Everything is DataFrame/Catalyst-first; per-row logic lives only in
vectorized pandas/Arrow UDFs. No code is copied from the reference; all
``ref:`` citations are behavioral parity pointers (line numbers estimated vs
public Scrapy 2.11 — the reference mount was empty at build time, SURVEY §0).
"""

__version__ = "0.1.0"
