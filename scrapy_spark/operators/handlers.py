"""Per-scheme download handlers (SURVEY §2.1 S4; ref: the
``DOWNLOAD_HANDLERS`` registry, scrapy/core/downloader/handlers/
__init__.py::DownloadHandlers ≈L20, with per-scheme implementations in
http11.py / ftp.py / file.py / datauri.py / s3.py).

The Spark realization is column dispatch: a ``scheme`` column derived
from the URL routes each popped row to its handler stage.

- ``http``/``https`` → the fetch stage (synthetic in-sandbox, aiohttp
  mapInArrow on cluster — operators/fetch.py is that seam)
- ``file``/``s3a``  → ``spark.read.format("binaryFile")`` natively; no
  custom handler needed (documented, not wired — no such URLs in the
  crawl fixtures)
- ``data``          → fully local decode, implemented HERE as a real
  vectorized handler (ref datauri.py ≈L15): payload comes out of the URL
  itself, status 200, zero latency — no network even on a real cluster.
- ``ftp``           → ``ftp_fetch_one`` (ref ftp.py ≈L40): ftplib RETR
  inside the same netfetch thread pool as http — ``_fetch_one``
  dispatches on the scheme, so ftp URLs flow through ``http_fetch`` and
  the engine's fetch_log like any other request.
"""

from __future__ import annotations

import base64
import binascii
from urllib.parse import unquote_to_bytes

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf


def with_scheme(df: DataFrame, url_col: str = "url") -> DataFrame:
    """Lowercased URL scheme column ('' when absent) — pure Column expr."""
    return df.withColumn(
        "scheme",
        F.lower(F.regexp_extract(F.col(url_col), r"^([a-zA-Z][a-zA-Z0-9+.-]*):", 1)),
    )


def decode_data_uri(url: str) -> tuple[bytes | None, str]:
    """data:[<mediatype>][;base64],<data> → (payload bytes | None, mime).

    Returns (None, '') on malformed input — the fetch stage maps that to a
    4xx the same way the reference raises for bad data URIs."""
    if not url.startswith("data:"):
        return None, ""
    rest = url[5:]
    head, sep, payload = rest.partition(",")
    if not sep:
        return None, ""
    mime = "text/plain"
    is_b64 = False
    if head:
        parts = head.split(";")
        if parts[0]:
            mime = parts[0].lower()
        is_b64 = parts[-1].lower() == "base64"
    try:
        if is_b64:
            return (
                base64.b64decode(payload + "=" * (-len(payload) % 4), validate=True),
                mime,
            )
        return unquote_to_bytes(payload), mime
    except (binascii.Error, ValueError):
        return None, ""


_DATA_SCHEMA = T.StructType(
    [
        T.StructField("bytes", T.BinaryType()),
        T.StructField("mime", T.StringType()),
        T.StructField("status", T.IntegerType()),
    ]
)


@pandas_udf(_DATA_SCHEMA)
def data_uri_udf(urls: pd.Series) -> pd.DataFrame:
    rows = []
    for u in urls:
        payload, mime = decode_data_uri(u or "")
        rows.append((payload, mime, 200 if payload is not None else 400))
    return pd.DataFrame(rows, columns=["bytes", "mime", "status"])


def ftp_fetch_one(
    url: str, timeout_s: float, maxsize: int
) -> tuple[int, bytes, bool, str | None]:
    """FTP download handler (ref: handlers/ftp.py ≈L40): RETR the path of
    an ``ftp://[user[:pass]@]host[:port]/path`` URL. → (status, body,
    truncated, error). Status mapping mirrors upstream's
    CODE_MAPPING: permanent-error 550 (no such file) → 404, other
    permanent errors → 403-class response rows; transport failures →
    status 0 error rows (retryable), exactly like the http path. The
    body is capped at ``maxsize`` after transfer — FTP has no range
    header, and the callback API cannot abort mid-RETR cleanly."""
    import ftplib
    import io
    from urllib.parse import unquote, urlparse

    p = urlparse(url)
    try:
        ftp = ftplib.FTP()
        ftp.connect(p.hostname or "", p.port or 21, timeout=timeout_s)
        ftp.login(unquote(p.username or "anonymous"), unquote(p.password or ""))
        buf = io.BytesIO()
        ftp.retrbinary(f"RETR {unquote(p.path) or '/'}", buf.write)
        try:
            ftp.quit()
        except Exception:  # noqa: BLE001 — transfer done; QUIT is courtesy
            ftp.close()
        body = buf.getvalue()
        return 200, body[:maxsize], len(body) > maxsize, None
    except ftplib.error_perm as e:
        code = str(e)[:3]
        status = 404 if code == "550" else 403
        return status, str(e).encode(), False, None
    except Exception as e:  # noqa: BLE001 — conn/timeout → retryable row
        return 0, b"", False, f"{type(e).__name__}: {e}"


def fetch_data_uris(popped: DataFrame, epoch_ts: int) -> DataFrame:
    """The data: handler stage: rows whose scheme is ``data`` never touch
    the network path — payload decoded in one Arrow pass, latency 0."""
    return (
        popped.withColumn("__d", data_uri_udf(F.col("url")))
        .withColumn("bytes", F.col("__d.bytes"))
        .withColumn("mime", F.col("__d.mime"))
        .withColumn("status", F.col("__d.status"))
        .drop("__d")
        .withColumn("latency_ms", F.lit(0).cast("long"))
        .withColumn("fetched_at", F.lit(epoch_ts).cast("long"))
    )
