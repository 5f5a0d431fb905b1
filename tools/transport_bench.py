"""Transport microbench: h1 (stdlib HTTP/1.1, connection per request) vs
h2c (one multiplexed HTTP/2 connection per authority) through the SAME
``http_fetch`` operator against an in-process loopback server — the S3
evidence artifact: what multiplexing buys on a politeness-capped host.

Writes BENCH/transport.json and prints one JSON line:
  {"n_urls": N, "h1_sec": ..., "h2c_sec": ...,
   "h1_connections": ..., "h2c_connections": ..., "speedup": ...}

Run AFTER the suite (owns the local Spark session):
  python tools/transport_bench.py [n_urls]
"""

from __future__ import annotations

import http.server
import json
import os
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BODY = b"<html><body>" + b"x" * 2048 + b"</body></html>"


class _H1Handler(http.server.BaseHTTPRequestHandler):
    protocol_version = "HTTP/1.0"  # connection per request (worst honest h1)
    server_connections = 0

    def log_message(self, *a):
        pass

    def do_GET(self):
        self.send_response(200)
        self.send_header("Content-Type", "text/html")
        self.send_header("Content-Length", str(len(BODY)))
        self.end_headers()
        self.wfile.write(BODY)


class _CountingH1(http.server.ThreadingHTTPServer):
    def __init__(self, *a, **kw):
        super().__init__(*a, **kw)
        self.connections = 0

    def get_request(self):
        req = super().get_request()
        self.connections += 1
        return req


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 400
    from pyspark.sql import SparkSession

    from scrapy_spark.operators.http2 import H2Server
    from scrapy_spark.operators.netfetch import http_fetch

    spark = (
        SparkSession.builder.master("local[4]")
        .appName("transport-bench")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )

    # --- h1 ---------------------------------------------------------------
    h1 = _CountingH1(("127.0.0.1", 0), _H1Handler)
    threading.Thread(target=h1.serve_forever, daemon=True).start()
    base1 = f"http://127.0.0.1:{h1.server_address[1]}"
    reqs1 = spark.createDataFrame(
        [(str(i).encode(), f"{base1}/p/{i}", "bench-host") for i in range(n)],
        "fp binary, url string, slot string",
    ).coalesce(1)
    t0 = time.monotonic()
    rows = http_fetch(reqs1, transport="h1", concurrent_per_slot=8).collect()
    h1_sec = time.monotonic() - t0
    assert len(rows) == n and all(r.status == 200 for r in rows)
    h1_conns = h1.connections
    h1.shutdown()

    # --- h2c --------------------------------------------------------------
    h2 = H2Server(lambda path, hdrs: (200, {"content-type": "text/html"}, BODY))
    base2 = f"http://127.0.0.1:{h2.port}"
    reqs2 = spark.createDataFrame(
        [(str(i).encode(), f"{base2}/p/{i}", "bench-host") for i in range(n)],
        "fp binary, url string, slot string",
    ).coalesce(1)
    t0 = time.monotonic()
    rows = http_fetch(reqs2, transport="h2c", concurrent_per_slot=8).collect()
    h2_sec = time.monotonic() - t0
    assert len(rows) == n and all(r.status == 200 for r in rows)
    h2_conns = h2.connections
    h2.close()

    out = {
        "n_urls": n,
        "per_slot_cap": 8,
        "h1_sec": round(h1_sec, 3),
        "h2c_sec": round(h2_sec, 3),
        "h1_connections": h1_conns,
        "h2c_connections": h2_conns,
        "speedup": round(h1_sec / h2_sec, 3) if h2_sec else None,
    }
    os.makedirs("BENCH", exist_ok=True)
    with open("BENCH/transport.json", "w") as fh:
        json.dump(out, fh, indent=2)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
