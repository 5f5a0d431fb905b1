"""Build the spark-submit artifact (north_rule: "run via spark-submit
--py-files on a multi-executor cluster").

Produces ``dist/scrapy_spark.zip`` containing the package (sources only,
no tests/caches) — imports resolve on every executor when shipped with
``--py-files``.

Usage:
    python tools/build_pyfiles.py            # → dist/scrapy_spark.zip

Cluster launch (two cluster sizes per the north_rule):
    spark-submit --py-files dist/scrapy_spark.zip \
        --conf spark.sql.shuffle.partitions=<2-3× total cores> \
        --conf spark.sql.adaptive.enabled=true \
        --num-executors N  tools/submit_crawl.py --store s3a://…/frontier
    # repeat with --num-executors 4N; compare BENCH throughput
"""

from __future__ import annotations

import pathlib
import zipfile

REPO = pathlib.Path(__file__).resolve().parent.parent


def build(out: pathlib.Path | None = None) -> pathlib.Path:
    out = out or REPO / "dist" / "scrapy_spark.zip"
    out.parent.mkdir(exist_ok=True)
    pkg = REPO / "scrapy_spark"
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as zf:
        for py in sorted(pkg.rglob("*.py")):
            if "__pycache__" in py.parts:
                continue
            zf.write(py, py.relative_to(REPO))
    return out


if __name__ == "__main__":
    path = build()
    names = zipfile.ZipFile(path).namelist()
    print(f"{path} ({len(names)} files)")
