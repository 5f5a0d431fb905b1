"""Deterministic crawl-domain fixtures (FIXTURES.md §A).

Pure functions of ``(seed, scale)`` — NumPy ``default_rng`` only, no
wall-clock. Produces pandas DataFrames shared by three consumers: the Spark
engine (via ``to_spark``/``materialize``), the pure-Python discrete-event
simulator (parity oracle, SURVEY §5.2-T3), and ``bench.py``.

URL universe: ``http://d{dom:05d}.example/p/{k}`` with per-domain URL counts
drawn Zipf(s=1.2) — one hot domain holds a large share of the frontier,
exercising the salted two-phase pop (SURVEY §4.3.1). The link graph injects
the reference's filter cases: offsite hosts (F4), overlong URLs (F6), denied
extensions (F8), and canonicalization twins that must collapse to one
fingerprint (C1).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pandas as pd

from ..functions.fingerprint import fingerprint
from ..functions.imaging import encode_image, phash64, synth_image
from ..functions.urlnorm import canonicalize_url

SCALES = {
    # (n_domains, n_urls, n_seeds)
    "tiny": (12, 600, 30),
    "small": (80, 20_000, 400),
    "bench": (400, 1_000_000, 20_000),
}

_WORDS = (
    "amber basalt cedar dune ember fjord garnet harbor iris juniper kelp "
    "lumen marble nectar onyx prism quartz reef sable tundra umber vellum "
    "willow xenon yarrow zephyr"
).split()


@dataclass
class CrawlFixture:
    seeds: pd.DataFrame  # url, priority
    graph: pd.DataFrame  # src_canon, dst_url
    url_map: pd.DataFrame  # url_canon, image_id
    redirects: pd.DataFrame  # src_canon, dst_url (301 map; may be empty)
    robots: pd.DataFrame  # domain, rules, status
    politeness: pd.DataFrame  # slot, delay_ms, concurrency
    corpus: pd.DataFrame | None  # image_id, bytes, w, h, fmt, caption, phash
    scale: str
    seed: int


def _zipf_sizes(n_domains: int, n_urls: int, s: float = 1.2) -> np.ndarray:
    w = 1.0 / np.arange(1, n_domains + 1) ** s
    sizes = np.maximum(1, np.floor(w / w.sum() * n_urls)).astype(np.int64)
    # distribute the rounding remainder onto the head (keeps the skew)
    sizes[0] += n_urls - sizes.sum()
    return sizes


def _build_urls(sizes: np.ndarray) -> tuple[pd.Series, np.ndarray]:
    """Vectorized universe build → (urls, domain_index per url)."""
    dom_of = np.repeat(np.arange(len(sizes)), sizes)
    starts = np.concatenate(([0], np.cumsum(sizes)[:-1]))
    k_of = np.arange(len(dom_of)) - starts[dom_of]
    urls = (
        "http://d"
        + pd.Series(dom_of).astype(str).str.zfill(5)
        + ".example/p/"
        + pd.Series(k_of).astype(str)
    )
    return urls, dom_of


def gen_crawl_fixture(
    scale: str = "tiny", seed: int = 42, with_payload: bool | None = None
) -> CrawlFixture:
    n_domains, n_urls, n_seeds = SCALES[scale]
    if with_payload is None:
        with_payload = scale != "bench"  # bench: URL-only hot path, no images
    rng = np.random.default_rng(seed)

    sizes = _zipf_sizes(n_domains, n_urls)
    urls, dom_of = _build_urls(sizes)
    n = len(urls)

    # --- url_map / corpus -------------------------------------------------
    image_ids = "img" + pd.Series(np.arange(n)).astype(str).str.zfill(10)
    # base URLs are already canonical by construction; assert on a sample
    sample = rng.integers(0, n, size=min(16, n))
    for i in sample:
        assert canonicalize_url(urls[i]) == urls[i]
    url_map = pd.DataFrame({"url_canon": urls, "image_id": image_ids})

    corpus = None
    if with_payload:
        fmts = rng.choice(["rawrgb", "qrgb"], size=n, p=[0.6, 0.4])
        rows = []
        for iid, fmt in zip(image_ids, fmts):
            arr = synth_image(iid)
            word = _WORDS[int(iid[3:]) % len(_WORDS)]
            rows.append(
                (
                    iid,
                    encode_image(arr, fmt),
                    arr.shape[1],
                    arr.shape[0],
                    fmt,
                    f"caption for {iid}: {word}",
                    phash64(arr),
                )
            )
        corpus = pd.DataFrame(
            rows, columns=["image_id", "bytes", "w", "h", "fmt", "caption", "phash"]
        )

    # --- seeds -------------------------------------------------------------
    seed_idx = rng.choice(n, size=min(n_seeds, n), replace=False)
    seed_idx.sort()
    prio = np.zeros(len(seed_idx), dtype=np.int32)
    special = rng.random(len(seed_idx)) < 0.05
    prio[special] = rng.choice([-2, -1, 1, 2], size=special.sum())
    seeds = pd.DataFrame({"url": urls.iloc[seed_idx].to_numpy(), "priority": prio})

    # --- graph ---------------------------------------------------------------
    deg = rng.poisson(2.5, size=n)
    src_idx = np.repeat(np.arange(n), deg)
    m = len(src_idx)
    dst_idx = rng.integers(0, n, size=m)
    within = rng.random(m) < 0.8  # 80% same-domain links
    d = dom_of[src_idx[within]]
    starts = np.concatenate(([0], np.cumsum(sizes)[:-1]))
    dst_idx[within] = starts[d] + rng.integers(0, sizes[d])
    # ~10% explicit duplicate targets: copy dst from a rotated position
    dup = rng.random(m) < 0.10
    dst_idx[dup] = np.roll(dst_idx, 1)[dup]

    dst_urls = urls.iloc[dst_idx].reset_index(drop=True).copy()
    kind = rng.random(m)
    # 5% offsite (F4), 3% overlong (F6), 2% denied ext (F8), 2% canon twins
    # (C1), 2% 301-alias hops (J7)
    offsite = kind < 0.05
    overlong = (kind >= 0.05) & (kind < 0.08)
    denyext = (kind >= 0.08) & (kind < 0.10)
    twins = (kind >= 0.10) & (kind < 0.12)
    redir = (kind >= 0.12) & (kind < 0.14)
    dst_urls[offsite] = (
        "http://ext" + pd.Series(dst_idx[offsite]).astype(str).str.zfill(4).to_numpy()
        + ".external/x"
    )
    dst_urls[overlong] = dst_urls[overlong] + "/" + "x" * 2100
    dst_urls[denyext] = dst_urls[denyext] + "/file.zip"
    # canonicalization twins: same fingerprint as the base URL
    twin_variants = np.array(["#frag", "?", ""])  # '' handled below via case
    tv = rng.integers(0, 3, size=int(twins.sum()))
    twin_urls = dst_urls[twins].to_numpy(dtype=object)
    for j, (u, v) in enumerate(zip(twin_urls, tv)):
        if v == 0:
            twin_urls[j] = u + "#frag"
        elif v == 1:
            twin_urls[j] = u.replace("http://", "HTTP://", 1)
        else:
            twin_urls[j] = u.replace(".example/", ".example:80/", 1)
    dst_urls[twins] = twin_urls

    # 301 aliases (J7, ref redirect.py ≈L70): the edge points at an alias
    # URL on the target's own domain; fetching the alias 301s to the real
    # URL. Aliases are canonical by construction and absent from url_map.
    redir_real = dst_urls[redir].to_numpy(dtype=object)
    redir_pos = np.flatnonzero(redir.to_numpy() if hasattr(redir, "to_numpy") else redir)
    alias_urls = np.array(
        [
            u.rsplit("/p/", 1)[0] + f"/r/{j}" if "/p/" in u else u
            for j, u in zip(redir_pos, redir_real)
        ],
        dtype=object,
    )
    is_alias = alias_urls != redir_real
    dst_urls[redir] = alias_urls
    redirects = pd.DataFrame(
        {
            "src_canon": alias_urls[is_alias],
            "dst_url": redir_real[is_alias],
        }
    ).drop_duplicates(subset=["src_canon"], keep="first").reset_index(drop=True)

    graph = pd.DataFrame(
        {"src_canon": urls.iloc[src_idx].to_numpy(), "dst_url": dst_urls}
    )

    # --- robots --------------------------------------------------------------
    domains = "d" + pd.Series(np.arange(n_domains)).astype(str).str.zfill(5) + ".example"
    r = rng.random(n_domains)
    rules, status = [], []
    for i, dom in enumerate(domains):
        if r[i] < 0.70:
            rules.append("User-agent: *\nDisallow:\n")
            status.append("OK")
        elif r[i] < 0.90:
            # block a path-prefix slice: /p/1* (matches p/1, p/10…p/19, …)
            rules.append("User-agent: *\nDisallow: /p/1\n")
            status.append("OK")
        elif r[i] < 0.95:
            rules.append(None)  # fetch error ⇒ allow-all semantics
            status.append("ERROR")
        else:
            rules.append("User-agent: *\nDisallow: /\n")
            status.append("OK")
    robots = pd.DataFrame({"domain": domains, "rules": rules, "status": status})

    # --- politeness ------------------------------------------------------------
    delays = np.array([0, 100, 500, 1000], dtype=np.int64)
    concs = np.array([1, 2, 8], dtype=np.int32)
    politeness = pd.DataFrame(
        {
            "slot": domains,
            "delay_ms": delays[rng.integers(0, 4, size=n_domains)],
            "concurrency": concs[rng.integers(0, 3, size=n_domains)],
        }
    )

    return CrawlFixture(
        seeds=seeds,
        graph=graph,
        url_map=url_map,
        redirects=redirects,
        robots=robots,
        politeness=politeness,
        corpus=corpus,
        scale=scale,
        seed=seed,
    )


def fetch_status_for_fp(fp: bytes) -> int:
    """Deterministic synthetic fetch outcome, shared by engine & simulator:
    first fingerprint byte <5 → 503 (retryable, ~2%), <10 → 404 (terminal,
    ~2%), else 200."""
    b = fp[0]
    if b < 5:
        return 503
    if b < 10:
        return 404
    return 200


def fetch_latency_for_fp(fp: bytes) -> int:
    """Deterministic virtual fetch latency in ms."""
    return 10 + fp[1] % 90


def seed_fingerprints(seeds: pd.DataFrame) -> list[bytes]:
    return [fingerprint(u) for u in seeds["url"]]


def materialize(fix: CrawlFixture, out_dir: str) -> dict[str, str]:
    """Write fixture tables as parquet for Spark to read (bench path —
    avoids driver-side createDataFrame of millions of rows)."""
    import pathlib

    import pyarrow as pa
    import pyarrow.parquet as pq

    out = pathlib.Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    paths = {}
    tables = {
        "seeds": fix.seeds,
        "graph": fix.graph,
        "url_map": fix.url_map,
        "redirects": fix.redirects,
        "robots": fix.robots,
        "politeness": fix.politeness,
    }
    if fix.corpus is not None:
        tables["corpus"] = fix.corpus
    for name, df in tables.items():
        p = out / f"{name}.parquet"
        pq.write_table(pa.Table.from_pandas(df, preserve_index=False), p)
        paths[name] = str(p)
    return paths
