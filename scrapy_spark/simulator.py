"""Pure-Python discrete-event reference simulator (SURVEY §5.2-T3).

Implements SEMANTICS.md exactly, serially, with dicts and sorts — the parity
oracle standing in for the reference crawler (not installable in this
sandbox; see SURVEY §0). The Spark engine must reproduce this simulator's
pop order, url_seen set, and per-slot timelines bit-for-bit.

Deliberately simple and allocation-heavy — clarity over speed; run at
``tiny``/``small`` scales only.
"""

from __future__ import annotations

import re
from collections import defaultdict
from dataclasses import dataclass, field

import pandas as pd

from .config import CrawlConfig
from .functions.fingerprint import fingerprint
from .functions.robots import robots_allowed
from .functions.urlnorm import canonicalize_url, parse_domain, url_is_from_any_domain
from .sources.fixtures import CrawlFixture, fetch_latency_for_fp, fetch_status_for_fp


@dataclass
class SimRequest:
    fp: bytes
    url: str
    url_canon: str
    domain: str
    slot: str
    depth: int
    priority: int
    seq: int
    retries: int
    dont_filter: bool
    parent_seq: int
    redirects: int = 0


@dataclass
class SimResult:
    # (epoch, rank, fp_hex, url_canon, slot)
    pop_order: list[tuple[int, int, str, str, str]] = field(default_factory=list)
    url_seen: set[str] = field(default_factory=set)  # fp hex
    # slot -> [(virtual_ts, fp_hex)]
    timeline: dict[str, list[tuple[int, str]]] = field(default_factory=dict)
    metrics: dict[str, float] = field(default_factory=lambda: defaultdict(float))
    items: list[str] = field(default_factory=list)  # image_ids scraped
    epochs_run: int = 0
    done: set[str] = field(default_factory=set)  # fp hex with status DONE
    failed: set[str] = field(default_factory=set)


class CrawlSimulator:
    def __init__(self, fix: CrawlFixture, cfg: CrawlConfig):
        self.fix = fix
        self.cfg = cfg
        self.url_map = dict(zip(fix.url_map["url_canon"], fix.url_map["image_id"]))
        self.redirect_map = dict(
            zip(fix.redirects["src_canon"], fix.redirects["dst_url"])
        )
        self.graph: dict[str, list[str]] = defaultdict(list)
        for src, dst in zip(fix.graph["src_canon"], fix.graph["dst_url"]):
            self.graph[src].append(dst)
        self.robots: dict[str, str | None] = dict(
            zip(fix.robots["domain"], fix.robots["rules"])
        )
        self.delay = dict(zip(fix.politeness["slot"], fix.politeness["delay_ms"]))
        self.conc = dict(zip(fix.politeness["slot"], fix.politeness["concurrency"]))

    def run(self) -> SimResult:
        cfg, res = self.cfg, SimResult()
        budget = cfg.epoch_budget or cfg.concurrent_requests
        lifo = cfg.queue_order == "lifo"

        queued: list[SimRequest] = []
        next_free: dict[str, int] = defaultdict(int)
        robots_epoch: dict[str, int] = {}
        next_seq = 0
        for url, prio in zip(self.fix.seeds["url"], self.fix.seeds["priority"]):
            canon = canonicalize_url(url)
            dom = parse_domain(url)
            queued.append(
                SimRequest(
                    fp=fingerprint(url),
                    url=url,
                    url_canon=canon,
                    domain=dom,
                    slot=dom,
                    depth=0,
                    priority=int(prio),
                    seq=next_seq,
                    retries=0,
                    dont_filter=True,
                    parent_seq=-1,
                )
            )
            next_seq += 1

        pages = items_count = 0
        for epoch in range(cfg.max_epochs):
            if not queued:
                break
            ts = epoch * cfg.epoch_quantum_ms

            # SEMANTICS 1-2: politeness eligibility + robots discovery
            e0 = [r for r in queued if next_free[r.slot] <= ts]
            if cfg.robotstxt_obey:
                for r in e0:
                    if r.domain not in robots_epoch:
                        robots_epoch[r.domain] = epoch
                poppable = [r for r in e0 if robots_epoch.get(r.domain, epoch) < epoch]
            else:
                poppable = e0

            # SEMANTICS 3: robots gate (permanent denial)
            e2: list[SimRequest] = []
            denied_ids: set[int] = set()
            if cfg.robotstxt_obey:
                for r in poppable:
                    if robots_allowed(self.robots.get(r.domain), r.url, cfg.robots_user_agent):
                        e2.append(r)
                    else:
                        denied_ids.add(id(r))
                        res.metrics["robotstxt/forbidden"] += 1
                        res.failed.add(r.fp.hex())
                if denied_ids:
                    queued = [r for r in queued if id(r) not in denied_ids]
            else:
                e2 = poppable

            # SEMANTICS 4: pop — per-slot rank, then global order + budget
            by_slot: dict[str, list[SimRequest]] = defaultdict(list)
            for r in e2:
                by_slot[r.slot].append(r)
            candidates: list[tuple[int, SimRequest]] = []  # (slot_rank, req)
            for slot, rows in by_slot.items():
                rows.sort(key=lambda r: (-r.priority, -r.seq if lifo else r.seq))
                cap = int(self.conc.get(slot, cfg.concurrent_per_domain))
                for rank, r in enumerate(rows[:cap], start=1):
                    candidates.append((rank, r))
            if cfg.downloader_aware:
                candidates.sort(
                    key=lambda t: (
                        t[0],
                        -t[1].priority,
                        -t[1].seq if lifo else t[1].seq,
                        t[1].slot,
                    )
                )
            else:
                candidates.sort(
                    key=lambda t: (
                        -t[1].priority,
                        -t[1].seq if lifo else t[1].seq,
                        t[1].slot,
                    )
                )
            popped = [r for _, r in candidates[:budget]]
            popped_ids = {id(r) for r in popped}
            queued = [r for r in queued if id(r) not in popped_ids]

            for rank, r in enumerate(popped, start=1):
                res.pop_order.append((epoch, rank, r.fp.hex(), r.url_canon, r.slot))

            # SEMANTICS 5-7: fetch, politeness, outcomes
            pops_per_slot: dict[str, int] = defaultdict(int)
            enq_retries: list[SimRequest] = []
            enq_redirects: list[SimRequest] = []
            enq_links: list[SimRequest] = []
            for r in popped:
                pops_per_slot[r.slot] += 1
                image_id = self.url_map.get(r.url_canon)
                redirect_to = self.redirect_map.get(r.url_canon)
                if redirect_to is not None:
                    status = 301
                elif image_id is None:
                    status = 404
                else:
                    status = fetch_status_for_fp(r.fp)
                latency = fetch_latency_for_fp(r.fp)
                res.timeline.setdefault(r.slot, []).append((ts + latency, r.fp.hex()))
                res.metrics["downloader/request_count"] += 1
                res.metrics[f"downloader/response_status_count/{status}"] += 1
                pages += 1
                if status == 301:
                    # SEMANTICS 7: redirect child (ref redirect.py ≈L70)
                    if r.redirects < cfg.redirect_max_times:
                        res.metrics["redirect/count"] += 1
                        dom = parse_domain(redirect_to)
                        enq_redirects.append(
                            SimRequest(
                                fp=fingerprint(redirect_to),
                                url=redirect_to,
                                url_canon=canonicalize_url(redirect_to),
                                domain=dom,
                                slot=dom,
                                depth=r.depth,
                                priority=r.priority + cfg.redirect_priority_adjust,
                                seq=-1,
                                retries=0,
                                dont_filter=r.dont_filter,
                                parent_seq=r.seq,
                                redirects=r.redirects + 1,
                            )
                        )
                    else:
                        res.failed.add(r.fp.hex())
                elif status == 200:
                    res.done.add(r.fp.hex())
                    res.items.append(image_id)
                    res.metrics["item_scraped_count"] += 1
                    items_count += 1
                    for dst in self.graph.get(r.url_canon, []):
                        child = self._make_link(r, dst, res.metrics)
                        if child is not None:
                            enq_links.append(child)
                elif status in cfg.retry_http_codes and r.retries < cfg.retry_times:
                    res.metrics["retry/count"] += 1
                    enq_retries.append(
                        SimRequest(
                            fp=r.fp,
                            url=r.url,
                            url_canon=r.url_canon,
                            domain=r.domain,
                            slot=r.slot,
                            depth=r.depth,
                            priority=r.priority + cfg.retry_priority_adjust,
                            seq=-1,
                            retries=r.retries + 1,
                            dont_filter=True,
                            parent_seq=r.seq,
                            redirects=r.redirects,
                        )
                    )
                else:
                    res.failed.add(r.fp.hex())
            for slot, k in pops_per_slot.items():
                next_free[slot] = ts + k * int(self.delay.get(slot, cfg.download_delay_ms))

            # SEMANTICS 8d-e: within-epoch + seen-set dedupe over
            # redirect ∪ link candidates; dont_filter rows bypass both
            # steps and are never recorded in url_seen
            cands = [(1, r) for r in enq_redirects] + [(2, r) for r in enq_links]
            cands.sort(
                key=lambda t: (t[0], t[1].parent_seq, t[1].url_canon, t[1].url)
            )
            fresh: list[SimRequest] = []
            batch_seen: set[bytes] = set()
            for _kind, child in cands:
                if child.dont_filter:
                    fresh.append(child)
                    continue
                hexfp = child.fp.hex()
                if child.fp in batch_seen or hexfp in res.url_seen:
                    res.metrics["dupefilter/filtered"] += 1
                    continue
                batch_seen.add(child.fp)
                res.url_seen.add(hexfp)
                fresh.append(child)

            # SEMANTICS 8f: enqueue order + seq assignment
            enq_retries.sort(key=lambda r: r.parent_seq)
            for r in enq_retries + fresh:
                r.seq = next_seq
                next_seq += 1
                queued.append(r)
                res.metrics["scheduler/enqueued"] += 1

            res.epochs_run = epoch + 1
            if cfg.close_itemcount and items_count >= cfg.close_itemcount:
                break
            if cfg.close_pagecount and pages >= cfg.close_pagecount:
                break
        return res

    # --- link pipeline (SEMANTICS step 8a-c) --------------------------------
    def _make_link(
        self, parent: SimRequest, dst: str, metrics: dict[str, float]
    ) -> SimRequest | None:
        cfg = self.cfg
        depth = parent.depth + 1
        # F8 allow/deny URL regexes — allow first, then deny, exactly as
        # the engine's with_drop_reason and upstream _link_allowed
        if cfg.allow_url_patterns and not any(
            re.search(p, dst) for p in cfg.allow_url_patterns
        ):
            metrics["allow/filtered"] += 1
            return None
        if cfg.deny_url_patterns and any(
            re.search(p, dst) for p in cfg.deny_url_patterns
        ):
            metrics["deny/filtered"] += 1
            return None
        if len(dst) > cfg.url_length_limit:
            metrics["urllength/filtered"] += 1
            return None
        if cfg.allowed_domains and not url_is_from_any_domain(
            dst, list(cfg.allowed_domains)
        ):
            metrics["offsite/filtered"] += 1
            return None
        path = dst.split("?", 1)[0].split("#", 1)[0]
        last = path.rsplit("/", 1)[-1]
        ext = last.rsplit(".", 1)[-1].lower() if "." in last else ""
        if ext in cfg.deny_extensions:
            metrics["ext/filtered"] += 1
            return None
        if cfg.depth_limit and depth > cfg.depth_limit:
            metrics["depth/filtered"] += 1
            return None
        canon = canonicalize_url(dst)
        dom = parse_domain(dst)
        return SimRequest(
            fp=fingerprint(dst),
            url=dst,
            url_canon=canon,
            domain=dom,
            slot=dom,
            depth=depth,
            priority=-depth * cfg.depth_priority,
            seq=-1,
            retries=0,
            dont_filter=False,
            parent_seq=parent.seq,
        )


def pop_order_frame(res: SimResult) -> pd.DataFrame:
    return pd.DataFrame(
        res.pop_order, columns=["epoch", "rank", "fp_hex", "url_canon", "slot"]
    )
