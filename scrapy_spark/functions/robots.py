"""robots.txt parsing (SURVEY §2.2 F3).

A from-scratch RFC 9309 parser with the semantics the reference gets from
``protego`` (ref: scrapy/robotstxt.py::ProtegoRobotParser ≈L40; the library
itself is absent in this sandbox, so the standard is implemented directly):

- rules grouped by ``User-agent``; most-specific agent group wins
  (longest agent substring match, ``*`` as fallback),
- within the chosen group, the longest-path rule wins; on equal length
  ``Allow`` beats ``Disallow``,
- ``$`` anchors end-of-path, ``*`` is a wildcard inside patterns,
- empty ``Disallow:`` means allow-all; a missing group means allow-all,
- percent-encoding-insensitive path comparison.

Pure Python and deterministic, safe to run inside a pandas UDF batch.
"""

from __future__ import annotations

import re
from urllib.parse import unquote, urlparse


def _pattern_to_regex(pattern: str) -> re.Pattern:
    anchored = pattern.endswith("$")
    if anchored:
        pattern = pattern[:-1]
    parts = [re.escape(p) for p in pattern.split("*")]
    body = ".*".join(parts)
    return re.compile("^" + body + ("$" if anchored else ""))


class RobotsRules:
    """Parsed rules for one robots.txt body."""

    __slots__ = ("groups",)

    def __init__(self, text: str):
        # groups: agent(lower) -> list[(allow: bool, pattern: str, regex)]
        self.groups: dict[str, list[tuple[bool, str, re.Pattern]]] = {}
        current_agents: list[str] = []
        last_was_agent = False
        for raw_line in (text or "").splitlines():
            line = raw_line.split("#", 1)[0].strip()
            if not line or ":" not in line:
                continue
            field, _, value = line.partition(":")
            field = field.strip().lower()
            value = value.strip()
            if field == "user-agent":
                if not last_was_agent:
                    current_agents = []
                current_agents.append(value.lower())
                self.groups.setdefault(value.lower(), [])
                last_was_agent = True
            elif field in ("allow", "disallow"):
                last_was_agent = False
                if not current_agents:
                    continue
                if not value:  # empty Disallow/Allow → no rule
                    continue
                rule = (field == "allow", unquote(value), _pattern_to_regex(unquote(value)))
                for agent in current_agents:
                    self.groups[agent].append(rule)
            else:  # sitemap, crawl-delay, … — not rules; end agent run
                last_was_agent = False

    def _group_for(self, user_agent: str) -> list[tuple[bool, str, re.Pattern]] | None:
        ua = user_agent.lower()
        best_key, best_len = None, -1
        for key in self.groups:
            if key != "*" and key in ua and len(key) > best_len:
                best_key, best_len = key, len(key)
        if best_key is not None:
            return self.groups[best_key]
        return self.groups.get("*")

    def allowed(self, url: str, user_agent: str = "*") -> bool:
        group = self._group_for(user_agent)
        if not group:
            return True
        parsed = urlparse(url)
        path = unquote(parsed.path or "/")
        if parsed.query:
            path += "?" + unquote(parsed.query)
        best: tuple[int, bool] | None = None  # (pattern_len, allow)
        for allow, pattern, regex in group:
            if regex.match(path):
                key = (len(pattern), allow)
                if best is None or key > best:
                    best = key
        return True if best is None else best[1]


def robots_allowed(rules_text: str | None, url: str, user_agent: str = "*") -> bool:
    """Gate used by the robots middleware. ``None``/empty rules (domain had a
    fetch error) ⇒ allow-all — the reference's error⇒allow behavior
    (ref: scrapy/downloadermiddlewares/robotstxt.py ≈L70 [verify 5xx case])."""
    if not rules_text:
        return True
    return RobotsRules(rules_text).allowed(url, user_agent)
