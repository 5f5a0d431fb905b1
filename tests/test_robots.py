"""F3 robots parsing + F2 gate semantics (models reference
tests/test_downloadermiddleware_robotstxt.py, named in north_star)."""

from scrapy_spark.functions.robots import RobotsRules, robots_allowed

BASIC = """
User-agent: *
Disallow: /private/
Allow: /private/ok
"""

MULTI = """
User-agent: googlebot
Disallow: /

User-agent: *
Disallow: /admin
"""

WILD = """
User-agent: *
Disallow: /*.gif$
Disallow: /tmp/*
"""


def test_basic_disallow_and_longest_match_allow():
    r = RobotsRules(BASIC)
    assert r.allowed("http://x.example/", "*")
    assert not r.allowed("http://x.example/private/x", "*")
    assert r.allowed("http://x.example/private/ok", "*")  # Allow longer → wins


def test_agent_group_selection():
    r = RobotsRules(MULTI)
    assert not r.allowed("http://x.example/anything", "Googlebot/2.1")
    assert r.allowed("http://x.example/anything", "otherbot")
    assert not r.allowed("http://x.example/admin/x", "otherbot")


def test_wildcards_and_anchors():
    r = RobotsRules(WILD)
    assert not r.allowed("http://x.example/pics/cat.gif", "*")
    assert r.allowed("http://x.example/pics/cat.gif?x=1", "*")  # $ anchor
    assert not r.allowed("http://x.example/tmp/a/b", "*")


def test_empty_disallow_allows_all():
    r = RobotsRules("User-agent: *\nDisallow:\n")
    assert r.allowed("http://x.example/anything", "*")


def test_error_sentinel_allows_all():
    # fetch-error ⇒ allow-all (ref: robotstxt.py error path)
    assert robots_allowed(None, "http://x.example/p")
    assert robots_allowed("", "http://x.example/p")


def test_disallow_all():
    assert not robots_allowed("User-agent: *\nDisallow: /\n", "http://x.example/")


def test_percent_encoding_insensitive():
    r = RobotsRules("User-agent: *\nDisallow: /café\n")
    assert not r.allowed("http://x.example/caf%C3%A9/menu", "*")
