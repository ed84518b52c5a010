"""Golden URL-normalization cases from the reference's test suite
(`/root/reference/src/cis5550/tests/NormalizationTest.java:106-222` —
public / hidden / custom autograder tiers)."""

import pytest

from search_engine_ray.functions.urls import normalize

BASE1 = "https://foo.com:8000/bar/xyz.html"
BASE2 = "http://hostA/foo/bar/pageName.html"

GOLDEN = [
    # public2..5
    (BASE1, "blah.html#test", "https://foo.com:8000/bar/blah.html"),
    (BASE1, "../blubb/123.html", "https://foo.com:8000/blubb/123.html"),
    (BASE1, "/one/two.html", "https://foo.com:8000/one/two.html"),
    (BASE1, "http://elsewhere.com/some.html", "http://elsewhere.com:80/some.html"),
    # hidden normal1..10 (hostname placeholders concretized)
    (BASE2, "same-level.html", "http://hostA:80/foo/bar/same-level.html"),
    (BASE2, "../one-level-up.html", "http://hostA:80/foo/one-level-up.html"),
    (BASE2, "../../two-levels-up.html", "http://hostA:80/two-levels-up.html"),
    (BASE2, "/root-direct.html", "http://hostA:80/root-direct.html"),
    (BASE2, "/blah/root-subdir.html", "http://hostA:80/blah/root-subdir.html"),
    (BASE2, "http://hostA/foo/bar/full-url.html", "http://hostA:80/foo/bar/full-url.html"),
    (BASE2, "http://hostA/with-hash.html#something", "http://hostA:80/with-hash.html"),
    (BASE2, "http://hostA:80/with-port.html", "http://hostA:80/with-port.html"),
    (BASE2, "http://hostA/other-attr.html", "http://hostA:80/other-attr.html"),
    (BASE2, "http://hostB/different-host.html", "http://hostB:80/different-host.html"),
    # custom1
    ("http://hostA/a/b/c/d/e/pageName.html", "../../../../b.html", "http://hostA:80/a/b.html"),
]


@pytest.mark.parametrize("base,link,expected", GOLDEN)
def test_golden_normalization(base, link, expected):
    assert normalize(base, link) == expected


def test_fragment_only_link_discarded():
    """public1 expects the base URL back, but the reference's own
    implementation (and its test author's note,
    NormalizationTest.java:112-113) discards fragment-only links
    (`Crawler.java:179-181` returns null); we preserve the
    implemented behavior."""
    assert normalize(BASE1, "#abc") is None


def test_https_port_quirk():
    """The reference fills https ports with 8000, not 443
    (`Crawler.java:118`) — quirk preserved."""
    assert normalize(BASE2, "https://secure.example/x.html") == "https://secure.example:8000/x.html"
