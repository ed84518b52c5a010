"""URL parsing / normalization — reference-parity utility (SURVEY.md §2.2).

Reimplements (from observed behavior, not translation) the reference's
URL handling used by its crawler:

- ``parse_url``: `/root/reference/src/cis5550/tools/URLParser.java:8-31`
  — split into (protocol, host, port, path); no-``//`` inputs are
  path-only; missing path becomes "/".
- ``normalize_url``: `/root/reference/src/cis5550/jobs/Crawler.java:106-177`
  — fragment strip (fragment-only links are discarded -> None,
  `Crawler.java:179-181`), null components filled from the base URL,
  the port ALWAYS rewritten from the resolved protocol with the
  reference's quirk of ``https -> 8000`` (`Crawler.java:118`; the
  course-standard 443 is NOT used — quirk preserved deliberately),
  ``..`` segments resolved against the base path level count
  (`Crawler.java:127-147`), and relative paths anchored at the base
  URL's directory (`Crawler.java:149-163`).

Transcripts carry no URLs, so this is a utility (plus golden-test
parity with `src/cis5550/tests/NormalizationTest.java:106-222`); apply
it with ``map_batches`` if URL payloads ever appear in ``text``.
"""

from __future__ import annotations


def parse_url(url: str) -> list[str | None]:
    """-> [protocol, host, port, path], any of which may be None."""
    result: list[str | None] = [None, None, None, None]
    slashslash = url.find("//")
    if slashslash > 0:
        result[0] = url[: slashslash - 1]
        nextslash = url.find("/", slashslash + 2)
        if nextslash >= 0:
            result[1] = url[slashslash + 2 : nextslash]
            result[3] = url[nextslash:]
        else:
            result[1] = url[slashslash + 2 :]
            result[3] = "/"
        host = result[1]
        colon = host.find(":")
        if colon > 0:
            result[2] = host[colon + 1 :]
            result[1] = host[:colon]
    else:
        result[3] = url
    return result


def remove_fragment(url: str) -> str | None:
    """Strip ``#fragment``; a fragment-only link is discarded (None)."""
    if url.startswith("#"):
        return None
    return url.split("#")[0]


def _java_split(s: str, sep: str) -> list[str]:
    """Java String.split drops trailing empty strings."""
    parts = s.split(sep)
    while parts and parts[-1] == "":
        parts.pop()
    return parts


def components_to_url(c: list[str | None]) -> str:
    protocol = f"{c[0]}://" if c[0] is not None else ""
    host = c[1] or ""
    port = f":{c[2]}" if c[2] is not None else ""
    path = c[3] or ""
    return f"{protocol}{host}{port}{path}"


def normalize_url(link: str, base_components: list[str | None]) -> str | None:
    """Resolve ``link`` against a parsed base URL; None = discard."""
    stripped = remove_fragment(link)
    if stripped is None:
        return None
    c = parse_url(stripped)
    for i in range(4):
        if i == 2:
            c[2] = "8000" if c[0] == "https" else "80"
        elif c[i] is None:
            c[i] = base_components[i]
        elif i == 3:
            path = c[3]
            assert path is not None
            if path.startswith(".."):
                seed_path = _java_split(base_components[3] or "", "/")
                levels = len(seed_path) - 2
                new_path = path
                while new_path.startswith(".."):
                    new_path = new_path[3:]
                    levels -= 1
                while levels > 0:
                    new_path = f"{seed_path[levels]}/{new_path}"
                    levels -= 1
                c[3] = "/" + new_path
            if not (c[3] or "").startswith("/"):
                base_elements = _java_split(base_components[3] or "", "/")
                if base_elements:
                    base_elements = base_elements[:-1]
                    c[3] = "/".join(base_elements) + "/" + (c[3] or "")
    return components_to_url(c)


def normalize(base_url: str, link: str) -> str | None:
    return normalize_url(link, parse_url(base_url))
