"""URL canonicalization + validation (reference util.py:100-114, discover.py:191).

`url_fix` re-implements werkzeug.urls.url_fix's observable behavior: split the
URL, percent-encode unsafe characters in path/query/fragment, leave existing
percent-escapes intact.

`url_is_valid` reproduces the reference's semantics (EMAIL_RE reject +
tldextract domain/suffix non-empty) without the tldextract package: a URL is
valid iff it is non-empty, not email-shaped, its host has a registrable
domain under a KNOWN public suffix (wdd/kernels/psl.py — a compact offline
publicsuffix snapshot: all 2-letter ccTLDs, legacy + common new gTLDs, and
the common two-label suffixes, so `http://co.uk/` has no registrable domain
and `http://foo.notarealtld` has no known suffix — both invalid, matching
tldextract), and any explicit scheme is an http(s)/ftp-style netloc scheme
(tldextract yields empty domain for opaque schemes like tel: / torrent:).
Pinned by the reference's parametrized fixture (tests/test_util.py:64-73).
"""

from __future__ import annotations

import re
from urllib.parse import quote, urlsplit, urlunsplit

EMAIL_RE = re.compile(r"(^[a-zA-Z0-9_.+-]+@[a-zA-Z0-9-]+\.[a-zA-Z0-9-.]+$)")

_NETLOC_SCHEMES = frozenset(("http", "https", "ftp", "ftps", "ws", "wss", ""))

_PATH_SAFE = "/%+$!*'(),;:@&=~-_.abcdefghijklmnopqrstuvwxyz" \
             "ABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789"
_QUERY_SAFE = _PATH_SAFE + "?"


def url_fix(url: str) -> str:
    """Percent-encode unsafe chars so the URL is request-safe (werkzeug parity)."""
    if not url:
        return url
    scheme, netloc, path, query, fragment = urlsplit(url.strip())
    path = quote(path, safe=_PATH_SAFE)
    query = quote(query, safe=_QUERY_SAFE)
    fragment = quote(fragment, safe=_QUERY_SAFE)
    return urlunsplit((scheme, netloc, path, query, fragment))


def url_is_valid(url: str) -> bool:
    """Reference util.py:103-114 semantics."""
    try:
        if not url:
            return False
        if EMAIL_RE.match(url):
            return False
        parts = urlsplit(url)
        if parts.scheme.lower() not in _NETLOC_SCHEMES:
            # opaque scheme (tel:, torrent:, mailto:) -> tldextract sees no host
            return False
        host = parts.hostname
        if host is None and not parts.scheme:
            # bare string like 'example.com/x' parses as path
            host = (parts.path or "").split("/")[0]
        if not host:
            return False
        from wdd.kernels.psl import has_registrable_domain
        return has_registrable_domain(host)
    except (ValueError, AttributeError):
        return False
