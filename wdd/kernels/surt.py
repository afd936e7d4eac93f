"""SURT (Sort-friendly URI Reordering Transform) key derivation.

The reference uses the `surt` PyPI package (not installable here) purely as a
canonical grouping key for its Redis hashes (discover.py:233, util.py:37-55).
Re-implemented from scratch for the subset the pipeline needs: scheme/port
stripping, host lowercasing + www-prefix removal, reversed comma-joined host,
')' separator, lowercased path, sorted query.

Golden fixture (reference tests, via SAMPLE_REDIS_CONTENT keys):
surt('http://example.com') == 'com,example)/'.
"""

from __future__ import annotations

from urllib.parse import urlsplit

_DEFAULT_PORTS = {"http": "80", "https": "443"}


def surt(url: str) -> str:
    if not url:
        return ""
    raw = url.strip()
    if "://" not in raw and not raw.startswith("//"):
        raw = "http://" + raw
    parts = urlsplit(raw)
    host = (parts.hostname or "").lower().strip(".")
    # drop a leading www / www<digits> label (SURT canonicalization)
    labels = host.split(".")
    if labels and labels[0].startswith("www") and labels[0][3:].isdigit() or (
            labels and labels[0] == "www"):
        labels = labels[1:]
    rev_host = ",".join(reversed([l for l in labels if l]))
    port = ""
    if parts.port is not None:
        p = str(parts.port)
        if _DEFAULT_PORTS.get(parts.scheme or "http") != p:
            port = ":" + p
    path = (parts.path or "/").lower()
    if not path.startswith("/"):
        path = "/" + path
    query = ""
    if parts.query:
        query = "?" + "&".join(sorted(parts.query.lower().split("&")))
    return f"{rev_host}{port}){path}{query}"
