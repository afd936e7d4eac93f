"""HTML feature extraction — byte-identical to the reference.

The reference (discover.py:31-53) uses selectolax to strip <script>/<style>
subtrees, takes the document text with ' ' separators, lowercases, maps every
punctuation char to a space, strips lines, splits multi-headlines on double
spaces, joins non-empty chunks with '\\n', and word-counts the result.

selectolax is not installable in this sandbox, so the DOM-text step is
re-implemented from scratch on stdlib html.parser. Empirically pinned recipe
(SURVEY.md §8.2, reproduces all six golden fixtures from the reference's
tests/test_discover.py:8-80 byte-identically):

  * convert_charrefs=True, collect handle_data text, suppress while inside
    <script>/<style> (depth counter);
  * override parse_marked_section to HTML5 bogus-comment behavior — consume
    "<![..." up to the first '>' (stdlib otherwise stalls on "<![endif]-->"
    and silently swallows the rest of the document);
  * parser.close() after feed();
  * join collected parts with ' ' (selectolax text(separator=' ') equivalent).
"""

from __future__ import annotations

import string
from collections import Counter
from html.parser import HTMLParser

# punctuation -> space, exactly as reference discover.py:28
TRANSLATOR = str.maketrans(string.punctuation, " " * len(string.punctuation))

_SKIP_TAGS = frozenset(("script", "style"))


class _TextCollector(HTMLParser):
    """Collect document text, skipping <script>/<style> subtrees."""

    def __init__(self):
        super().__init__(convert_charrefs=True)
        self._skip_depth = 0
        self.parts: list[str] = []

    def handle_starttag(self, tag, attrs):
        if tag in _SKIP_TAGS:
            self._skip_depth += 1

    def handle_endtag(self, tag):
        if tag in _SKIP_TAGS and self._skip_depth:
            self._skip_depth -= 1

    def handle_data(self, data):
        if data and not self._skip_depth:
            self.parts.append(data)

    def parse_marked_section(self, i, report=1):
        # HTML5 bogus-comment behavior for "<![...": consume to the first '>'.
        j = self.rawdata.find(">", i)
        return -1 if j < 0 else j + 1


def _dom_text(html: str) -> str:
    parser = _TextCollector()
    parser.feed(html)
    parser.close()
    return " ".join(parser.parts)


def extract_text(html) -> str:
    """Raw HTML (str or utf-8 bytes) -> normalized text.

    Byte-identical to the intermediate `text` at reference discover.py:49-52:
    lowercase, punctuation->space, per-line strip, split on double space,
    join non-empty chunks with '\\n'. Returns '' on no text / decode error
    (reference returns {} at discover.py:45-48).
    """
    if html is None:
        return ""
    if isinstance(html, (bytes, bytearray, memoryview)):
        try:
            html = bytes(html).decode("utf-8")
        except UnicodeDecodeError:
            return ""
    try:
        text = _dom_text(html)
    except Exception:
        return ""
    if not text:
        return ""
    text = text.lower().translate(TRANSLATOR)
    lines = (line.strip() for line in text.splitlines())
    chunks = (phrase.strip() for line in lines for phrase in line.split("  "))
    return "\n".join(chunk for chunk in chunks if chunk)


def extract_html_features(html) -> dict[str, int]:
    """Raw HTML -> {token: weight} bag of words (reference discover.py:31-53)."""
    text = extract_text(html)
    if not text:
        return {}
    return dict(Counter(text.split()))
