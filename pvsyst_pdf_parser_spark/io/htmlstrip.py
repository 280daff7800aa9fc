"""HTML main-content extraction via text/link-density block scoring.

North-rule capability with no reference counterpart: Common-Crawl-style
mirrors of report pages arrive as HTML; the pipeline must strip
boilerplate (nav/header/footer/sidebar chrome) and recover the main
content text deterministically.

Algorithm (Boilerpipe-style densitometric classification, stdlib-only):

1. Segment the DOM into text blocks at block-level element boundaries,
   dropping ``script``/``style``/``noscript``/``template`` subtrees.
2. Per block, record word count, character count, anchor-text character
   count (chars emitted inside ``<a>``), whether the block sits inside a
   structural-boilerplate container (nav/header/footer/aside/form), and
   whether it is preformatted (``<pre>`` — whitespace preserved).
3. Classify: a block is content iff it is outside structural chrome,
   its link density (anchor chars / chars) is ≤ 1/3, and it clears a
   word-count floor (preformatted report bodies clear it trivially;
   short link-dense nav rows do not).
4. Main text = kept blocks joined with newlines; preformatted blocks
   keep their internal whitespace verbatim.

Pure function of the input bytes — safe inside Arrow-batched UDFs.
"""

from __future__ import annotations

import re
from html.parser import HTMLParser

_DROP_SUBTREE = {"script", "style", "noscript", "template", "svg", "head"}
_CHROME = {"nav", "header", "footer", "aside", "form"}
_BLOCK_TAGS = {
    "p", "div", "section", "article", "main", "li", "ul", "ol",
    "table", "tr", "td", "th", "pre", "blockquote", "title",
    "h1", "h2", "h3", "h4", "h5", "h6", "body",
}

_MIN_WORDS = 8
_MAX_LINK_DENSITY = 1.0 / 3.0
_WS = re.compile(r"\s+")


class _Block:
    __slots__ = ("parts", "link_chars", "in_chrome", "pre")

    def __init__(self, in_chrome: bool, pre: bool) -> None:
        self.parts: list[str] = []
        self.link_chars = 0
        self.in_chrome = in_chrome
        self.pre = pre

    def text(self) -> str:
        raw = "".join(self.parts)
        if self.pre:
            return raw
        return _WS.sub(" ", raw).strip()


class _DensityParser(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.blocks: list[_Block] = []
        self._drop_depth = 0
        self._chrome_depth = 0
        self._pre_depth = 0
        self._anchor_depth = 0
        self._cur: _Block | None = None

    def _flush(self) -> None:
        if self._cur is not None and self._cur.parts:
            self.blocks.append(self._cur)
        self._cur = None

    def handle_starttag(self, tag: str, attrs) -> None:
        if tag in _DROP_SUBTREE:
            self._drop_depth += 1
            return
        if tag in _CHROME:
            self._chrome_depth += 1
        if tag == "pre":
            self._pre_depth += 1
        if tag == "a":
            self._anchor_depth += 1
        if tag in _BLOCK_TAGS:
            self._flush()

    def handle_endtag(self, tag: str) -> None:
        if tag in _DROP_SUBTREE:
            self._drop_depth = max(0, self._drop_depth - 1)
            return
        if tag in _BLOCK_TAGS:
            self._flush()
        if tag in _CHROME:
            self._chrome_depth = max(0, self._chrome_depth - 1)
        if tag == "pre":
            self._pre_depth = max(0, self._pre_depth - 1)
        if tag == "a":
            self._anchor_depth = max(0, self._anchor_depth - 1)

    def handle_data(self, data: str) -> None:
        if self._drop_depth:
            return
        if self._cur is None:
            self._cur = _Block(self._chrome_depth > 0, self._pre_depth > 0)
        if data:
            self._cur.parts.append(data)
            if self._anchor_depth:
                self._cur.link_chars += len(data)

    def close(self) -> None:  # flush the trailing block
        super().close()
        self._flush()


def extract_main_text(html: str | bytes) -> str:
    """Strip boilerplate; return the main-content text of an HTML page."""
    if isinstance(html, bytes):
        html = html.decode("utf-8", errors="replace")
    parser = _DensityParser()
    parser.feed(html)
    parser.close()

    kept: list[str] = []
    for block in parser.blocks:
        text = block.text()
        if not text or block.in_chrome:
            continue
        n_chars = len(text)
        n_words = len(text.split())
        link_density = block.link_chars / n_chars if n_chars else 1.0
        if n_words >= _MIN_WORDS and link_density <= _MAX_LINK_DENSITY:
            kept.append(text)
    return "\n".join(kept)
