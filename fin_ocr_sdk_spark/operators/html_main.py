"""DOM-heuristic main-content extraction — the north rule's "DOM
heuristics" leg next to the exact-match boilerplate strip
(``__spark_entry__.q_boilerplate_strip``), pure stdlib
(``html.parser``), no external DOM libs in this environment.

Heuristics (the boilerpipe/Readability family at tag granularity):

- text inside ``script``/``style``/``noscript``/``template`` is never
  content;
- text inside chrome containers — ``nav``/``header``/``footer``/
  ``aside`` and any element whose ``class``/``id`` matches a chrome
  keyword (menu, sidebar, banner, cookie, ad) — is dropped, at any
  nesting depth;
- what remains is block-flattened: block-level boundaries become line
  breaks, inline tags do not, and whitespace is normalized per line;
- DENSITY FALLBACK (readability/boilerpipe-style): when a page carries
  NO semantic chrome signal at all — div-soup markup with neither
  chrome tags nor chrome class/id keywords — the tag heuristic has
  nothing to cut, so blocks are scored by link density instead: a
  block whose anchor text is more than half its non-whitespace
  characters is navigation chrome and dropped.  Pages WITH semantic
  signal keep the pure tag heuristic (their link lists are already
  inside the tagged chrome), so the fallback never changes the output
  for well-marked pages.

Deterministic and order-preserving, so the per-document output is a
stable golden for the DuckDB oracle.
"""

from __future__ import annotations

import re
from html.parser import HTMLParser

_SKIP_ENTIRELY = {"script", "style", "noscript", "template", "title"}
_CHROME_TAGS = {"nav", "header", "footer", "aside"}
_CHROME_CLASS_RE = re.compile(
    r"(?:^|[\s_-])(?:nav|menu|sidebar|banner|footer|header|cookie|ads?|"
    r"promo|social|breadcrumbs?)(?:$|[\s_-])", re.I)
_BLOCK_TAGS = {"p", "div", "br", "li", "ul", "ol", "h1", "h2", "h3",
               "h4", "h5", "h6", "table", "tr", "td", "th", "section",
               "article", "blockquote", "pre", "main", "body"}
_VOID_TAGS = {"br", "hr", "img", "meta", "link", "input"}

#: structural break sentinel — raw newlines in document text are plain
#: whitespace in HTML and must NOT split blocks; only block-tag
#: boundaries and <br> do
_BREAK = "\x00"


class _MainText(HTMLParser):
    """Tracks open elements on an explicit stack with a per-element
    chrome flag, closing by POP-TO-MATCH like a browser: an end tag
    pops up to its nearest matching start tag (silently discarding
    unclosed children such as the ubiquitous bare ``<li>``/``<p>``) and
    a stray end tag with no open match is ignored.  Plain depth
    counters are NOT enough — one unclosed tag inside a ``<nav>`` would
    desynchronize the depth and swallow the whole rest of the document
    as chrome."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.skip_depth = 0
        self.chrome_count = 0            # chrome-flagged entries open
        self.link_depth = 0              # ACTIVE <a> elements (see below)
        self.saw_chrome = False          # any semantic chrome signal?
        # entries are [tag, chrome_flag, link_active]: link_active marks
        # an <a> still counting toward link_depth — it is neutralized
        # (without popping) at any block boundary or new <a>, so one
        # forgotten </a> cannot mark the whole rest of the page as link
        # text and make the density fallback drop every block
        self.stack: list[list] = []
        #: str entries are _BREAK sentinels; tuples are (text, in_link)
        self.parts: list = []

    def _neutralize_links(self) -> None:
        """Stop counting every open <a> as link context.  Anchor text
        in real chrome never spans block boundaries, so for the density
        metric a block tag implicitly ends the inline link run — an
        unclosed <a> (ubiquitous author error) then poisons at most its
        own block, never the document."""
        if self.link_depth:
            for entry in self.stack:
                if entry[2]:
                    entry[2] = False
            self.link_depth = 0

    @staticmethod
    def _is_chrome(tag: str, attrs) -> bool:
        if tag in _CHROME_TAGS:
            return True
        for name, val in attrs:
            if name in ("class", "id") and val \
                    and _CHROME_CLASS_RE.search(val):
                return True
        return False

    def handle_starttag(self, tag, attrs):
        if tag in _VOID_TAGS:
            if tag == "br" and not self.skip_depth \
                    and not self.chrome_count:
                self.parts.append(_BREAK)
            return
        if tag in _SKIP_ENTIRELY:
            self.skip_depth += 1
            return
        if self.skip_depth:
            # tags inside a skipped subtree (template/noscript) must
            # not touch the content stack: an unclosed chrome tag in a
            # <template> would otherwise swallow the rest of the page
            return
        flag = self._is_chrome(tag, attrs)
        if tag in _BLOCK_TAGS or tag == "a":
            self._neutralize_links()   # block boundary / new link run
        self.stack.append([tag, flag, tag == "a"])
        if flag:
            self.chrome_count += 1
            self.saw_chrome = True
        elif not self.chrome_count and tag in _BLOCK_TAGS:
            self.parts.append(_BREAK)
        if tag == "a":
            self.link_depth += 1

    def handle_endtag(self, tag):
        if tag in _VOID_TAGS:
            return
        if tag in _SKIP_ENTIRELY:
            self.skip_depth = max(0, self.skip_depth - 1)
            return
        if self.skip_depth:
            return   # end tags inside a skipped subtree: ignore
        if tag in _BLOCK_TAGS:
            self._neutralize_links()   # block boundary ends link runs
        for i in range(len(self.stack) - 1, -1, -1):
            if self.stack[i][0] == tag:
                for t, flag, link_active in self.stack[i:]:
                    if flag:
                        self.chrome_count -= 1
                    if link_active:
                        self.link_depth -= 1
                del self.stack[i:]
                if not self.chrome_count and tag in _BLOCK_TAGS:
                    self.parts.append(_BREAK)
                return
        # no matching open tag: stray end tag, ignored (browser rule)

    def handle_data(self, data):
        if not self.skip_depth and not self.chrome_count:
            self.parts.append((data, self.link_depth > 0))


_NONWS_RE = re.compile(r"\S")


def extract_main_text(html: str) -> str:
    """Main content of an HTML document as newline-separated blocks."""
    p = _MainText()
    p.feed(html)
    p.close()
    # group the part stream into blocks at _BREAK sentinels
    blocks: list[list[tuple[str, bool]]] = [[]]
    for part in p.parts:
        if part == _BREAK:
            blocks.append([])
        else:
            blocks[-1].append(part)
    lines = []
    for block in blocks:
        raw_line = "".join(text for text, _ in block)
        line = re.sub(r"\s+", " ", raw_line).strip()
        if not line:
            continue
        if not p.saw_chrome:
            # density fallback: no semantic chrome anywhere on the page
            # — drop link-dominated blocks (anchor text > half the
            # block's non-whitespace characters)
            total = len(_NONWS_RE.findall(raw_line))
            link = sum(len(_NONWS_RE.findall(text))
                       for text, in_link in block if in_link)
            if 2 * link > total:
                continue
        lines.append(line)
    return "\n".join(lines)
