"""Deterministic HTML rendering and vectorized text extraction.

The engine's per-row invariant (BASELINE.json input_hint) is byte-identical
extracted ``text`` per url. The reference repo has no text extractor, so —
like warcio's own golden files — the contract is self-hosted: the
single-process extractor below *defines* the golden ``text`` column when
pages are synthesized, and the distributed pipeline must reproduce it
byte-for-byte through Ray.

``extract_text_array`` is the hot path: a pure ``pyarrow.compute`` chain
(RE2 regex kernels over the whole column, zero Python per row). The
scalar ``extract_text`` is defined *through* the array version so the
single-process contract and the batch path cannot diverge.
"""

from __future__ import annotations

import html as _htmlmod
import re
from typing import List, Sequence

import pyarrow as pa
import pyarrow.compute as pc

# ---------------------------------------------------------------------------
# Rendering (used only to synthesize test/bench pages — FIXTURES.md T1)
# ---------------------------------------------------------------------------

_PAGE_TEMPLATE = (
    '<!DOCTYPE html>\n'
    '<html lang="{lang}">\n'
    '<head><meta charset="utf-8"><title>{title}</title>\n'
    '<style>body {{ margin: 0; }}</style>\n'
    '<script>var page_id = {page_id};</script>\n'
    '</head>\n'
    '<body>\n'
    '<article>\n{body}\n</article>\n'
    '<nav>\n{nav}\n</nav>\n'
    '</body>\n'
    '</html>\n'
)


def render_page(text: str, url: str, lang: str, page_id: int,
                links: Sequence[str] = ()) -> bytes:
    """Render a deterministic HTML page whose extracted text is stable."""
    title = f"doc {page_id}"
    paragraphs = "\n".join(
        "<p>{0}</p>".format(_htmlmod.escape(p)) if p else "<p></p>"
        for p in text.split("\n"))
    nav = "\n".join('<a href="{0}">link {1}</a>'.format(_htmlmod.escape(u), i)
                    for i, u in enumerate(links))
    page = _PAGE_TEMPLATE.format(lang=lang, title=_htmlmod.escape(title),
                                 page_id=page_id, body=paragraphs, nav=nav)
    return page.encode("utf-8")


# ---------------------------------------------------------------------------
# Extraction — vectorized over Arrow string arrays
# ---------------------------------------------------------------------------

# RE2-compatible patterns (no backreferences, so one pattern per block tag)
_DROP_SCRIPT = r"(?is)<script\b[^>]*>.*?</script>"
_DROP_STYLE = r"(?is)<style\b[^>]*>.*?</style>"
_DROP_HEAD = r"(?is)<head\b[^>]*>.*?</head>"
_BLOCK_BREAK = r"(?i)</(p|div|li|tr|h1|h2|h3|h4|h5|h6|article|nav|section|table|ul|ol|blockquote|title)>|<br[^>]*>"
_ANY_TAG = r"(?s)<[^>]*>"
_SPACE_RUNS = r"[ \t\r\f\v]+"
_MANY_NEWLINES = r"\n{2,}"

# entity set produced by html.escape plus the universally common ones
_ENTITIES = [("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'),
             ("&#x27;", "'"), ("&#39;", "'"), ("&nbsp;", " "),
             ("&amp;", "&")]  # &amp; LAST so &amp;lt; -> &lt; stays literal


def extract_text_array(html_col: pa.Array) -> pa.Array:
    """Extract visible text from a column of HTML bytes/strings.

    Fully vectorized: every step is a pyarrow.compute kernel over the
    whole array. Deterministic — this function IS the text contract.
    """
    if pa.types.is_binary(html_col.type) or pa.types.is_large_binary(html_col.type):
        s = pc.cast(html_col, pa.large_string())
    else:
        s = pc.cast(html_col, pa.large_string())
    for pat in (_DROP_SCRIPT, _DROP_STYLE, _DROP_HEAD):
        s = pc.replace_substring_regex(s, pat, "")
    s = pc.replace_substring_regex(s, _BLOCK_BREAK, "\n")
    s = pc.replace_substring_regex(s, _ANY_TAG, "")
    for ent, rep in _ENTITIES:
        s = pc.replace_substring(s, ent, rep)
    s = pc.replace_substring_regex(s, _SPACE_RUNS, " ")
    # trim spaces around newlines, collapse newline runs, strip ends
    s = pc.replace_substring_regex(s, r" ?\n ?", "\n")
    s = pc.replace_substring_regex(s, _MANY_NEWLINES, "\n")
    s = pc.utf8_trim_whitespace(s)
    return s


def extract_text(html: bytes) -> str:
    """Single-document extraction, defined through the array kernel so the
    scalar contract and the distributed batch path cannot diverge."""
    arr = pa.array([html], type=pa.large_binary())
    return extract_text_array(arr)[0].as_py()


_HREF_RX = re.compile(r'<a\s[^>]*href="([^"]*)"', re.IGNORECASE)


def extract_links(html: bytes) -> List[str]:
    """All href targets in document order (entity-unescaped)."""
    try:
        text = html.decode("utf-8")
    except UnicodeDecodeError:
        text = html.decode("latin-1")
    return [_htmlmod.unescape(m) for m in _HREF_RX.findall(text)]


_ANCHOR_RX = re.compile(
    r'<a\s[^>]*href="([^"]*)"[^>]*>(.*?)</a>',
    re.IGNORECASE | re.DOTALL)
_INNER_TAG_RX = re.compile(r"<[^>]*>", re.DOTALL)
_WS_RUN_RX = re.compile(r"\s+")


def extract_anchors(html: bytes) -> List[tuple]:
    """(href, anchor_text) pairs in document order: inner tags
    stripped, entities unescaped, whitespace collapsed/trimmed —
    the anchor-text form search/training pipelines aggregate."""
    try:
        text = html.decode("utf-8")
    except UnicodeDecodeError:
        text = html.decode("latin-1")
    out = []
    for href, inner in _ANCHOR_RX.findall(text):
        label = _WS_RUN_RX.sub(" ", _INNER_TAG_RX.sub("", inner)).strip()
        out.append((_htmlmod.unescape(href), _htmlmod.unescape(label)))
    return out
