"""HTML structural features — the markup-side quality/curation
signals (tag density, link count, paragraph count, nav/anchor text
mass, text-to-html size) that web-corpus pipelines gate on before any
text-level scoring (boilerplate-heavy and link-farm pages show up
here without touching a parser).

Scale shape: ONE stateless ``map_batches`` scan over the pages layout,
every feature a pyarrow.compute RE2 kernel over the whole column
(zero Python per row); output is a narrow int64 frame. All features
are exact integer counts/lengths — ratios (link density,
text-to-html) are left to consumers as numerator/denominator pairs so
results stay hash-comparable.

No reference counterpart (warcio stops at the archive layer); the
page shape contract is warcio_ray.html.render_page.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

__all__ = ["html_features"]

_TAG = r"<[^>]*>"
_A_OPEN = r"(?i)<a[ >]"
_P_OPEN = r"(?i)<p[ >]"
_NAV_BODY = r"(?s)<nav>(?P<nav>.*?)</nav>"


def html_features(pages_ds, id_regex: str = r"/doc/(?P<id>\d+)$"):
    """Stateless feature scan over a pages Dataset (url, html, text).
    Returns (doc_id, html_bytes, text_chars, n_tags, n_links,
    n_paras, nav_text_chars) — doc_id parsed from the url via
    ``id_regex``, nav_text_chars = visible characters inside the first
    <nav> block (anchor-text mass, the link-density numerator)."""
    def feats(batch: pa.Table) -> pa.Table:
        url = pc.cast(batch["url"], pa.large_string())
        doc_id = pc.cast(pc.struct_field(
            pc.extract_regex(url, id_regex), "id"), pa.int64())
        html_b = batch["html"]
        html = pc.cast(html_b, pa.large_string())
        nav = pc.struct_field(pc.extract_regex(html, _NAV_BODY), "nav")
        nav_text = pc.replace_substring_regex(nav, _TAG, "")
        # a page without a <nav> block scores 0, not null
        nav_chars = pc.coalesce(pc.utf8_length(nav_text),
                                pa.scalar(0, pa.int32()))
        return pa.table({
            "doc_id": doc_id,
            "html_bytes": pc.cast(pc.binary_length(html_b),
                                  pa.int64()),
            "text_chars": pc.cast(
                pc.utf8_length(pc.cast(batch["text"],
                                       pa.large_string())),
                pa.int64()),
            "n_tags": pc.cast(pc.count_substring_regex(html, _TAG),
                              pa.int64()),
            "n_links": pc.cast(pc.count_substring_regex(html, _A_OPEN),
                               pa.int64()),
            "n_paras": pc.cast(pc.count_substring_regex(html, _P_OPEN),
                               pa.int64()),
            "nav_text_chars": pc.cast(nav_chars, pa.int64()),
        })

    return pages_ds.map_batches(feats, batch_format="pyarrow")


def extract_meta_fields(pages_ds, id_regex: str = r"/doc/(?P<id>\d+)$"):
    """Structured FIELD extraction from markup (the microdata/metadata
    harvest step of a web pipeline) — where ``html_features`` counts,
    this EXTRACTS: the declared language (<html lang=...>), the
    <title> text, the embedded page_id script variable, and the nav
    link count, each via one RE2 ``extract_regex`` kernel over the
    whole column (zero Python per row, zero-copy Arrow in/out).

    Returns (doc_id, lang_attr, title, page_id, n_nav_links); pages
    missing a field yield null (extract_regex semantics), which the
    renderer contract never produces — so nulls are a data-quality
    signal, not a code path."""
    def fields(batch: pa.Table) -> pa.Table:
        url = pc.cast(batch["url"], pa.large_string())
        doc_id = pc.cast(pc.struct_field(
            pc.extract_regex(url, id_regex), "id"), pa.int64())
        html = pc.cast(batch["html"], pa.large_string())
        lang = pc.struct_field(pc.extract_regex(
            html, r'<html lang="(?P<lang>[^"]*)">'), "lang")
        title = pc.struct_field(pc.extract_regex(
            html, r"<title>(?P<t>[^<]*)</title>"), "t")
        pid = pc.cast(pc.struct_field(pc.extract_regex(
            html, r"var page_id = (?P<pid>\d+);"), "pid"), pa.int64())
        nav = pc.struct_field(pc.extract_regex(
            html, r"(?s)<nav>(?P<nav>.*?)</nav>"), "nav")
        n_nav = pc.coalesce(
            pc.cast(pc.count_substring_regex(nav, r"(?i)<a[ >]"),
                    pa.int64()),
            pa.scalar(0, pa.int64()))
        return pa.table({"doc_id": doc_id, "lang_attr": lang,
                         "title": title, "page_id": pid,
                         "n_nav_links": n_nav})

    return pages_ds.map_batches(fields, batch_format="pyarrow")
