"""PII redaction: scrub emails / phone numbers / IPv4 addresses from a
text column. No warcio counterpart — LLM-pipeline operator per the build
brief (standard pretraining hygiene stage, cf. the C4/Dolma cleanup
recipes).

Shape at scale: a single stateless ``map_batches`` scan — no shuffle, no
state, embarrassingly parallel. The kernels are pyarrow.compute
``replace_substring_regex`` / ``count_substring_regex``, i.e. RE2 in
C++ over Arrow buffers (no Python per-row loop). RE2 is also DuckDB's
regex engine, so an external SQL oracle recomputes the identical
output with the same pattern strings (leftmost match semantics match).

Pattern notes (RE2-compatible by construction: no backreferences, no
lookaround):
  - email  : local@domain.tld, tld >= 2 alpha chars
  - phone  : international ``+`` form only (``+`` then >= 8 chars of
    digits/space/().-/ ending in a digit). Bare national formats like
    555-123-4567 are deliberately NOT matched: without the ``+`` anchor
    the pattern space collides with IPs, dates and id numbers, and a
    deterministic engine should under-match rather than shred numerics.
  - ipv4   : four 1-3 digit octets, word-bounded (no range check —
    999.0.0.1 redacts too; acceptable for a scrubber).

Replacement order is email -> phone -> ip so a dotted phone/IP can
never eat an address's digits mid-email. Counts are measured on the
ORIGINAL text (pre-redaction), one regex scan each.
"""
from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

EMAIL_RX = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_RX = r"\+[0-9][0-9 ().-]{6,}[0-9]"
IPV4_RX = r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b"

_RULES = (  # (name, pattern, replacement) in application order
    ("email", EMAIL_RX, "<EMAIL>"),
    ("phone", PHONE_RX, "<PHONE>"),
    ("ip", IPV4_RX, "<IP>"),
)


def redact_pii_batch(tbl: pa.Table, text_col: str = "text",
                     id_col: str = "doc_id") -> pa.Table:
    """One Arrow batch -> (doc_id, clean_text, n_email, n_phone, n_ip).
    Null text behaves as '' (0 counts, '' output)."""
    text = pc.fill_null(pc.cast(tbl[text_col], pa.large_string()), "")
    cols: dict = {id_col: pc.cast(tbl[id_col], pa.int64())}
    counts = {}
    red = text
    for name, rx, repl in _RULES:
        counts[name] = pc.cast(pc.count_substring_regex(text, rx),
                               pa.int64())
        red = pc.replace_substring_regex(red, rx, repl)
    cols["clean_text"] = red
    for name in ("email", "phone", "ip"):
        cols[f"n_{name}"] = counts[name]
    return pa.table(cols)


def redact_pii(ds, text_col: str = "text", id_col: str = "doc_id"):
    """(id, text) Dataset -> (id, clean_text, n_email, n_phone, n_ip)
    Dataset. Stateless single-pass scan, zero-copy Arrow batches."""
    return ds.map_batches(
        lambda t: redact_pii_batch(t, text_col=text_col, id_col=id_col),
        batch_format="pyarrow")
