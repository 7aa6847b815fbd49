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

import numpy as np
import pandas as pd
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


def luhn_valid(digits: str) -> bool:
    """Luhn mod-10 checksum (ISO/IEC 7812) — exact integer arithmetic,
    mirrored by the SQL oracle's list_transform expression."""
    total = 0
    for i, ch in enumerate(reversed(digits), start=1):
        d = ord(ch) - 48
        if i % 2 == 0:
            d *= 2
            if d > 9:
                d -= 9
        total += d
    return total % 10 == 0


def luhn_scan(ds, id_col: str = "doc_id", text_col: str = "text"):
    """Checksum-validated PAN detection — the precision rung above the
    regex-only PII scan (redact_pii): a 13-19 digit run is only a
    credit-card-number candidate if its Luhn mod-10 checksum holds,
    which kills the order-id / timestamp false positives that make
    naive digit-run redaction unusable at corpus scale.

    Definition (RE2-safe, so the SQL oracle replays it exactly):
    candidates are MAXIMAL digit runs of length 13-19; n_valid counts
    those passing Luhn. Stateless map_batches scan, zero shuffle.
    Returns (id_col, n_digit_runs, n_valid_luhn) for every document.
    """
    import re

    run_rx = re.compile(r"\d+")

    def scan(batch: pd.DataFrame) -> pd.DataFrame:
        ids = batch[id_col].to_numpy(dtype="int64")
        n_runs = np.zeros(len(batch), dtype="int64")
        n_valid = np.zeros(len(batch), dtype="int64")
        for i, text in enumerate(batch[text_col].fillna("").astype(str)):
            cands = [r for r in run_rx.findall(text)
                     if 13 <= len(r) <= 19]
            n_runs[i] = len(cands)
            n_valid[i] = sum(1 for c in cands if luhn_valid(c))
        return pd.DataFrame({id_col: ids, "n_digit_runs": n_runs,
                             "n_valid_luhn": n_valid})

    return ds.select_columns([id_col, text_col]) \
        .map_batches(scan, batch_format="pandas")
