"""HTTP-style status line + ordered header parsing/serialization.

Behavior-compatible with the reference's header grammar
(``warcio/statusandheaders.py:236-308`` parse, ``:140-208`` serialize):

* headers are an *ordered list* of (name, value) pairs — order and
  duplicates are significant for byte-identical round-trips
* continuation lines (leading space/tab) append to the previous value
* a line without ``:`` is dropped
* each raw line is decoded utf-8 first, then iso-8859-1
* name is rstripped of space/tab, value is lstripped
* non-ascii header values are %-encoded on serialization per
  RFC 8187/5987 (``statusandheaders.py:180-208``)

The implementation is cursor-over-bytes rather than stream-pull: batches
arrive as in-memory Arrow cells, so there is no reason to simulate
file-like reads.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from typing import List, Optional, Sequence, Tuple
from urllib.parse import quote


class HeaderParseError(Exception):
    """Status line did not match any expected prefix."""

    def __init__(self, msg: str, statusline: str = ""):
        super().__init__(msg)
        self.statusline = statusline


class EndOfData(Exception):
    """Cursor exhausted where a status line was required."""


class ByteCursor:
    """Minimal readline-style cursor over an in-memory bytes buffer."""

    __slots__ = ("data", "pos")

    def __init__(self, data: bytes, pos: int = 0):
        self.data = data
        self.pos = pos

    def readline(self) -> bytes:
        nl = self.data.find(b"\n", self.pos)
        if nl == -1:
            line = self.data[self.pos:]
            self.pos = len(self.data)
        else:
            line = self.data[self.pos:nl + 1]
            self.pos = nl + 1
        return line

    def read(self, n: int = -1) -> bytes:
        if n < 0:
            out = self.data[self.pos:]
            self.pos = len(self.data)
        else:
            out = self.data[self.pos:self.pos + n]
            self.pos += len(out)
        return out

    def remaining(self) -> int:
        return len(self.data) - self.pos


def decode_line(raw: bytes) -> str:
    """utf-8 with iso-8859-1 fallback (statusandheaders.py:329-336)."""
    try:
        return raw.decode("utf-8")
    except UnicodeDecodeError:
        return raw.decode("iso-8859-1")


_ENCODE_PARAM_RX = re.compile(r'[=]["\']?([^;"]+)["\']?(?=[;]?)')


@dataclass
class HeaderBlock:
    """Parsed status line + ordered headers.

    ``pairs`` preserves order and duplicates. ``total_len`` is the raw
    byte length consumed (statusline + header lines + blank terminator),
    needed for payload_length accounting.
    """

    protocol: str = ""
    statusline: str = ""
    pairs: List[Tuple[str, str]] = field(default_factory=list)
    total_len: int = 0
    # lazy lowered-name index for get(): parse-side code calls get() ~5x
    # per record and the linear .lower() scan showed up hot in profiles
    _idx: Optional[dict] = field(default=None, repr=False, compare=False)

    # -- case-insensitive access ------------------------------------------
    def get(self, name: str, default: Optional[str] = None) -> Optional[str]:
        idx = self._idx
        if idx is None:
            idx = {}
            for n, v in self.pairs:
                low = n.lower()
                if low not in idx:  # first occurrence wins, like the scan
                    idx[low] = v
            self._idx = idx
        return idx.get(name.lower(), default)

    def replace(self, name: str, value: str) -> None:
        """Replace the *last* matching header in place, else append
        (mirrors statusandheaders.py:48-61 which scans from the end)."""
        self._idx = None
        low = name.lower()
        for i in range(len(self.pairs) - 1, -1, -1):
            if self.pairs[i][0].lower() == low:
                self.pairs[i] = (self.pairs[i][0], value)
                return
        self.pairs.append((name, value))

    def remove(self, name: str) -> bool:
        """Remove the last matching header only (statusandheaders.py:63-75
        deletes a single entry scanning from the end)."""
        self._idx = None
        low = name.lower()
        for i in range(len(self.pairs) - 1, -1, -1):
            if self.pairs[i][0].lower() == low:
                del self.pairs[i]
                return True
        return False

    def add(self, name: str, value: str) -> None:
        self._idx = None
        self.pairs.append((name, value))

    def statuscode(self) -> str:
        return self.statusline.split(" ", 1)[0]

    # -- serialization ----------------------------------------------------
    def to_str(self) -> str:
        first = self.protocol
        if first and self.statusline:
            first += " "
        if self.statusline:
            first += self.statusline
        out = [first + "\r\n"] if first else []
        for n, v in self.pairs:
            out.append(f"{n}: {v}\r\n")
        return "".join(out)

    def to_bytes(self, encoding: str = "utf-8") -> bytes:
        """Header block + blank-line terminator (statusandheaders.py:162-163)."""
        return self.to_str().encode(encoding) + b"\r\n"

    def to_ascii_bytes(self) -> bytes:
        """ASCII header buffer; %-encodes non-ascii values on demand
        (statusandheaders.py:165-208). Mutates pairs like the reference."""
        try:
            return self.to_str().encode("ascii") + b"\r\n"
        except (UnicodeEncodeError, UnicodeDecodeError):
            self._percent_encode_non_ascii()
            return self.to_str().encode("ascii") + b"\r\n"

    def _percent_encode_non_ascii(self, encoding: str = "UTF-8") -> None:
        self._idx = None

        def enc_param(m: re.Match) -> str:
            return "*={0}''".format(encoding) + quote(m.group(1))

        for i in range(len(self.pairs) - 1, -1, -1):
            name, value = self.pairs[i]
            try:
                value.encode("ascii")
                continue
            except UnicodeEncodeError:
                pass
            if ";" not in value:
                new_value = quote(value)
            else:
                new_value = _ENCODE_PARAM_RX.sub(enc_param, value)
                if new_value == value:
                    new_value = quote(value)
            self.pairs[i] = (name, new_value)


def split_status_prefix(statusline: str, prefixes: Sequence[str]) -> Optional[Tuple[str, str]]:
    """Case-insensitive prefix match; returns (PREFIX_UPPERCASED, rest)."""
    upper = statusline.upper()
    for p in prefixes:
        if upper.startswith(p):
            return upper[:len(p)], statusline[len(p):]
    return None


# a blank(ish) line terminates a header block: newline, optional
# spaces/tabs, newline (whitespace-only lines rstrip to '' like blanks)
_BLOCK_TERM_RX = re.compile(rb"\n[ \t]*\r?\n")


def _parse_header_block_fast(cur: ByteCursor, prefixes: Sequence[str],
                             verify: bool) -> Optional[HeaderBlock]:
    """Whole-block fast path: slice to the blank-line terminator, decode
    once, split once. Returns None when the block needs the per-line
    slow path (blank statusline, non-utf8 bytes). Semantics are
    line-for-line identical to the slow path (same rstrip/continuation/
    nameless-line rules, total_len in decoded characters)."""
    data = cur.data
    start = cur.pos
    m = _BLOCK_TERM_RX.search(data, start)
    end = m.end() if m else len(data)
    block = data[start:end]
    if not block:
        raise EndOfData()
    try:
        text = block.decode("utf-8")
    except UnicodeDecodeError:
        return None  # per-line latin-1 fallback needed

    raw_lines = text.split("\n")
    if text.endswith("\n"):
        raw_lines.pop()
    statusline = raw_lines[0].rstrip()
    if not statusline:
        return None  # empty-statusline corner: slow path handles exactly

    first_nl = data.find(b"\n", start)
    first_len = (first_nl + 1 - start) if first_nl != -1 else len(data) - start

    if verify:
        split = split_status_prefix(statusline, prefixes)
        if split is None:
            # mimic the slow path: only the first line was consumed
            cur.pos = start + first_len
            raise HeaderParseError(
                f"Expected Status Line starting with {list(prefixes)} - "
                f"Found: {statusline}",
                raw_lines[0] + ("\n" if first_nl != -1 else ""))
    else:
        parts = statusline.split(" ", 1)
        split = (parts[0], parts[1] if len(parts) > 1 else "")

    cur.pos = end
    pairs: List[Tuple[str, str]] = []
    idx = 1
    n = len(raw_lines)

    # inlined line loop (a nxt_line() closure here showed up hot)
    line = raw_lines[1].rstrip() if n > 1 else None
    idx = 2
    while line:
        name_value = line.split(":", 1)
        if len(name_value) == 2:
            name = name_value[0].rstrip(" \t")
            value: Optional[str] = name_value[1].lstrip()
        else:
            name = name_value[0]
            value = None
        nxt = raw_lines[idx].rstrip() if idx < n else None
        idx += 1
        while nxt and nxt[0] in " \t":
            if value is not None:
                value += nxt
            nxt = raw_lines[idx].rstrip() if idx < n else None
            idx += 1
        if value is not None:
            pairs.append((name, value))
        line = nxt

    return HeaderBlock(protocol=split[0], statusline=split[1].strip(),
                       pairs=pairs, total_len=len(text))


def parse_header_block(cur: ByteCursor,
                       prefixes: Sequence[str],
                       verify: bool = True,
                       first_line: Optional[str] = None) -> HeaderBlock:
    """Parse one status+headers block from the cursor.

    ``first_line`` optionally supplies an already-read status line (the
    archive scanner hands leftover lines forward the same way the
    reference threads ``next_line``, archiveiterator.py:118).
    """
    if first_line is None:
        fast = _parse_header_block_fast(cur, prefixes, verify)
        if fast is not None:
            return fast
        first_line = decode_line(cur.readline())

    total = len(first_line)
    statusline = first_line.rstrip()

    if total == 0:
        raise EndOfData()
    if not statusline:
        return HeaderBlock(total_len=total)

    if verify:
        split = split_status_prefix(statusline, prefixes)
        if split is None:
            raise HeaderParseError(
                f"Expected Status Line starting with {list(prefixes)} - Found: {statusline}",
                first_line)
    else:
        parts = statusline.split(" ", 1)
        split = (parts[0], parts[1] if len(parts) > 1 else "")

    pairs: List[Tuple[str, str]] = []
    raw = decode_line(cur.readline())
    total += len(raw)
    line = raw.rstrip()
    while line:
        name_value = line.split(":", 1)
        if len(name_value) == 2:
            name = name_value[0].rstrip(" \t")
            value: Optional[str] = name_value[1].lstrip()
        else:
            name = name_value[0]
            value = None

        raw = decode_line(cur.readline())
        total += len(raw)
        nxt = raw.rstrip()
        while nxt and nxt.startswith((" ", "\t")):
            if value is not None:
                value += nxt
            raw = decode_line(cur.readline())
            total += len(raw)
            nxt = raw.rstrip()

        if value is not None:
            pairs.append((name, value))
        line = nxt

    return HeaderBlock(protocol=split[0],
                       statusline=split[1].strip(),
                       pairs=pairs,
                       total_len=total)
