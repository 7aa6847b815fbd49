"""Datetime / ISO-8601 / 14-digit-timestamp conversions.

Reproduces the reference's lenient semantics (timeutils.py:28-393),
notably the pad-up + per-field clamping of ``timestamp_to_datetime``
(pad short timestamps toward period end, clamp each field into range,
non-numeric fields -> max). pyarrow.compute has no equivalent of the
clamping behavior, so these stay scalar Python; they are only used on
header fields, never in a hot per-byte loop.
"""

from __future__ import annotations

import calendar
import re
from datetime import datetime, timezone
from email.utils import formatdate, parsedate

_SPLIT_NON_DIGIT = re.compile(r"[^\d]")

_PAD_6_UP = "299912"
_PAD_MICRO = "000000"


def iso_date_to_datetime(string: str) -> datetime:
    nums = _SPLIT_NON_DIGIT.split(string)
    if nums and nums[-1] == "":
        nums = nums[:-1]
    if len(nums) == 7:
        micro = nums[6][:6]
        nums[6] = micro + _PAD_MICRO[len(micro):]
    return datetime(*(int(n) for n in nums))


def datetime_to_iso_date(dt: datetime, use_micros: bool = False) -> str:
    if not use_micros:
        return dt.strftime("%Y-%m-%dT%H:%M:%SZ")
    return dt.isoformat() + "Z"


def datetime_to_timestamp14(dt: datetime) -> str:
    return dt.strftime("%Y%m%d%H%M%S")


def iso_date_to_timestamp14(string: str) -> str:
    return datetime_to_timestamp14(iso_date_to_datetime(string))


def timestamp14_to_iso_date(string: str) -> str:
    return datetime_to_iso_date(timestamp14_to_datetime(string))


def pad_timestamp(string: str, pad_str: str = _PAD_6_UP) -> str:
    if len(string) < len(pad_str):
        string = string + pad_str[len(string):]
    return string


def _clamped_field(s: str, start: int, end: int, lo: int, hi: int) -> int:
    if len(s) < end:
        return hi
    try:
        return max(lo, min(int(s[start:end]), hi))
    except ValueError:
        return hi


def timestamp14_to_datetime(string: str) -> datetime:
    """Lenient 14-digit timestamp parse with pad-up + per-field clamping."""
    string = pad_timestamp(string)
    year = _clamped_field(string, 0, 4, 1900, 2999)
    month = _clamped_field(string, 4, 6, 1, 12)
    day = _clamped_field(string, 6, 8, 1, calendar.monthrange(year, month)[1])
    hour = _clamped_field(string, 8, 10, 0, 23)
    minute = _clamped_field(string, 10, 12, 0, 59)
    second = _clamped_field(string, 12, 14, 0, 59)
    return datetime(year, month, day, hour, minute, second)


def http_date_to_datetime(string: str) -> datetime:
    return datetime(*parsedate(string)[:6])


def datetime_to_http_date(dt: datetime) -> str:
    return formatdate(timeval=calendar.timegm(dt.utctimetuple()),
                      localtime=False, usegmt=True)
