"""Pure-Python WARC/ARC record codec, byte-compatible with warcio 1.8.1.

No Ray imports here: these functions are called inside ``map_batches``
stages and must stay cheap to pickle and import.
"""

from warcio_ray.codec.headers import HeaderBlock, parse_header_block, HeaderParseError
from warcio_ray.codec.digest import sha1_b32, digests_match
from warcio_ray.codec.records import (
    ParseOptions,
    ParsedRecord,
    parse_archive_bytes,
    decode_payload,
    ArchiveFormatError,
)
from warcio_ray.codec.build import (
    build_record,
    build_warcinfo,
    build_revisit,
    serialize_record,
    gzip_member,
)
