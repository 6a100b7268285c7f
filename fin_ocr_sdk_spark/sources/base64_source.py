"""Base64 / data-URL media source — the server-side analog of the
reference's string request buffers.

The reference accepts images as base64 strings (src/image.ts:89 "If
buffer is a string, it is base64", decoded at src/check.ts:198 via
platform.base64.decode) and, in the browser, from DOM elements
(Image.fromHTMLElement, src/image.ts:145-151).  On Spark the analog is
a media table whose payload column holds base64 text or data URLs
(``data:image/png;base64,...``) — e.g. scraped HTML image payloads.

Decoding stays ENTIRELY in Catalyst (regexp prefix strip + unbase64,
both JVM-side codegen) — no python in the path; the result feeds
``extract_spans`` like any binary media table (the auto strategy
routes derived columns through the arrow join path)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_PREFIX_RE = r"^data:image/([\w.+-]+);base64,"

# data-URL MIME subtype → codec format name (sources/codecs.py aliases)
_MIME_MAP = {"png": "png", "bmp": "bmp", "tiff": "tiff", "tif": "tiff",
             "jpeg": "jpeg", "jpg": "jpeg", "gif": "gif"}


def decode_base64_media(media: DataFrame, col: str = "image_b64",
                        format_col: str | None = None) -> DataFrame:
    """(…, ``col`` string) → same DataFrame with binary ``image`` and
    string ``format`` columns replacing ``col``.

    ``format`` comes from ``format_col`` when given, else from the
    data-URL MIME subtype (bare base64 with no format column yields
    NULL format — the decode kernel then sniffs magic bytes, matching
    the reference's trust-the-caller behavior)."""
    mime = F.lower(F.regexp_extract(F.col(col), _PREFIX_RE, 1))
    mapping = F.create_map(
        *[F.lit(x) for kv in _MIME_MAP.items() for x in kv])
    if format_col is not None:
        fmt = F.col(format_col)
    else:
        fmt = F.when(mime != "", mapping[mime])
    payload = F.regexp_replace(F.col(col), _PREFIX_RE, "")
    out = (media.withColumn("image", F.unbase64(payload))
           .withColumn("format", fmt))
    return out.drop(col) if col not in ("image", "format") else out
