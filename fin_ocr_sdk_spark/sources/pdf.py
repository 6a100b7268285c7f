"""Minimal PDF text layer — the north rule's "PDF/layout parse" leg of
main-content extraction, pure stdlib (zlib), no external PDF libs in
this environment.

``encode_simple_pdf`` writes a deterministic single-font PDF 1.4 (one
content stream per page, optionally FlateDecode-compressed) and
``extract_pdf_text`` recovers per-page text by decoding each page's
content stream and replaying the text-showing operators:

- ``(string) Tj`` and ``(string) '`` — show string (the quote operator
  implies a line break first);
- ``[(a) -120 (b) ...] TJ`` — array form with kerning numbers
  (numbers are positioning, not text — skipped);
- ``Td/TD/T*`` — treated as line breaks for layout flattening;
- string escapes ``\\( \\) \\\\ \\n \\r \\t`` and octal ``\\ddd``.

This is the honest scope of a from-scratch extractor over the
generated corpus: real-world PDFs add fonts/CMaps/encryption that need
a native library; the Spark-side plumbing (binary column in, per-page
span rows out, goldens checked by the oracle) is the part this repo
demonstrates, mirroring how the image decoders are wired.
"""

from __future__ import annotations

import re
import zlib


def _pdf_escape(s: str) -> str:
    return s.replace("\\", r"\\").replace("(", r"\(").replace(")", r"\)")


def encode_simple_pdf(pages: "list[str]", compress: bool = True) -> bytes:
    """One page per input string; lines within a page split on \\n and
    emitted as successive Tj runs separated by Td line moves."""
    objs: list[bytes] = []

    def obj(body: bytes) -> int:
        objs.append(body)
        return len(objs)  # 1-based object number

    font_num = obj(b"<< /Type /Font /Subtype /Type1 "
                   b"/BaseFont /Helvetica >>")
    content_nums = []
    for text in pages:
        lines = text.split("\n")
        parts = ["BT /F1 12 Tf 72 720 Td"]
        for i, line in enumerate(lines):
            if i:
                parts.append("0 -14 Td")
            parts.append(f"({_pdf_escape(line)}) Tj")
        parts.append("ET")
        stream = " ".join(parts).encode("latin-1")
        if compress:
            stream = zlib.compress(stream)
            head = (b"<< /Length " + str(len(stream)).encode()
                    + b" /Filter /FlateDecode >>")
        else:
            head = b"<< /Length " + str(len(stream)).encode() + b" >>"
        content_nums.append(obj(head + b"\nstream\n" + stream
                                + b"\nendstream"))

    page_nums = []
    pages_num_placeholder = len(objs) + len(pages) + 1
    for cn in content_nums:
        page_nums.append(obj(
            b"<< /Type /Page /Parent " + str(pages_num_placeholder).encode()
            + b" 0 R /MediaBox [0 0 612 792] /Contents "
            + str(cn).encode() + b" 0 R /Resources << /Font << /F1 "
            + str(font_num).encode() + b" 0 R >> >> >>"))
    kids = b"[" + b" ".join(str(p).encode() + b" 0 R"
                            for p in page_nums) + b"]"
    pages_num = obj(b"<< /Type /Pages /Kids " + kids + b" /Count "
                    + str(len(page_nums)).encode() + b" >>")
    assert pages_num == pages_num_placeholder
    catalog_num = obj(b"<< /Type /Catalog /Pages "
                      + str(pages_num).encode() + b" 0 R >>")

    out = bytearray(b"%PDF-1.4\n")
    offsets = [0] * (len(objs) + 1)
    for i, body in enumerate(objs, start=1):
        offsets[i] = len(out)
        out += (str(i).encode() + b" 0 obj\n" + body + b"\nendobj\n")
    xref_at = len(out)
    out += b"xref\n0 " + str(len(objs) + 1).encode() + b"\n"
    out += b"0000000000 65535 f \n"
    for i in range(1, len(objs) + 1):
        out += (("%010d 00000 n \n" % offsets[i]).encode())
    out += (b"trailer\n<< /Size " + str(len(objs) + 1).encode()
            + b" /Root " + str(catalog_num).encode() + b" 0 R >>\n"
            + b"startxref\n" + str(xref_at).encode() + b"\n%%EOF\n")
    return bytes(out)


_OBJ_HEAD_RE = re.compile(rb"(\d+) 0 obj")
_LENGTH_RE = re.compile(rb"/Length (\d+)")
_CONTENTS_RE = re.compile(rb"/Contents (\d+) 0 R")
_TYPE_PAGE_RE = re.compile(rb"/Type\s*/Page\b(?!s)")


def _decode_pdf_string(raw: bytes) -> str:
    out = []
    i = 0
    n = len(raw)
    while i < n:
        b = raw[i]
        if b == 0x5C and i + 1 < n:  # backslash
            c = raw[i + 1]
            i += 2
            if c in b"nrtbf":
                out.append({0x6E: "\n", 0x72: "\r", 0x74: "\t",
                            0x62: "\b", 0x66: "\f"}[c])
            elif 0x30 <= c <= 0x37:  # octal, up to 3 digits
                digits = chr(c)
                while (i < n and len(digits) < 3
                       and 0x30 <= raw[i] <= 0x37):
                    digits += chr(raw[i])
                    i += 1
                out.append(chr(int(digits, 8)))
            else:
                out.append(chr(c))   # \( \) \\ and unknown escapes
        else:
            out.append(chr(b))
            i += 1
    return "".join(out)


def _tokenize_content(data: bytes):
    """Yield ('str', decoded) for string literals and ('op', name) for
    operators, skipping numbers/arrays — enough for the text layer."""
    i = 0
    n = len(data)
    while i < n:
        b = data[i]
        if b == 0x28:  # (
            depth = 1
            j = i + 1
            buf = bytearray()
            while j < n and depth:
                c = data[j]
                if c == 0x5C and j + 1 < n:
                    buf += data[j:j + 2]
                    j += 2
                    continue
                if c == 0x28:
                    depth += 1
                elif c == 0x29:
                    depth -= 1
                    if not depth:
                        break
                buf.append(c)
                j += 1
            yield ("str", _decode_pdf_string(bytes(buf)))
            i = j + 1
        elif (0x41 <= b <= 0x5A) or (0x61 <= b <= 0x7A) or b in (0x27, 0x2A):
            j = i
            while j < n and ((0x41 <= data[j] <= 0x5A)
                             or (0x61 <= data[j] <= 0x7A)
                             or data[j] in (0x27, 0x2A)):
                j += 1
            yield ("op", data[i:j].decode("latin-1"))
            i = j
        else:
            i += 1


def _stream_text(stream: bytes) -> str:
    """Replay text operators of one decoded content stream."""
    lines: list[list[str]] = [[]]
    pending: list[str] = []
    for kind, val in _tokenize_content(stream):
        if kind == "str":
            pending.append(val)
        else:
            if val in ("Tj", "TJ"):
                lines[-1].extend(pending)
                pending = []
            elif val in ("Td", "TD", "T*"):
                if lines[-1]:
                    lines.append([])
                pending = []
            elif val == "'":
                if lines[-1]:
                    lines.append([])
                lines[-1].extend(pending)
                pending = []
            elif val in ("Tf", "Tc", "Tw", "Tz", "TL", "Ts", "Tr"):
                pending = []   # operands were settings, not text
    return "\n".join("".join(parts) for parts in lines if parts)


def extract_pdf_text(data: bytes) -> "list[str]":
    """Per-page text: page objects located by /Type /Page, their
    /Contents streams decoded (FlateDecode or raw) and replayed."""
    if not data.startswith(b"%PDF"):
        raise ValueError("not a PDF")
    streams: dict[int, bytes] = {}
    page_content: list[int] = []
    # object walk honoring /Length: stream BYTES are sliced by the
    # declared length, never by searching for 'endstream'/'endobj' —
    # compressed output can legally contain either byte sequence, and
    # a delimiter search would truncate the stream or misalign every
    # later object.  Delimiter search remains only as the fallback for
    # streams with a missing/indirect /Length.
    pos = 0
    while True:
        m = _OBJ_HEAD_RE.search(data, pos)
        if not m:
            break
        num = int(m.group(1))
        body_start = m.end()
        s_idx = data.find(b"stream", body_start)
        e_idx = data.find(b"endobj", body_start)
        if s_idx != -1 and (e_idx == -1 or s_idx < e_idx):
            head = data[body_start:s_idx]
            ds = s_idx + len(b"stream")
            if data[ds:ds + 2] == b"\r\n":
                ds += 2
            elif data[ds:ds + 1] == b"\n":
                ds += 1
            lm = _LENGTH_RE.search(head)
            if lm:
                ln = int(lm.group(1))
                raw = data[ds:ds + ln]
                tail = data.find(b"endstream", ds + ln)
                pos = tail + len(b"endstream") if tail != -1 else ds + ln
            else:
                tail = data.find(b"endstream", ds)
                if tail == -1:
                    raise ValueError("unterminated PDF stream")
                raw = data[ds:tail]
                pos = tail + len(b"endstream")
            if b"/FlateDecode" in head:
                try:
                    raw = zlib.decompress(raw)
                except zlib.error as e:
                    raise ValueError(f"corrupt PDF stream: {e}")
            streams[num] = raw
        elif e_idx != -1:
            body = data[body_start:e_idx]
            if _TYPE_PAGE_RE.search(body):
                cm = _CONTENTS_RE.search(body)
                if cm:
                    page_content.append(int(cm.group(1)))
            pos = e_idx + len(b"endobj")
        else:
            break
    if not page_content:
        raise ValueError("no pages in PDF")
    return [_stream_text(streams.get(cn, b"")) for cn in page_content]
