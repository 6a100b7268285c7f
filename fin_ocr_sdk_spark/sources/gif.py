"""GIF87a/89a codec — pure stdlib + NumPy (no imaging libraries).

The reference decodes GIF via Jimp (src/image.ts:63-87, src/util.ts:60-77).
Here: grayscale-palette encoder (single frame, global 256-entry gray
ramp) and a general decoder (global/local palettes, extensions skipped,
interlace supported, first frame only — the pipeline consumes stills).
GIF is lossless for 8-bit grayscale sources, so round-trips are exact.
"""

from __future__ import annotations

import struct

import numpy as np

_GRAY_W = np.array([0.299, 0.587, 0.114])


def encode_gif(img: np.ndarray) -> bytes:
    assert img.dtype == np.uint8 and img.ndim == 2
    h, w = img.shape
    out = bytearray()
    out += b"GIF89a"
    out += struct.pack("<HHBBB", w, h, 0xF7, 0, 0)  # global table, 8-bit
    for i in range(256):  # gray ramp palette
        out += bytes((i, i, i))
    out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0)
    out.append(8)  # LZW min code size
    out += _lzw_encode(img.reshape(-1), 8)
    out += b"\x00\x3b"  # block terminator + trailer
    return bytes(out)


def _lzw_encode(indices: np.ndarray, min_code_size: int) -> bytes:
    clear = 1 << min_code_size
    eoi = clear + 1
    acc = 0
    nbits = 0
    packed = bytearray()

    def put(code: int, size: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits  # LSB-first packing
        nbits += size
        while nbits >= 8:
            packed.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    table: dict[bytes, int] = {bytes([i]): i for i in range(clear)}
    next_code = eoi + 1
    code_size = min_code_size + 1
    put(clear, code_size)
    data = indices.tobytes()
    prefix = b""
    for i in range(len(data)):
        k = data[i:i + 1]
        cand = prefix + k
        if cand in table:
            prefix = cand
            continue
        put(table[prefix], code_size)
        table[cand] = next_code
        next_code += 1
        if next_code > (1 << code_size) and code_size < 12:
            code_size += 1
        elif next_code >= 4096:
            put(clear, code_size)
            table = {bytes([j]): j for j in range(clear)}
            next_code = eoi + 1
            code_size = min_code_size + 1
        prefix = k
    if prefix:
        put(table[prefix], code_size)
        # the decoder appends an entry for this emission and may grow
        # its code size before reading EOI — mirror that bookkeeping
        next_code += 1
        if next_code > (1 << code_size) and code_size < 12:
            code_size += 1
    put(eoi, code_size)
    if nbits:
        packed.append(acc & 0xFF)
    # wrap in <=255-byte sub-blocks
    out = bytearray()
    for i in range(0, len(packed), 255):
        chunk = packed[i:i + 255]
        out.append(len(chunk))
        out += chunk
    return bytes(out)


def decode_gif(data: bytes) -> np.ndarray:
    if data[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF")
    w, h, packed, _bg, _ar = struct.unpack("<HHBBB", data[6:13])
    pos = 13
    global_palette = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        global_palette = np.frombuffer(
            data[pos:pos + n * 3], dtype=np.uint8).reshape(n, 3)
        pos += n * 3
    while pos < len(data):
        block = data[pos]
        pos += 1
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension: label + sub-blocks
            pos += 1
            while data[pos]:
                pos += 1 + data[pos]
            pos += 1
            continue
        if block != 0x2C:
            raise ValueError(f"unexpected GIF block 0x{block:02x}")
        ix, iy, iw, ih, ipacked = struct.unpack("<HHHHB", data[pos:pos + 9])
        pos += 9
        palette = global_palette
        if ipacked & 0x80:
            n = 2 << (ipacked & 0x07)
            palette = np.frombuffer(
                data[pos:pos + n * 3], dtype=np.uint8).reshape(n, 3)
            pos += n * 3
        if palette is None:
            raise ValueError("GIF image without a palette")
        min_code_size = data[pos]
        pos += 1
        lzw = bytearray()
        while data[pos]:
            ln = data[pos]
            lzw += data[pos + 1:pos + 1 + ln]
            pos += 1 + ln
        pos += 1
        indices = _lzw_decode(bytes(lzw), min_code_size, iw * ih)
        frame = indices.reshape(ih, iw)
        if ipacked & 0x40:  # interlaced: reorder rows
            deint = np.zeros_like(frame)
            rows = (list(range(0, ih, 8)) + list(range(4, ih, 8)) +
                    list(range(2, ih, 4)) + list(range(1, ih, 2)))
            deint[rows] = frame
            frame = deint
        gray_palette = np.clip(
            np.round(palette.astype(np.float64) @ _GRAY_W), 0, 255
        ).astype(np.uint8)
        out = np.zeros((h, w), dtype=np.uint8)
        out[iy:iy + ih, ix:ix + iw] = gray_palette[frame]
        return out  # first frame only
    raise ValueError("no image data in GIF")


def _lzw_decode(data: bytes, min_code_size: int, expect: int) -> np.ndarray:
    clear = 1 << min_code_size
    eoi = clear + 1
    code_size = min_code_size + 1
    acc = 0
    nbits = 0
    pos = 0
    n = len(data)

    # the hot loop runs once per output code: keep the table length and
    # the code-size-derived constants in locals (len()/shift per code
    # measurably dominated), and rebuild the base table by copy
    base: list[bytes] = [bytes([i]) for i in range(clear)] + [b"", b""]
    table = base.copy()
    tlen = clear + 2
    mask = (1 << code_size) - 1
    grow_at = 1 << code_size
    out: list[bytes] = []
    out_append = out.append
    table_append = table.append
    prev: bytes | None = None
    total = 0
    while total < expect:
        while nbits < code_size:
            if pos >= n:
                break  # truncated stream: return what we have
            acc |= data[pos] << nbits
            pos += 1
            nbits += 8
        if nbits < code_size:
            break
        code = acc & mask
        acc >>= code_size
        nbits -= code_size
        if code == clear:
            table = base.copy()
            table_append = table.append
            tlen = clear + 2
            code_size = min_code_size + 1
            mask = (1 << code_size) - 1
            grow_at = 1 << code_size
            prev = None
            continue
        if code == eoi:
            break
        if code < tlen:
            entry = table[code]
            if prev is not None:
                table_append(prev + entry[:1])
                tlen += 1
        elif code == tlen and prev is not None:
            entry = prev + prev[:1]
            table_append(entry)
            tlen += 1
        else:
            raise ValueError("corrupt GIF LZW stream")
        out_append(entry)
        total += len(entry)
        prev = entry
        if tlen == grow_at and code_size < 12:
            code_size += 1
            mask = (1 << code_size) - 1
            grow_at <<= 1
    flat = b"".join(out)[:expect]
    return np.frombuffer(flat, dtype=np.uint8).copy()
