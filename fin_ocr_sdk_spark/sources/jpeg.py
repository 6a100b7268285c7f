"""Baseline JPEG codec — pure stdlib + NumPy (no imaging libraries).

The reference decodes JPEG via Jimp (src/image.ts:63-87 format enum,
src/util.ts:60-77 decode); this environment has no PIL/cv2, so the
baseline sequential DCT process (ITU-T.81) is implemented here:

- encoder: grayscale only (what fixtures synthesize) — level shift,
  8x8 block DCT (one einsum over all blocks), quality-scaled Annex-K
  luminance quantization, zigzag, standard Huffman tables written as
  DHT segments.
- decoder: any baseline JPEG (1 or 3 components, arbitrary sampling
  factors, DRI/RSTn, tables from the file's own DQT/DHT).  Output is
  grayscale: for YCbCr JPEGs that is exactly the Y plane (JPEG defines
  Y = 0.299R+0.587G+0.114B — the same weights the rest of this repo
  uses for gray), so chroma blocks are entropy-decoded only to keep
  the bitstream in sync and never dequantized or transformed.

Entropy coding is the one inherently serial part; the decoder uses an
8-bit prefix lookup table (libjpeg's trick) so common symbols cost one
dict-free step.  All block math is vectorized NumPy.
"""

from __future__ import annotations

import struct

import numpy as np

# Annex K.1 luminance quantization table, raster order.
_QUANT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99], dtype=np.int32).reshape(8, 8)

# Annex K.3 standard Huffman tables: (bits[1..16], huffval)
_DC_LUMA_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
_DC_LUMA_VALS = list(range(12))
_AC_LUMA_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
_AC_LUMA_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
    0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
    0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
    0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
    0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
    0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA]


def _zigzag() -> np.ndarray:
    """Raster index for each zigzag position (length 64)."""
    out = []
    for s in range(15):
        diag = [(i, s - i) for i in range(max(0, s - 7), min(s, 7) + 1)]
        if s % 2 == 0:
            diag = diag[::-1]
        out.extend(r * 8 + c for r, c in diag)
    return np.array(out, dtype=np.int64)


_ZIGZAG = _zigzag()

_DCT_T = np.array([[
    (np.sqrt(1 / 8) if k == 0 else np.sqrt(2 / 8)) *
    np.cos((2 * n + 1) * k * np.pi / 16)
    for n in range(8)] for k in range(8)])


def _build_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length), canonical order."""
    codes: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


def _scaled_quant(quality: int) -> np.ndarray:
    quality = max(1, min(100, quality))
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    q = (_QUANT_LUMA * scale + 50) // 100
    return np.clip(q, 1, 255).astype(np.int32)


class _BitWriter:
    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def put(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            byte = (self.acc >> (self.nbits - 8)) & 0xFF
            self.buf.append(byte)
            if byte == 0xFF:
                self.buf.append(0x00)  # byte stuffing
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> bytes:
        if self.nbits:
            pad = 8 - self.nbits
            self.put((1 << pad) - 1, pad)  # 1-fill per T.81 F.1.2.3
        return bytes(self.buf)


def _dht_segment(tc_th: int, bits: list[int], vals: list[int]) -> bytes:
    payload = bytes([tc_th]) + bytes(bits) + bytes(vals)
    return b"\xff\xc4" + struct.pack(">H", len(payload) + 2) + payload


def encode_jpeg(img: np.ndarray, quality: int = 92) -> bytes:
    """Grayscale baseline JPEG."""
    assert img.dtype == np.uint8 and img.ndim == 2
    h, w = img.shape
    ph, pw = (h + 7) & ~7, (w + 7) & ~7
    padded = np.pad(img, ((0, ph - h), (0, pw - w)), mode="edge")
    quant = _scaled_quant(quality)
    # blockify -> DCT -> quantize, all vectorized
    blocks = (padded.reshape(ph // 8, 8, pw // 8, 8)
              .transpose(0, 2, 1, 3)
              .reshape(-1, 8, 8).astype(np.float64) - 128.0)
    # D @ B @ D.T as two batched matmuls: einsum's 3-operand path is
    # interpreted (no BLAS) and measured ~50x slower on 10k+ blocks
    coef = _DCT_T @ blocks @ _DCT_T.T
    q = np.round(coef / quant).astype(np.int32)
    zz = q.reshape(-1, 64)[:, _ZIGZAG]  # (n_blocks, 64) zigzag order

    dc_codes = _build_codes(_DC_LUMA_BITS, _DC_LUMA_VALS)
    ac_codes = _build_codes(_AC_LUMA_BITS, _AC_LUMA_VALS)
    bw = _BitWriter()
    prev_dc = 0
    for blk in zz:
        diff = int(blk[0]) - prev_dc
        prev_dc = int(blk[0])
        size = int(abs(diff)).bit_length()
        c, ln = dc_codes[size]
        bw.put(c, ln)
        if size:
            bw.put(diff if diff > 0 else diff + (1 << size) - 1, size)
        run = 0
        nz = np.nonzero(blk[1:])[0]
        last = nz[-1] + 1 if len(nz) else 0
        for k in range(1, last + 1):
            v = int(blk[k])
            if v == 0:
                run += 1
                continue
            while run > 15:
                c, ln = ac_codes[0xF0]  # ZRL
                bw.put(c, ln)
                run -= 16
            size = abs(v).bit_length()
            c, ln = ac_codes[(run << 4) | size]
            bw.put(c, ln)
            bw.put(v if v > 0 else v + (1 << size) - 1, size)
            run = 0
        if last < 63:
            c, ln = ac_codes[0x00]  # EOB
            bw.put(c, ln)
    entropy = bw.flush()

    qz = quant.reshape(-1)[_ZIGZAG]
    parts = [
        b"\xff\xd8",                                       # SOI
        b"\xff\xdb" + struct.pack(">H", 67) + b"\x00" +    # DQT (8-bit, id 0)
        bytes(int(x) for x in qz),
        b"\xff\xc0" + struct.pack(">HBHHB", 11, 8, h, w, 1) +  # SOF0
        bytes([1, 0x11, 0]),                               # comp 1, 1x1, q0
        _dht_segment(0x00, _DC_LUMA_BITS, _DC_LUMA_VALS),
        _dht_segment(0x10, _AC_LUMA_BITS, _AC_LUMA_VALS),
        b"\xff\xda" + struct.pack(">HB", 8, 1) +           # SOS
        bytes([1, 0x00, 0, 63, 0]),
        entropy,
        b"\xff\xd9",                                       # EOI
    ]
    return b"".join(parts)


# --------------------------------------------------------------- decoder

class _HuffTable:
    """Full 16-bit-prefix decode LUT: any canonical code (≤16 bits,
    ITU-T.81 C.2) resolves with one list index — no per-length scan.
    65,536 entries are filled per table with vectorized numpy slices
    (a few hundred µs), then kept as plain python lists because scalar
    list indexing beats ndarray indexing in the per-symbol loop.
    Length 0 marks an invalid prefix."""

    def __init__(self, bits: list[int], vals: list[int]) -> None:
        sym = np.zeros(1 << 16, dtype=np.int16)
        ln = np.zeros(1 << 16, dtype=np.int16)
        code = 0
        k = 0
        for length in range(1, 17):
            for _ in range(bits[length - 1]):
                start = code << (16 - length)
                span = 1 << (16 - length)
                sym[start:start + span] = vals[k]
                ln[start:start + span] = length
                code += 1
                k += 1
            code <<= 1
        self.sym16 = sym.tolist()
        self.len16 = ln.tolist()


_TABLE_CACHE: dict[tuple, _HuffTable] = {}


def _huff_table(bits: list[int], vals: list[int]) -> _HuffTable:
    """Memoized table build: the 65,536-entry LUT costs ~1 ms and a
    corpus's images overwhelmingly share their DHT segments (every
    image from one encoder does), so per-process caching amortizes it
    to zero.  Bounded: distinct tables are tiny in practice; cap guards
    an adversarial stream of unique tables."""
    key = (tuple(bits), tuple(vals))
    t = _TABLE_CACHE.get(key)
    if t is None:
        if len(_TABLE_CACHE) >= 64:
            _TABLE_CACHE.clear()
        t = _TABLE_CACHE[key] = _HuffTable(bits, vals)
    return t


def decode_jpeg(data: bytes) -> np.ndarray:
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG")
    pos = 2
    quants: dict[int, np.ndarray] = {}
    huff_dc: dict[int, _HuffTable] = {}
    huff_ac: dict[int, _HuffTable] = {}
    frame = None
    restart_interval = 0
    while pos < len(data):
        if data[pos] != 0xFF:
            pos += 1
            continue
        marker = data[pos + 1]
        pos += 2
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            continue
        if marker == 0xD9:
            break
        (seg_len,) = struct.unpack(">H", data[pos:pos + 2])
        seg = data[pos + 2:pos + seg_len]
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 0xF
                p += 1
                if pq:
                    t = np.frombuffer(seg[p:p + 128],
                                      dtype=">u2").astype(np.int32)
                    p += 128
                else:
                    t = np.frombuffer(seg[p:p + 64],
                                      dtype=np.uint8).astype(np.int32)
                    p += 64
                raster = np.zeros(64, dtype=np.int32)
                raster[_ZIGZAG] = t
                quants[tq] = raster.reshape(8, 8)
        elif marker in (0xC0, 0xC1):  # SOF0/1 baseline
            precision, fh, fw, nc = struct.unpack(">BHHB", seg[:6])
            if precision != 8:
                raise ValueError("only 8-bit JPEG supported")
            if fh < 1 or fw < 1:
                raise ValueError("bad JPEG frame dimensions")
            comps = []
            for c in range(nc):
                cid, hv, tq = seg[6 + c * 3:9 + c * 3]
                h, v = hv >> 4, hv & 0xF
                # zero sampling factors would make the MCU size 0 and
                # crash the scan with ZeroDivisionError — corrupt
                # headers must surface as ValueError (micr:error row)
                if not (1 <= h <= 4 and 1 <= v <= 4):
                    raise ValueError(f"bad JPEG sampling factors {hv:#x}")
                comps.append({"id": cid, "h": h, "v": v, "tq": tq})
            frame = {"h": fh, "w": fw, "comps": comps}
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(seg):
                tc, th = seg[p] >> 4, seg[p] & 0xF
                bits = list(seg[p + 1:p + 17])
                n = sum(bits)
                vals = list(seg[p + 17:p + 17 + n])
                (huff_ac if tc else huff_dc)[th] = _huff_table(bits,
                                                               vals)
                p += 17 + n
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", seg[:2])
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise ValueError("SOS before SOF")
            ns = seg[0]
            scan = []
            for c in range(ns):
                cs, tables = seg[1 + c * 2], seg[2 + c * 2]
                matches = [x for x in frame["comps"] if x["id"] == cs]
                if not matches:
                    # bare next() would raise StopIteration here and
                    # escape decode_image's ValueError contract
                    raise ValueError(f"SOS references unknown "
                                     f"component {cs}")
                scan.append((matches[0], tables >> 4, tables & 0xF))
            entropy_start = pos + seg_len
            return _decode_scan(data, entropy_start, frame, scan, quants,
                                huff_dc, huff_ac, restart_interval)
        elif 0xC2 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
            raise ValueError("only baseline (SOF0/1) JPEG supported")
        pos += seg_len
    raise ValueError("no scan data in JPEG")


def _decode_scan(data: bytes, pos: int, frame: dict, scan: list,
                 quants: dict, huff_dc: dict, huff_ac: dict,
                 restart_interval: int) -> np.ndarray:
    # split entropy data into restart segments, unstuffing 0xFF00
    segments: list[bytes] = []
    cur = bytearray()
    i = pos
    n = len(data)
    while i < n:
        b = data[i]
        if b != 0xFF:
            cur.append(b)
            i += 1
            continue
        nxt = data[i + 1] if i + 1 < n else 0xD9
        if nxt == 0x00:
            cur.append(0xFF)
            i += 2
        elif 0xD0 <= nxt <= 0xD7:
            segments.append(bytes(cur))
            cur = bytearray()
            i += 2
        else:
            break  # EOI or next marker
    segments.append(bytes(cur))

    hmax = max(c["h"] for c in frame["comps"])
    vmax = max(c["v"] for c in frame["comps"])
    mcu_w, mcu_h = 8 * hmax, 8 * vmax
    mcus_x = (frame["w"] + mcu_w - 1) // mcu_w
    mcus_y = (frame["h"] + mcu_h - 1) // mcu_h
    n_mcus = mcus_x * mcus_y

    # luminance = first scan component; chroma blocks are entropy-decoded
    # to stay in sync but their coefficients are discarded
    luma_comp, luma_dc_id, luma_ac_id = scan[0]
    lh, lv = luma_comp["h"], luma_comp["v"]
    luma_quant = quants[luma_comp["tq"]].reshape(-1).astype(np.float64)
    luma_blocks = np.zeros((n_mcus * lh * lv, 64), dtype=np.float64)
    lb = 0

    # scan plan hoisted out of the MCU loop: (LUT lists, per-MCU block
    # count, luma?) per component, preds as a list — the dict lookups
    # and per-MCU re-derivation measurably dominate at 10k+ MCUs
    plan = [(huff_dc[dc_id].len16, huff_dc[dc_id].sym16,
             huff_ac[ac_id].len16, huff_ac[ac_id].sym16,
             comp["h"] * comp["v"], comp is luma_comp)
            for comp, dc_id, ac_id in scan]
    zigzag = _ZIGZAG
    # MSB-first bit reader over 0xFF00-unstuffed entropy data, inlined
    # into locals (acc/nbits/bpos): a method-based reader costs ~45
    # calls per 8x8 block and profiling shows call overhead, not
    # arithmetic, bounds the whole decode.  Refills top the accumulator
    # up to >=32 bits at most once per Huffman symbol; one symbol
    # consumes <=16 (code) + <=11 (magnitude) = 27 bits, so a single
    # top-up covers both reads.  Reads past the segment end see zero
    # bits (truncated-stream behavior unchanged).
    seg_data = segments[0]
    seg_n = len(seg_data)
    bpos = acc = nbits = 0
    seg_idx = 0
    preds = [0] * len(plan)
    for mcu in range(n_mcus):
        if restart_interval and mcu and mcu % restart_interval == 0:
            seg_idx += 1
            seg_data = segments[seg_idx]
            seg_n = len(seg_data)
            bpos = acc = nbits = 0
            preds = [0] * len(plan)
        for si, (dc_len, dc_sym, ac_len, ac_sym, nblocks,
                 is_luma) in enumerate(plan):
            pred = preds[si]
            for _ in range(nblocks):
                if nbits < 27:
                    while nbits < 32:
                        acc = ((acc << 8)
                               | (seg_data[bpos] if bpos < seg_n else 0))
                        bpos += 1
                        nbits += 8
                    acc &= (1 << nbits) - 1
                code = (acc >> (nbits - 16)) & 0xFFFF
                length = dc_len[code]
                if not length:
                    raise ValueError("bad Huffman code")
                nbits -= length
                size = dc_sym[code]
                if size:
                    nbits -= size
                    v = (acc >> nbits) & ((1 << size) - 1)
                    pred += (v if v >= (1 << (size - 1))
                             else v - (1 << size) + 1)
                if is_luma:
                    luma_blocks[lb, 0] = pred
                k = 1
                while k < 64:
                    if nbits < 27:
                        while nbits < 32:
                            acc = ((acc << 8)
                                   | (seg_data[bpos] if bpos < seg_n
                                      else 0))
                            bpos += 1
                            nbits += 8
                        acc &= (1 << nbits) - 1
                    code = (acc >> (nbits - 16)) & 0xFFFF
                    length = ac_len[code]
                    if not length:
                        raise ValueError("bad Huffman code")
                    nbits -= length
                    rs = ac_sym[code]
                    s = rs & 0xF
                    if s == 0:
                        if rs == 0xF0:  # ZRL
                            k += 16
                            continue
                        break  # EOB
                    k += rs >> 4
                    nbits -= s
                    v = (acc >> nbits) & ((1 << s) - 1)
                    if is_luma and k < 64:
                        luma_blocks[lb, zigzag[k]] = (
                            v if v >= (1 << (s - 1))
                            else v - (1 << s) + 1)
                    k += 1
                if is_luma:
                    lb += 1
            preds[si] = pred

    # dequantize + IDCT, vectorized over all luma blocks
    coef = (luma_blocks * luma_quant).reshape(-1, 8, 8)
    # D.T @ C @ D as two batched matmuls (see encode_jpeg: einsum's
    # 3-operand path is interpreted and dominated the whole decode)
    spatial = _DCT_T.T @ coef @ _DCT_T
    pix = np.clip(np.round(spatial) + 128, 0, 255).astype(np.uint8)

    # reassemble luma plane from MCU-ordered blocks: block b sits at
    # MCU (my, mx), sub-block (by, bx) — one transpose instead of a
    # python loop over every block
    plane_w, plane_h = mcus_x * lh * 8, mcus_y * lv * 8
    plane = (pix.reshape(mcus_y, mcus_x, lv, lh, 8, 8)
             .transpose(0, 2, 4, 1, 3, 5)
             .reshape(plane_h, plane_w))
    # luma plane covers ceil(w*h/hmax/vmax) scaled dims; crop to frame
    out_h = frame["h"] * lv // vmax
    out_w = frame["w"] * lh // hmax
    out = plane[:out_h, :out_w]
    if lh != hmax or lv != vmax:  # subsampled luma (rare) — nearest up
        out = np.repeat(np.repeat(out, vmax // lv, axis=0),
                        hmax // lh, axis=1)[:frame["h"], :frame["w"]]
    return out.copy()
