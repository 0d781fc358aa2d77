"""Baseline JPEG (ITU-T T.81 SOF0) codec with NO imaging library —
numpy DCT + the spec's Annex-K example tables, canonical Huffman
construction per the spec's C.2 algorithm.

Closes the last image gate in operators/multimodal.py: the native
decoder family (BMP r9, WAV r9, PNG r11) stops at DCT/entropy codecs
no longer — baseline sequential JPEG decodes natively; only
progressive JPEG (SOF2), arithmetic coding, 12-bit precision, and
WebP remain honestly gated behind decode_image_real.

What's implemented (both directions, so the decoder is proven against
a standards-conforming encoder the same way the PNG/BMP/WAV decoders
are):
- markers: SOI/EOI, APP0 (JFIF), COM/APPn skip, DQT (multi-table,
  8-bit), DHT (multi-table), SOF0, DRI + RSTn restarts, SOS
- grayscale (1 component), YCbCr 4:4:4 and 4:2:0 (generic h/v ∈
  {1,2} sampling on decode, so 4:2:2 streams decode too)
- quality-scaled Annex-K quantization tables (the IJG 5000/Q //
  200-2Q convention), Annex-K Huffman tables
- loud failures: progressive/extended SOFs, arithmetic coding,
  16-bit quant tables, bad Huffman codes, AC run overflow, missing
  EOI (truncation), non-JPEG magic

Scale posture: this is the per-row kernel inside the Arrow-batched
`decode_media_native` mapInPandas lane (operators/multimodal.py) —
the distribution story is the DataFrame plumbing, the codec is
deliberately plain numpy per blob. Python-loop Huffman is the honest
cost of a no-dependency container; a production deployment swaps
PIL/libjpeg-turbo into the SAME slot (decode_image_real) and keeps
this as the zero-dependency fallback + conformance reference.

Reference parity: the reference pipeline stores media as opaque URLs
(recipe images in Firestore docs; src/etl_pipeline.py) and never
decodes — this extends its data model the way a multimodal training
pipeline needs, per the build brief.
"""

from __future__ import annotations

# ---- constants (ITU-T T.81 Annex K) ---------------------------------

# K.1 luminance / K.2 chrominance example quantization tables (raster)
_QL_BASE = [
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
]
_QC_BASE = [
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
]

# zigzag scan order: _ZIGZAG[k] = raster index of the k-th zigzag coef
_ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10,
    17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
]

# K.3 typical Huffman tables: (bits[1..16], huffval)
_DC_L = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
         list(range(12)))
_DC_C = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
         list(range(12)))
_AC_L = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [
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
        0xF9, 0xFA,
    ],
)
_AC_C = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
        0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
        0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
        0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
        0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
        0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
        0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
        0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
        0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
        0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
        0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
        0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
        0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
        0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
        0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
        0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
        0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA,
    ],
)


def _huff_encode_table(bits, huffval):
    """Canonical Huffman assignment (spec C.2): symbol -> (len, code)."""
    table, code, k = {}, 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[huffval[k]] = (length, code)
            code += 1
            k += 1
        code <<= 1
    return table


def _huff_decode_table(bits, huffval):
    """(len, code) -> symbol, same canonical assignment."""
    return {lc: sym for sym, lc in _huff_encode_table(bits, huffval).items()}


def _dct_mat():
    """Orthonormal 8-point DCT-II matrix A with A[u,x] =
    (C(u)/2)·cos((2x+1)uπ/16): A·f·Aᵀ is EXACTLY the spec's FDCT
    (its 1/4·C(u)C(v) double sum) and Aᵀ·F·A its IDCT."""
    import numpy as np

    if not hasattr(_dct_mat, "_A"):
        x = np.arange(8)
        u = x[:, None]
        A = 0.5 * np.cos((2 * x[None, :] + 1) * u * np.pi / 16)
        A[0, :] *= 1 / np.sqrt(2)
        _dct_mat._A = A
    return _dct_mat._A


def _q_tables(quality: int):
    """IJG quality scaling of the Annex-K base tables (int32 raster)."""
    import numpy as np

    q = max(1, min(100, int(quality)))
    scale = 5000 // q if q < 50 else 200 - 2 * q
    out = []
    for base in (_QL_BASE, _QC_BASE):
        t = (np.array(base, dtype=np.int64) * scale + 50) // 100
        out.append(np.clip(t, 1, 255).astype(np.int32).reshape(8, 8))
    return out


class _BitWriter:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, value: int, length: int) -> None:
        if length == 0:
            return
        self.acc = (self.acc << length) | (value & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            byte = (self.acc >> (self.n - 8)) & 0xFF
            self.buf.append(byte)
            if byte == 0xFF:      # byte stuffing
                self.buf.append(0x00)
            self.n -= 8
            self.acc &= (1 << self.n) - 1

    def flush_to_byte(self) -> None:
        if self.n:
            pad = 8 - self.n
            self.write((1 << pad) - 1, pad)  # pad with 1-bits (spec F.1.2.3)


class _BitReader:
    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.n = 0

    def read_bit(self) -> int:
        if self.n == 0:
            if self.pos >= len(self.data):
                raise ValueError("JPEG scan truncated (ran out of bytes)")
            byte = self.data[self.pos]
            if byte == 0xFF:
                nxt = self.data[self.pos + 1] if self.pos + 1 < len(
                    self.data) else None
                if nxt != 0x00:
                    raise ValueError(
                        f"unexpected marker 0xFF{nxt:02X} inside "
                        "entropy-coded data" if nxt is not None
                        else "JPEG scan truncated at 0xFF")
                self.pos += 2
            else:
                self.pos += 1
            self.acc = byte
            self.n = 8
        self.n -= 1
        return (self.acc >> self.n) & 1

    def receive(self, length: int) -> int:
        v = 0
        for _ in range(length):
            v = (v << 1) | self.read_bit()
        return v

    def align(self) -> None:
        self.n = 0


def _read_symbol(br: _BitReader, table) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | br.read_bit()
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid Huffman code in JPEG scan")


def _extend(v: int, size: int) -> int:
    if size == 0:
        return 0
    return v - ((1 << size) - 1) if v < (1 << (size - 1)) else v


def _encode_block(bw, block, qtab, dc_tbl, ac_tbl, pred: int) -> int:
    """FDCT + quantize + zigzag + Huffman-encode one 8×8 block;
    returns the new DC predictor."""
    import numpy as np

    A = _dct_mat()
    coef = A @ (block.astype(np.float64) - 128.0) @ A.T
    q = np.rint(coef / qtab).astype(np.int64)
    zz = q.reshape(-1)[_ZIGZAG]
    dc = int(zz[0])
    diff = dc - pred
    size = int(abs(diff)).bit_length()
    length, code = dc_tbl[size]
    bw.write(code, length)
    if size:
        bw.write(diff if diff > 0 else diff + (1 << size) - 1, size)
    run = 0
    for k in range(1, 64):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run >= 16:
            length, code = ac_tbl[0xF0]      # ZRL
            bw.write(code, length)
            run -= 16
        size = abs(v).bit_length()
        length, code = ac_tbl[(run << 4) | size]
        bw.write(code, length)
        bw.write(v if v > 0 else v + (1 << size) - 1, size)
        run = 0
    if run:
        length, code = ac_tbl[0x00]          # EOB
        bw.write(code, length)
    return dc


def _decode_block(br, dc_tbl, ac_tbl, qtab, pred: int):
    """Huffman-decode + dequantize + IDCT one block; returns
    (8×8 float64 spatial block, new DC predictor)."""
    import numpy as np

    size = _read_symbol(br, dc_tbl)
    pred += _extend(br.receive(size), size)
    zz = np.zeros(64, dtype=np.int64)
    zz[0] = pred
    k = 1
    while k < 64:
        sym = _read_symbol(br, ac_tbl)
        if sym == 0x00:                      # EOB
            break
        run, size = sym >> 4, sym & 0x0F
        if size == 0:
            if run == 15:                    # ZRL
                k += 16
                continue
            raise ValueError(f"invalid JPEG AC symbol 0x{sym:02X}")
        k += run
        if k > 63:
            raise ValueError("JPEG AC coefficient run overflows block")
        zz[k] = _extend(br.receive(size), size)
        k += 1
    coef = np.zeros(64, dtype=np.float64)
    coef[_ZIGZAG] = zz
    A = _dct_mat()
    block = A.T @ (coef.reshape(8, 8) * qtab) @ A + 128.0
    return block, pred


def _rgb_to_ycc(rgb):
    import numpy as np

    f = rgb.astype(np.float64)
    r, g, b = f[..., 0], f[..., 1], f[..., 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = 128.0 - 0.168735892 * r - 0.331264108 * g + 0.5 * b
    cr = 128.0 + 0.5 * r - 0.418687589 * g - 0.081312411 * b
    return y, cb, cr


def _ycc_to_rgb(y, cb, cr):
    import numpy as np

    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136286 * (cb - 128.0) - 0.714136286 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    return np.clip(np.stack([r, g, b], axis=-1).round(), 0,
                   255).astype(np.uint8)


def encode_jpeg(img, quality: int = 90, subsample: bool = False,
                restart_interval: int = 0) -> bytes:
    """Serialize an (h, w, 3) uint8 RGB array (or (h, w) grayscale) as
    a baseline JFIF JPEG: 4:4:4 by default, 4:2:0 with
    subsample=True, optional DRI/RSTn restarts — the test-fixture
    writer AND the round-trip proof that the decoder parses the real
    format (the encode_bmp/encode_png discipline)."""
    import struct

    import numpy as np

    img = np.asarray(img, dtype=np.uint8)
    gray = img.ndim == 2
    h, w = img.shape[:2]
    if h == 0 or w == 0:
        raise ValueError("cannot encode an empty image")
    ql, qc = _q_tables(quality)
    hmax = 2 if (subsample and not gray) else 1
    cell = 8 * hmax
    ph = (h + cell - 1) // cell * cell
    pw = (w + cell - 1) // cell * cell
    pad = ((0, ph - h), (0, pw - w)) + (((0, 0),) if not gray else ())
    padded = np.pad(img, pad, mode="edge")
    if gray:
        comps = [{"id": 1, "h": 1, "v": 1, "q": ql, "plane": padded,
                  "dc": _huff_encode_table(*_DC_L),
                  "ac": _huff_encode_table(*_AC_L)}]
    else:
        y, cb, cr = _rgb_to_ycc(padded)
        if subsample:
            cb = cb.reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3))
            cr = cr.reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3))
            samp = [(2, 2), (1, 1), (1, 1)]
        else:
            samp = [(1, 1), (1, 1), (1, 1)]
        dc_l, ac_l = _huff_encode_table(*_DC_L), _huff_encode_table(*_AC_L)
        dc_c, ac_c = _huff_encode_table(*_DC_C), _huff_encode_table(*_AC_C)
        comps = [
            {"id": 1, "h": samp[0][0], "v": samp[0][1], "q": ql,
             "plane": y, "dc": dc_l, "ac": ac_l},
            {"id": 2, "h": samp[1][0], "v": samp[1][1], "q": qc,
             "plane": cb, "dc": dc_c, "ac": ac_c},
            {"id": 3, "h": samp[2][0], "v": samp[2][1], "q": qc,
             "plane": cr, "dc": dc_c, "ac": ac_c},
        ]

    out = bytearray(b"\xff\xd8")                               # SOI
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00"   # APP0
    out += struct.pack(">BBBHHBB", 1, 1, 0, 1, 1, 0, 0)
    for tq, tab in ((0, ql), (1, qc)) if not gray else ((0, ql),):
        zz = tab.reshape(-1)[_ZIGZAG].astype(np.uint8).tobytes()
        out += b"\xff\xdb" + struct.pack(">HB", 67, tq) + zz   # DQT
    out += b"\xff\xc0" + struct.pack(">HBHHB", 8 + 3 * len(comps), 8,
                                     h, w, len(comps))         # SOF0
    for c in comps:
        out += struct.pack(">BBB", c["id"], (c["h"] << 4) | c["v"],
                           0 if c["q"] is ql else 1)
    hts = [(0x00, _DC_L), (0x10, _AC_L)]
    if not gray:
        hts += [(0x01, _DC_C), (0x11, _AC_C)]
    for tc_th, (bits, huffval) in hts:                          # DHT
        out += b"\xff\xc4" + struct.pack(">HB", 19 + len(huffval), tc_th)
        out += bytes(bits) + bytes(huffval)
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    out += b"\xff\xda" + struct.pack(">HB", 6 + 2 * len(comps),
                                     len(comps))               # SOS
    for i, c in enumerate(comps):
        out += struct.pack(">BB", c["id"], 0x00 if i == 0 and not gray
                           else (0x00 if gray else 0x11))
    out += struct.pack(">BBB", 0, 63, 0)

    bw = _BitWriter()
    mcus_x = pw // cell
    mcus_y = ph // cell
    preds = [0] * len(comps)
    rst = 0
    for m in range(mcus_x * mcus_y):
        if restart_interval and m and m % restart_interval == 0:
            bw.flush_to_byte()
            bw.buf += bytes([0xFF, 0xD0 + (rst & 7)])
            rst += 1
            preds = [0] * len(comps)
        my, mx = divmod(m, mcus_x)
        for ci, c in enumerate(comps):
            for by in range(c["v"]):
                for bx in range(c["h"]):
                    y0 = (my * c["v"] + by) * 8
                    x0 = (mx * c["h"] + bx) * 8
                    block = c["plane"][y0:y0 + 8, x0:x0 + 8]
                    preds[ci] = _encode_block(
                        bw, block, c["q"], c["dc"], c["ac"], preds[ci])
    bw.flush_to_byte()
    out += bw.buf
    out += b"\xff\xd9"                                         # EOI
    return bytes(out)


def decode_jpeg(blob: bytes):
    """Parse a baseline sequential JPEG → (h, w, 3) uint8 RGB array
    (grayscale replicated across channels). Validates magic, frame
    type, table precision, Huffman codes, and the trailing EOI
    loudly — a truncated or progressive payload raises, it does not
    produce silent garbage."""
    import struct

    import numpy as np

    data = bytes(blob)
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    qtabs: dict = {}
    dc_tabs: dict = {}
    ac_tabs: dict = {}
    frame = None
    ri = 0
    scan = None
    while scan is None:
        if pos + 4 > len(data):
            raise ValueError("JPEG truncated before SOS")
        if data[pos] != 0xFF:
            raise ValueError(f"bad marker alignment at byte {pos}")
        # T.81 B.1.1.2: any number of 0xFF fill bytes may pad before
        # a marker — skip them (a conforming third-party encoder may
        # emit them; 0xFFFF is padding, not a marker)
        while pos + 1 < len(data) and data[pos + 1] == 0xFF:
            pos += 1
        marker = data[pos + 1]
        pos += 2
        if marker == 0xD9:
            raise ValueError("EOI before any scan data")
        if pos + 2 > len(data):
            raise ValueError(
                f"JPEG truncated in segment header (marker 0xFF{marker:02X})")
        length = struct.unpack_from(">H", data, pos)[0]
        if pos + length > len(data):
            raise ValueError(
                f"JPEG truncated inside segment 0xFF{marker:02X} "
                f"(declares {length} bytes, {len(data) - pos} remain)")
        seg = data[pos + 2:pos + length]
        if marker == 0xDB:                                     # DQT
            s = 0
            while s < len(seg):
                pq, tq = seg[s] >> 4, seg[s] & 0x0F
                if pq != 0:
                    raise ValueError("16-bit quantization tables "
                                     "unsupported (baseline is 8-bit)")
                zz = np.frombuffer(seg, np.uint8, 64, s + 1)
                tab = np.zeros(64, dtype=np.int32)
                tab[_ZIGZAG] = zz
                qtabs[tq] = tab.reshape(8, 8)
                s += 65
        elif marker == 0xC4:                                   # DHT
            s = 0
            while s < len(seg):
                tc, th = seg[s] >> 4, seg[s] & 0x0F
                bits = list(seg[s + 1:s + 17])
                n = sum(bits)
                huffval = list(seg[s + 17:s + 17 + n])
                (ac_tabs if tc else dc_tabs)[th] = _huff_decode_table(
                    bits, huffval)
                s += 17 + n
        elif marker == 0xC0:                                   # SOF0
            prec, fh, fw, nc = struct.unpack_from(">BHHB", seg, 0)
            if prec != 8:
                raise ValueError(f"{prec}-bit precision unsupported")
            comps = []
            for i in range(nc):
                cid, hv, tq = struct.unpack_from(">BBB", seg, 6 + 3 * i)
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0x0F,
                              "tq": tq})
            frame = {"h": fh, "w": fw, "comps": comps}
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            kind = {0xC2: "progressive"}.get(marker,
                                             "non-baseline")
            raise ValueError(
                f"{kind} JPEG (SOF marker 0xFF{marker:02X}) unsupported"
                " — route to decode_image_real")
        elif marker == 0xDD:                                   # DRI
            ri = struct.unpack_from(">H", seg, 0)[0]
        elif marker == 0xDA:                                   # SOS
            if frame is None:
                raise ValueError("SOS before SOF0")
            ns = seg[0]
            sel = {}
            for i in range(ns):
                cid, tabs = seg[1 + 2 * i], seg[2 + 2 * i]
                sel[cid] = (tabs >> 4, tabs & 0x0F)
            # a legal baseline stream MAY split components across
            # several sequential scans (T.81 allows it); this decoder
            # handles the single-interleaved-scan form only — reject
            # the rest LOUDLY instead of KeyError-ing below
            missing = [c["id"] for c in frame["comps"]
                       if c["id"] not in sel]
            if missing:
                raise ValueError(
                    "multi-scan baseline JPEG unsupported (SOS covers "
                    f"{sorted(sel)} of frame components "
                    f"{[c['id'] for c in frame['comps']]}) — route to "
                    "decode_image_real")
            scan = sel
        elif 0xE0 <= marker <= 0xEF or marker == 0xFE:
            pass                                               # APPn/COM
        else:
            raise ValueError(f"unsupported JPEG marker 0xFF{marker:02X}")
        pos += length

    comps = frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    if not all(1 <= c["h"] <= 2 and 1 <= c["v"] <= 2 for c in comps):
        raise ValueError("sampling factors beyond 2 unsupported")
    mcus_x = (frame["w"] + 8 * hmax - 1) // (8 * hmax)
    mcus_y = (frame["h"] + 8 * vmax - 1) // (8 * vmax)
    for c in comps:
        c["plane"] = np.zeros((mcus_y * 8 * c["v"], mcus_x * 8 * c["h"]),
                              dtype=np.float64)
        if c["tq"] not in qtabs:
            raise ValueError(f"missing quantization table {c['tq']}")
        dc_id, ac_id = scan[c["id"]]
        if dc_id not in dc_tabs or ac_id not in ac_tabs:
            raise ValueError("missing Huffman table referenced by scan")
        c["dc_t"], c["ac_t"] = dc_tabs[dc_id], ac_tabs[ac_id]

    br = _BitReader(data, pos)
    preds = [0] * len(comps)
    rst = 0
    for m in range(mcus_x * mcus_y):
        if ri and m and m % ri == 0:
            br.align()
            if (data[br.pos] != 0xFF
                    or data[br.pos + 1] != 0xD0 + (rst & 7)):
                raise ValueError(f"expected RST{rst & 7} at MCU {m}")
            br.pos += 2
            rst += 1
            preds = [0] * len(comps)
        my, mx = divmod(m, mcus_x)
        for ci, c in enumerate(comps):
            for by in range(c["v"]):
                for bx in range(c["h"]):
                    block, preds[ci] = _decode_block(
                        br, c["dc_t"], c["ac_t"], qtabs[c["tq"]],
                        preds[ci])
                    y0 = (my * c["v"] + by) * 8
                    x0 = (mx * c["h"] + bx) * 8
                    c["plane"][y0:y0 + 8, x0:x0 + 8] = block
    br.align()
    if data[br.pos:br.pos + 2] != b"\xff\xd9":
        raise ValueError("JPEG missing EOI after scan (truncated?)")

    h, w = frame["h"], frame["w"]
    planes = []
    for c in comps:
        p = np.repeat(np.repeat(c["plane"], vmax // c["v"], axis=0),
                      hmax // c["h"], axis=1)[:h, :w]
        planes.append(p)
    if len(planes) == 1:
        g = np.clip(planes[0].round(), 0, 255).astype(np.uint8)
        return np.stack([g, g, g], axis=-1)
    if len(planes) == 3:
        return _ycc_to_rgb(*planes)
    raise ValueError(f"{len(planes)}-component JPEG unsupported")
