"""Pure-python/numpy baseline JPEG codec (ITU-T T.81 sequential DCT).

Closes the engine's last honest media stub (stages/multimodal.py strict
mode): no codec library ships in this container, so baseline JPEG is
implemented from the public spec — enough to run `media_features` on a
real compressed payload end-to-end.

Decoder: baseline sequential (SOF0), 8-bit, 1 or 3 components, arbitrary
per-component sampling factors (4:4:4 / 4:2:2 / 4:2:0 tested), DRI/RSTn
restart markers, byte-stuffing. Progressive (SOF2) and arithmetic coding
raise NotImplementedError — they are not baseline.

Encoder: minimal baseline writer (Annex K quantization + typical Huffman
tables, quality scaling per the public IJG formula, optional 2x2 chroma
subsampling). It exists so the decoder can be golden-tested against
payloads generated inside this sandbox; it is also a perfectly valid
JPEG producer for any standard reader.

Everything here is vectorized numpy per 8x8 block grid except the Huffman
entropy loop, which is inherently sequential per MCU; use it inside an
actor-pool map_batches stage (MediaDecoder) so decode parallelism comes
from Ray, not from threads.
"""

from __future__ import annotations

import numpy as np

# --- 8x8 DCT basis (orthonormal DCT-II), zigzag order -----------------------

_C = np.array(
    [
        [np.sqrt(1.0 / 8.0)] * 8
        if k == 0
        else [
            np.sqrt(2.0 / 8.0) * np.cos((2 * n + 1) * k * np.pi / 16.0)
            for n in range(8)
        ]
        for k in range(8)
    ]
)

_ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
    ]
)
_UNZIGZAG = np.argsort(_ZIGZAG)

# Annex K (T.81 tables K.1/K.2): the quality-50 quantization tables
_QT_LUMA = np.array(
    [
        16, 11, 10, 16, 24, 40, 51, 61,
        12, 12, 14, 19, 26, 58, 60, 55,
        14, 13, 16, 24, 40, 57, 69, 56,
        14, 17, 22, 29, 51, 87, 80, 62,
        18, 22, 37, 56, 68, 109, 103, 77,
        24, 35, 55, 64, 81, 104, 113, 92,
        49, 64, 78, 87, 103, 121, 120, 101,
        72, 92, 95, 98, 112, 100, 103, 99,
    ],
    dtype=np.int32,
)
_QT_CHROMA = np.array(
    [
        17, 18, 24, 47, 99, 99, 99, 99,
        18, 21, 26, 66, 99, 99, 99, 99,
        24, 26, 56, 99, 99, 99, 99, 99,
        47, 66, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
    ],
    dtype=np.int32,
)

# Annex K typical Huffman tables: (bits[1..16], values)
_HT_DC_LUMA = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
_HT_DC_CHROMA = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
_HT_AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
        0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
        0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
        0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
        0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
        0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
        0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
        0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
        0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
        0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)
_HT_AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
        0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
        0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
        0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
        0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
        0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
        0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
        0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
        0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
        0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
        0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
        0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
        0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
        0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)


# --- Huffman machinery -------------------------------------------------------


def _build_decode_table(bits, values):
    """(code -> (length, value)) flat dict keyed by (length, code)."""
    table = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = values[k]
            code += 1
            k += 1
        code <<= 1
    return table


def _build_encode_table(bits, values):
    table = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[values[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return table


class _BitReader:
    """MSB-first bit reader over entropy-coded data with 0xFF00 unstuffing
    and RSTn awareness (the scan slices around restart markers before this
    reader sees them)."""

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.bitbuf = 0
        self.nbits = 0

    def read_bit(self) -> int:
        if self.nbits == 0:
            if self.pos >= len(self.data):
                raise EOFError("entropy data exhausted")
            b = self.data[self.pos]
            self.pos += 1
            if b == 0xFF:
                # stuffing: FF 00 means literal FF; anything else here is
                # a marker, which a well-formed baseline scan only places
                # at restart boundaries (handled by the caller's slicing)
                if self.pos < len(self.data) and self.data[self.pos] == 0x00:
                    self.pos += 1
                else:
                    raise EOFError("marker inside entropy data")
            self.bitbuf = b
            self.nbits = 8
        self.nbits -= 1
        return (self.bitbuf >> self.nbits) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def decode_symbol(self, table) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.read_bit()
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid Huffman code")


def _extend(v: int, t: int) -> int:
    """T.81 EXTEND: map t-bit magnitude v to its signed value."""
    if t == 0:
        return 0
    return v if v >= (1 << (t - 1)) else v - (1 << t) + 1


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nacc = 0

    def write(self, code: int, length: int) -> None:
        for i in range(length - 1, -1, -1):
            self.acc = (self.acc << 1) | ((code >> i) & 1)
            self.nacc += 1
            if self.nacc == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)  # byte stuffing
                self.acc = 0
                self.nacc = 0

    def flush(self) -> None:
        if self.nacc:
            self.acc = (self.acc << (8 - self.nacc)) | ((1 << (8 - self.nacc)) - 1)
            self.out.append(self.acc)
            if self.acc == 0xFF:
                self.out.append(0x00)
            self.acc = 0
            self.nacc = 0


# --- color transforms (JFIF / BT.601 full-range) ----------------------------


def _rgb_to_ycbcr(rgb: np.ndarray) -> np.ndarray:
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    return np.stack([y, cb, cr], axis=-1)


def _ycbcr_to_rgb(ycc: np.ndarray) -> np.ndarray:
    y, cb, cr = ycc[..., 0], ycc[..., 1] - 128.0, ycc[..., 2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    return np.stack([r, g, b], axis=-1)


def _blocks_of(plane: np.ndarray) -> np.ndarray:
    """(H, W) padded to 8-multiples (edge-replicate) -> (nby, nbx, 8, 8)."""
    h, w = plane.shape
    ph, pw = -h % 8, -w % 8
    if ph or pw:
        plane = np.pad(plane, ((0, ph), (0, pw)), mode="edge")
    hh, ww = plane.shape
    return plane.reshape(hh // 8, 8, ww // 8, 8).transpose(0, 2, 1, 3)


def _quality_scale(table: np.ndarray, quality: int) -> np.ndarray:
    """Public IJG quality scaling."""
    quality = min(100, max(1, int(quality)))
    s = 5000 // quality if quality < 50 else 200 - quality * 2
    q = (table * s + 50) // 100
    return np.clip(q, 1, 255).astype(np.int32)


# --- encoder -----------------------------------------------------------------


def encode_jpeg(
    img: np.ndarray,
    quality: int = 75,
    subsample: bool = False,
    restart_interval: int = 0,
) -> bytes:
    """uint8 (H, W) grayscale or (H, W, 3) RGB -> baseline JFIF bytes.
    subsample=True uses 2x2 chroma subsampling (4:2:0); restart_interval
    emits a DRI segment and RSTn markers every N MCUs."""
    img = np.asarray(img)
    gray = img.ndim == 2
    h, w = img.shape[:2]
    qt = [_quality_scale(_QT_LUMA, quality), _quality_scale(_QT_CHROMA, quality)]

    if gray:
        planes = [img.astype(np.float64)]
        samp = [(1, 1)]
        qsel = [0]
    else:
        ycc = _rgb_to_ycbcr(img.astype(np.float64))
        y, cb, cr = ycc[..., 0], ycc[..., 1], ycc[..., 2]
        if subsample:
            # pad to even dims, then 2x2 box average
            ph, pw = -h % 2, -w % 2
            if ph or pw:
                cb = np.pad(cb, ((0, ph), (0, pw)), mode="edge")
                cr = np.pad(cr, ((0, ph), (0, pw)), mode="edge")
            cb = cb.reshape(cb.shape[0] // 2, 2, cb.shape[1] // 2, 2).mean((1, 3))
            cr = cr.reshape(cr.shape[0] // 2, 2, cr.shape[1] // 2, 2).mean((1, 3))
            samp = [(2, 2), (1, 1), (1, 1)]
        else:
            samp = [(1, 1), (1, 1), (1, 1)]
        planes = [y, cb, cr]
        qsel = [0, 1, 1]

    # per-component quantized coefficient grids (nby, nbx, 64) zigzagged
    comps = []
    for plane, qi in zip(planes, qsel):
        blocks = _blocks_of(plane) - 128.0
        coefs = np.einsum("ij,yxjk,lk->yxil", _C, blocks, _C)
        q = np.round(
            coefs.reshape(*coefs.shape[:2], 64)[..., _ZIGZAG] / qt[qi][_ZIGZAG]
        ).astype(np.int32)
        comps.append(q)

    dc_tabs = [_build_encode_table(*_HT_DC_LUMA)] + (
        [] if gray else [_build_encode_table(*_HT_DC_CHROMA)]
    )
    ac_tabs = [_build_encode_table(*_HT_AC_LUMA)] + (
        [] if gray else [_build_encode_table(*_HT_AC_CHROMA)]
    )

    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))

    bw = _BitWriter()
    pred = [0] * len(comps)
    entropy_parts: list[bytes] = []

    def encode_block(zz: np.ndarray, ci: int) -> None:
        ti = 0 if ci == 0 else min(ci, len(dc_tabs) - 1)
        diff = int(zz[0]) - pred[ci]
        pred[ci] = int(zz[0])
        mag = abs(diff)
        t = mag.bit_length()
        code, length = dc_tabs[ti][t]
        bw.write(code, length)
        if t:
            bw.write(diff if diff > 0 else diff + (1 << t) - 1, t)
        run = 0
        for k in range(1, 64):
            v = int(zz[k])
            if v == 0:
                run += 1
                continue
            while run > 15:
                code, length = ac_tabs[ti][0xF0]  # ZRL
                bw.write(code, length)
                run -= 16
            mag = abs(v)
            t = mag.bit_length()
            code, length = ac_tabs[ti][(run << 4) | t]
            bw.write(code, length)
            bw.write(v if v > 0 else v + (1 << t) - 1, t)
            run = 0
        if run:
            code, length = ac_tabs[ti][0x00]  # EOB
            bw.write(code, length)

    mcu_done = 0
    rst = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_done and mcu_done % restart_interval == 0:
                bw.flush()
                entropy_parts.append(bytes(bw.out))
                entropy_parts.append(bytes([0xFF, 0xD0 + rst]))
                rst = (rst + 1) % 8
                bw = _BitWriter()
                pred = [0] * len(comps)
            for ci, (hs, vs) in enumerate(samp):
                grid = comps[ci]
                for by in range(vs):
                    for bx in range(hs):
                        iy = min(my * vs + by, grid.shape[0] - 1)
                        ix = min(mx * hs + bx, grid.shape[1] - 1)
                        encode_block(grid[iy, ix], ci)
            mcu_done += 1
    bw.flush()
    entropy_parts.append(bytes(bw.out))

    # --- markers ---
    def seg(marker: int, payload: bytes) -> bytes:
        return bytes([0xFF, marker]) + (len(payload) + 2).to_bytes(2, "big") + payload

    out = bytearray(b"\xff\xd8")  # SOI
    out += seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += seg(0xDB, bytes([0]) + bytes(qt[0][_ZIGZAG].astype(np.uint8)))
    if not gray:
        out += seg(0xDB, bytes([1]) + bytes(qt[1][_ZIGZAG].astype(np.uint8)))
    ncomp = 1 if gray else 3
    sof = bytearray([8]) + h.to_bytes(2, "big") + w.to_bytes(2, "big") + bytes([ncomp])
    for ci in range(ncomp):
        hs, vs = samp[ci]
        sof += bytes([ci + 1, (hs << 4) | vs, qsel[ci]])
    out += seg(0xC0, bytes(sof))

    def dht(cls: int, tid: int, table) -> bytes:
        bits, values = table
        return seg(0xC4, bytes([(cls << 4) | tid]) + bytes(bits) + bytes(values))

    out += dht(0, 0, _HT_DC_LUMA) + dht(1, 0, _HT_AC_LUMA)
    if not gray:
        out += dht(0, 1, _HT_DC_CHROMA) + dht(1, 1, _HT_AC_CHROMA)
    if restart_interval:
        out += seg(0xDD, restart_interval.to_bytes(2, "big"))
    sos = bytearray([ncomp])
    for ci in range(ncomp):
        t = 0 if ci == 0 else 1
        sos += bytes([ci + 1, (t << 4) | t])
    sos += bytes([0, 63, 0])
    out += seg(0xDA, bytes(sos))
    out += b"".join(entropy_parts)
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# --- decoder -----------------------------------------------------------------


def decode_jpeg(payload: bytes) -> np.ndarray:
    """Baseline JFIF bytes -> uint8 (H, W) grayscale or (H, W, 3) RGB."""
    data = bytes(payload)
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    htables: dict[tuple[int, int], dict] = {}
    frame = None
    restart_interval = 0
    scan = None

    while pos < len(data):
        if data[pos] != 0xFF:
            pos += 1
            continue
        marker = data[pos + 1]
        pos += 2
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            continue
        if marker == 0xD9:  # EOI
            break
        length = int.from_bytes(data[pos:pos + 2], "big")
        payload_b = data[pos + 2:pos + length]
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(payload_b):
                pq, tq = payload_b[p] >> 4, payload_b[p] & 0xF
                p += 1
                if pq == 0:
                    q = np.frombuffer(payload_b[p:p + 64], dtype=np.uint8).astype(np.int32)
                    p += 64
                else:
                    q = np.frombuffer(payload_b[p:p + 128], dtype=">u2").astype(np.int32)
                    p += 128
                qtables[tq] = q[_UNZIGZAG]  # store in natural order
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(payload_b):
                cls, tid = payload_b[p] >> 4, payload_b[p] & 0xF
                bits = list(payload_b[p + 1:p + 17])
                n = sum(bits)
                values = list(payload_b[p + 17:p + 17 + n])
                htables[(cls, tid)] = _build_decode_table(bits, values)
                p += 17 + n
        elif marker in (0xC0, 0xC1):  # SOF0/SOF1 (baseline / ext. sequential)
            precision = payload_b[0]
            if precision != 8:
                raise NotImplementedError(f"{precision}-bit JPEG unsupported")
            h = int.from_bytes(payload_b[1:3], "big")
            w = int.from_bytes(payload_b[3:5], "big")
            ncomp = payload_b[5]
            comps = []
            for i in range(ncomp):
                cid, hv, tq = payload_b[6 + 3 * i:9 + 3 * i]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0xF, "tq": tq})
            frame = {"h": h, "w": w, "comps": comps}
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                "only baseline sequential JPEG (SOF0/SOF1) is supported"
            )
        elif marker == 0xDD:  # DRI
            restart_interval = int.from_bytes(payload_b[:2], "big")
        elif marker == 0xDA:  # SOS
            ns = payload_b[0]
            sel = []
            for i in range(ns):
                cs, tt = payload_b[1 + 2 * i], payload_b[2 + 2 * i]
                sel.append({"id": cs, "td": tt >> 4, "ta": tt & 0xF})
            scan = (sel, pos + length)
            break
        pos += length

    if frame is None or scan is None:
        raise ValueError("truncated JPEG (no frame/scan)")
    sel, entropy_start = scan

    # entropy data runs to EOI; split on restart markers
    end = data.rfind(b"\xff\xd9")
    if end < 0:
        end = len(data)
    entropy = data[entropy_start:end]

    comps = frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    h, w = frame["h"], frame["w"]
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    by_id = {c["id"]: c for c in comps}
    order = [by_id[s["id"]] for s in sel]
    for s, c in zip(sel, order):
        c["td"], c["ta"] = s["td"], s["ta"]
        c["coef"] = np.zeros(
            (mcuy * c["v"], mcux * c["h"], 64), dtype=np.int32
        )

    # restart markers cycle D0..D7; generic split: scan for FF D0-D7
    segs = []
    if restart_interval:
        cur = bytearray()
        i = 0
        while i < len(entropy):
            if (
                entropy[i] == 0xFF
                and i + 1 < len(entropy)
                and 0xD0 <= entropy[i + 1] <= 0xD7
            ):
                segs.append(bytes(cur))
                cur = bytearray()
                i += 2
                continue
            cur.append(entropy[i])
            i += 1
        segs.append(bytes(cur))
    else:
        segs = [entropy]

    mcu_total = mcux * mcuy
    mcu_done = 0
    seg_idx = 0
    reader = _BitReader(segs[0])
    pred = {c["id"]: 0 for c in comps}

    def decode_block(c) -> np.ndarray:
        zz = np.zeros(64, dtype=np.int32)
        t = reader.decode_symbol(htables[(0, c["td"])])
        diff = _extend(reader.read_bits(t), t)
        pred[c["id"]] += diff
        zz[0] = pred[c["id"]]
        k = 1
        while k < 64:
            rs = reader.decode_symbol(htables[(1, c["ta"])])
            r, s = rs >> 4, rs & 0xF
            if s == 0:
                if r == 15:
                    k += 16
                    continue
                break  # EOB
            k += r
            if k > 63:
                raise ValueError("AC run overflows block")
            zz[k] = _extend(reader.read_bits(s), s)
            k += 1
        return zz

    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_done and mcu_done % restart_interval == 0:
                seg_idx += 1
                reader = _BitReader(segs[seg_idx])
                for c in comps:
                    pred[c["id"]] = 0
            for c in order:
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        zz = decode_block(c)
                        c["coef"][my * c["v"] + by, mx * c["h"] + bx] = zz[
                            _UNZIGZAG
                        ]
            mcu_done += 1

    # dequantize + IDCT, whole grid vectorized per component
    planes = []
    for c in order:
        q = qtables[c["tq"]]
        coefs = (c["coef"] * q).reshape(*c["coef"].shape[:2], 8, 8).astype(np.float64)
        blocks = np.einsum("ji,yxjk,kl->yxil", _C, coefs, _C) + 128.0
        nby, nbx = blocks.shape[:2]
        plane = blocks.transpose(0, 2, 1, 3).reshape(nby * 8, nbx * 8)
        # upsample to full resolution (nearest) per sampling factor
        fy, fx = vmax // c["v"], hmax // c["h"]
        if fy > 1 or fx > 1:
            plane = np.repeat(np.repeat(plane, fy, axis=0), fx, axis=1)
        planes.append(plane[:h, :w])

    if len(planes) == 1:
        return np.clip(np.round(planes[0]), 0, 255).astype(np.uint8)
    ycc = np.stack(planes, axis=-1)
    rgb = _ycbcr_to_rgb(ycc)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)
