"""Baseline JPEG codec — pure stdlib+numpy (public ITU T.81 spec).

Closes the last big multimodal decode gap (VERDICT r02 "What's wrong" 2):
real web corpora are overwhelmingly JPEG, and the container has no PIL, so
the engine implements the baseline sequential DCT profile directly:

* decoder (`decode_jpeg`): marker parse (DQT/SOF0/DHT/SOS/DRI), canonical
  Huffman entropy decode with byte-stuffing and restart markers, dequant +
  dezigzag, separable floating IDCT, chroma upsampling for any sampling
  factors (4:4:4 / 4:2:2 / 4:2:0), BT.601 YCbCr->RGB. Progressive (SOF2),
  arithmetic-coded and 12-bit images return None — baseline covers the
  vast majority of real corpus JPEGs.
* encoder (`encode_jpeg_baseline`): the matching forward path (level
  shift, FDCT, quantization with quality-scaled Annex-K tables, zigzag,
  standard Annex-K Huffman tables, optional 4:2:0 subsampling, optional
  restart intervals) — exists so tests can roundtrip the decoder without
  an imaging stack, and so corpora with real JPEG payloads can be
  synthesized deterministically.

Correctness evidence (tests/test_jpeg.py): hand-computed spec vectors
(DC-only block => flat plane at round(dc*q/8)+128), near-lossless
roundtrip at quant=all-ones (error bound comes only from DCT float
rounding), lossy roundtrip PSNR at 4:4:4 and 4:2:0, restart-marker
streams, and an independent O(n^4) direct-IDCT cross-check of the
separable kernel.

JPEG is a lossy format; unlike the PNG/PPM/BMP paths there is no
bit-exact pixel oracle — the spec itself (T.81 Annex A) allows small
IDCT implementation variance, which the tests bound explicitly.
"""

from __future__ import annotations

import struct

import numpy as np

# zigzag order: index i of the scan -> (row, col) flat position
_ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)

# orthonormal DCT-II basis: M[x, u] = C(u)/2 * cos((2x+1) u pi / 16)
_M = np.zeros((8, 8))
for _x in range(8):
    for _u in range(8):
        c = (1.0 / np.sqrt(2.0)) if _u == 0 else 1.0
        _M[_x, _u] = 0.5 * c * np.cos((2 * _x + 1) * _u * np.pi / 16.0)

# Annex K.1 example quantization tables (luminance, chrominance)
_QT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61, 12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56, 14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77, 24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101, 72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int64)
_QT_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99, 18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99, 47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int64)

# Annex K.3 standard Huffman tables: (bits[1..16], huffval)
_STD_DC_LUMA = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
_STD_DC_CHROMA = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
_STD_AC_LUMA = (
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
_STD_AC_CHROMA = (
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


def _build_huff_decode(bits: list[int], huffval: list[int]) -> dict:
    """Canonical Huffman: {(length, code): symbol}."""
    table = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = huffval[k]
            code += 1
            k += 1
        code <<= 1
    return table


def _build_huff_encode(bits: list[int], huffval: list[int]) -> dict:
    """Canonical Huffman: {symbol: (code, length)}."""
    return {v: (c, l) for (l, c), v in _build_huff_decode(bits, huffval).items()}


class _BitReader:
    """MSB-first bit reader over entropy-coded data with 0xFF00 byte
    stuffing; restart markers surface as _Restart."""

    class _Restart(ValueError):  # ValueError: an unexpected restart in the
        def __init__(self, n: int):   # middle of a segment is a corrupt
            self.n = n                # stream -> decode_jpeg returns None

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> None:
        b = self.data[self.pos]
        self.pos += 1
        if b == 0xFF:
            nxt = self.data[self.pos]
            self.pos += 1
            if nxt == 0x00:
                pass  # stuffed 0xFF data byte
            elif 0xD0 <= nxt <= 0xD7:
                raise self._Restart(nxt - 0xD0)
            else:
                raise EOFError("marker inside entropy data")
        self.acc = (self.acc << 8) | b
        self.nbits += 8

    def align(self) -> None:
        self.acc = 0
        self.nbits = 0

    def receive(self, n: int) -> int:
        while self.nbits < n:
            self._fill()
        self.nbits -= n
        v = (self.acc >> self.nbits) & ((1 << n) - 1)
        self.acc &= (1 << self.nbits) - 1
        return v

    def huff(self, table: dict) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.receive(1)
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid Huffman code")


def _extend(v: int, s: int) -> int:
    """T.81 F.12: map `s` received bits to the signed coefficient."""
    return v - ((1 << s) - 1) if s and v < (1 << (s - 1)) else v


def decode_jpeg(payload: bytes) -> np.ndarray | None:
    """Baseline (SOF0) or progressive (SOF2) JPEG bytes -> HxWx3 uint8 RGB,
    or None for unsupported profiles / corrupt streams."""
    try:
        return _decode_jpeg(payload)
    except (IndexError, EOFError, ValueError, KeyError, ZeroDivisionError,
            struct.error):
        return None


def _decode_jpeg(payload: bytes) -> np.ndarray | None:
    if payload[:2] != b"\xff\xd8":
        return None
    qt: dict[int, np.ndarray] = {}
    huff_dc: dict[int, dict] = {}
    huff_ac: dict[int, dict] = {}
    frame = None  # (h, w, comps) with comps = [(cid, hs, vs, tq)]
    progressive = False
    prog = None  # _ProgressiveState once the first SOF2 scan begins
    restart_interval = 0
    adobe_transform = None  # APP14: 0=CMYK/RGB, 1=YCbCr, 2=YCCK
    pos = 2
    while pos < len(payload):
        if payload[pos] != 0xFF:
            pos += 1
            continue
        marker = payload[pos + 1]
        pos += 2
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            continue
        if marker == 0xD9:  # EOI
            break
        (seg_len,) = struct.unpack_from(">H", payload, pos)
        seg = payload[pos + 2:pos + seg_len]
        nxt = pos + seg_len
        if marker == 0xDB:  # DQT
            i = 0
            while i < len(seg):
                pq, tq = seg[i] >> 4, seg[i] & 0xF
                i += 1
                if pq:
                    vals = np.frombuffer(seg, ">u2", 64, i).astype(np.int64)
                    i += 128
                else:
                    vals = np.frombuffer(seg, np.uint8, 64, i).astype(np.int64)
                    i += 64
                qt[tq] = vals  # zigzag order
        elif marker in (0xC0, 0xC2):  # SOF0 baseline / SOF2 progressive
            precision = seg[0]
            if precision != 8:
                return None
            h, w = struct.unpack_from(">HH", seg, 1)
            if h * w > (1 << 28):
                # decompression-bomb guard (same cap as
                # multimodal.MAX_DECODE_PIXELS): the decoder materializes
                # MCU-padded float64 planes per component, which corrupt
                # 16-bit SOF dims would otherwise size at ~34 GB each
                return None
            ncomp = seg[5]
            comps = []
            for c in range(ncomp):
                cid, hv, tq_id = seg[6 + 3 * c:9 + 3 * c]
                comps.append((cid, hv >> 4, hv & 0xF, tq_id))
            frame = (h, w, comps)
            progressive = marker == 0xC2
        elif marker in (0xC1, 0xC3, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            return None  # extended-seq / arithmetic / hierarchical / lossless
        elif marker == 0xC4:  # DHT
            i = 0
            while i < len(seg):
                tc, th = seg[i] >> 4, seg[i] & 0xF
                bits = list(seg[i + 1:i + 17])
                n = sum(bits)
                vals = list(seg[i + 17:i + 17 + n])
                (huff_ac if tc else huff_dc)[th] = _build_huff_decode(bits, vals)
                i += 17 + n
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack_from(">H", seg, 0)
        elif marker == 0xEE and seg[:5] == b"Adobe":  # APP14 color transform
            adobe_transform = seg[11] if len(seg) >= 12 else None
        elif marker == 0xDA:  # SOS -> entropy-coded data follows
            if frame is None:
                return None
            ns = seg[0]
            scan = []  # (comp_idx, dc_table, ac_table)
            for c in range(ns):
                cid, tabs = seg[1 + 2 * c], seg[2 + 2 * c]
                matches = [i for i, comp in enumerate(frame[2])
                           if comp[0] == cid]
                if not matches:  # SOS names a component SOF never declared
                    return None
                scan.append((matches[0], tabs >> 4, tabs & 0xF))
            if progressive:
                ss, se = seg[1 + 2 * ns], seg[2 + 2 * ns]
                ah_al = seg[3 + 2 * ns]
                ah, al = ah_al >> 4, ah_al & 0xF
                if prog is None:
                    prog = _ProgressiveState(frame)
                pos = prog.decode_scan(
                    payload, pos + seg_len, scan, ss, se, ah, al,
                    huff_dc, huff_ac, restart_interval,
                )
                continue
            if ns != len(frame[2]):
                return None  # non-interleaved multi-scan: outside baseline profile here
            return _decode_scan(payload, pos + seg_len, frame, scan, qt,
                                huff_dc, huff_ac, restart_interval,
                                adobe_transform)
        pos = nxt
    if prog is not None:
        return prog.reconstruct(qt, adobe_transform)
    return None


def _decode_scan(payload, pos, frame, scan, qt, huff_dc, huff_ac,
                 restart_interval, adobe_transform=None):
    h, w, comps = frame
    if h == 0 or w == 0:
        return None
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    planes = [
        np.zeros((mcuy * vs * 8, mcux * hs * 8), dtype=np.float64)
        for _, hs, vs, _ in comps
    ]
    # dequant tables in DEZIGZAGGED 8x8 layout once
    deq = {}
    for t, vals in qt.items():
        m = np.zeros(64, dtype=np.int64)
        m[_ZIGZAG] = vals
        deq[t] = m.reshape(8, 8)
    reader = _BitReader(payload, pos)
    preds = [0] * len(comps)
    expected_rst = 0
    n_mcu = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and n_mcu and n_mcu % restart_interval == 0:
                # segment ends on a byte boundary: <= 7 pad bits remain in
                # the accumulator; drop them, then the marker sits at pos
                reader.align()
                while (payload[reader.pos] == 0xFF
                       and payload[reader.pos + 1] == 0xFF):
                    reader.pos += 1  # optional fill bytes before a marker
                if (payload[reader.pos] == 0xFF
                        and 0xD0 <= payload[reader.pos + 1] <= 0xD7):
                    if payload[reader.pos + 1] - 0xD0 != expected_rst & 7:
                        raise ValueError("restart marker out of sequence")
                    reader.pos += 2
                    expected_rst += 1
                    preds = [0] * len(comps)
                else:
                    raise ValueError("expected restart marker")
            for ci, dc_t, ac_t in scan:
                _, hs, vs, tq_id = comps[ci]
                q = deq[tq_id]
                for by in range(vs):
                    for bx in range(hs):
                        coefs = np.zeros(64, dtype=np.int64)
                        s = reader.huff(huff_dc[dc_t])
                        if s > 15:
                            # a corrupt DHT can map a code to any byte; a
                            # "category" above 15 would receive() an
                            # arbitrarily wide int and overflow int64
                            raise ValueError("DC category out of range")
                        diff = _extend(reader.receive(s), s) if s else 0
                        preds[ci] += diff
                        coefs[0] = preds[ci]
                        k = 1
                        while k < 64:
                            rs = reader.huff(huff_ac[ac_t])
                            r, size = rs >> 4, rs & 0xF
                            if size == 0:
                                if r == 15:
                                    k += 16
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                raise ValueError("AC run past block end")
                            coefs[_ZIGZAG[k]] = _extend(reader.receive(size),
                                                        size)
                            k += 1
                        block = coefs.reshape(8, 8) * q
                        # separable IDCT: spatial = M @ F @ M.T
                        spatial = _M @ block @ _M.T + 128.0
                        y0 = (my * vs + by) * 8
                        x0 = (mx * hs + bx) * 8
                        planes[ci][y0:y0 + 8, x0:x0 + 8] = spatial
            n_mcu += 1
    return _planes_to_rgb(comps, planes, h, w, hmax, vmax, adobe_transform)


def _ycc_to_rgb(out: np.ndarray) -> np.ndarray:
    y, cb, cr = out[:, :, 0], out[:, :, 1] - 128.0, out[:, :, 2] - 128.0
    return np.stack([
        y + 1.402 * cr,
        y - 0.344136 * cb - 0.714136 * cr,
        y + 1.772 * cb,
    ], axis=2)


def _planes_to_rgb(comps, planes, h, w, hmax, vmax,
                   adobe_transform=None) -> np.ndarray | None:
    """Shared decode tail: upsample each component plane to full
    (mcu-padded) resolution, crop, and color-convert. 4-component frames
    follow the Adobe convention (APP14): samples are stored INVERTED
    (0 = full ink), transform 2 = YCCK (YCC-coded CMY + pass-through K),
    otherwise plain inverted CMYK; RGB = channel * K / 255 on the
    inverted values (the libjpeg/PIL-compatible mapping)."""
    full = []
    for (cid, hs, vs, _), plane in zip(comps, planes):
        up = np.repeat(np.repeat(plane, vmax // vs, axis=0), hmax // hs, axis=1)
        full.append(up[:h, :w])
    out = np.stack(full, axis=2)
    if out.shape[2] == 1:
        rgb = np.repeat(out, 3, axis=2)
    elif out.shape[2] == 3:
        rgb = _ycc_to_rgb(out)
    elif out.shape[2] == 4:
        cmy = (_ycc_to_rgb(out[:, :, :3]) if adobe_transform == 2
               else out[:, :, :3])
        k = np.clip(out[:, :, 3], 0.0, 255.0)
        rgb = np.clip(cmy, 0.0, 255.0) * k[:, :, None] / 255.0
    else:
        return None
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


class _ProgressiveState:
    """Per-frame coefficient accumulator for SOF2 progressive decoding
    (ITU T.81 §G.2): each SOS updates a band/bit-plane of the per-component
    zigzag coefficient arrays; reconstruct() dequantizes + IDCTs once all
    scans are in.

    Coefficients are stored in ZIGZAG order (index = scan position k),
    matching how spectral-selection bands address them; de-zigzag happens
    at reconstruction. Block grids are MCU-padded (mcuy*vs x mcux*hs) so
    interleaved DC scans can address their padding blocks; non-interleaved
    scans cover only the component's ceil(size/8) grid per §A.2.2."""

    def __init__(self, frame):
        self.h, self.w, self.comps = frame
        if self.h == 0 or self.w == 0:
            raise ValueError("empty frame")
        self.hmax = max(c[1] for c in self.comps)
        self.vmax = max(c[2] for c in self.comps)
        self.mcux = -(-self.w // (8 * self.hmax))
        self.mcuy = -(-self.h // (8 * self.vmax))
        self.coef = [
            np.zeros((self.mcuy * vs, self.mcux * hs, 64), dtype=np.int64)
            for _, hs, vs, _ in self.comps
        ]
        # non-interleaved block grid per component (§A.2.2: ceil of the
        # scaled component dimensions, NOT the MCU-padded grid)
        self.nblocks = []
        for _, hs, vs, _ in self.comps:
            cw = -(-self.w * hs // self.hmax)
            ch = -(-self.h * vs // self.vmax)
            self.nblocks.append((-(-ch // 8), -(-cw // 8)))
        self.eobrun = 0

    # -- scan dispatch -------------------------------------------------------

    def decode_scan(self, payload, pos, scan, ss, se, ah, al,
                    huff_dc, huff_ac, restart_interval) -> int:
        """Decode one scan's entropy data; returns the stream position
        after it (the caller resumes marker parsing there)."""
        if ss == 0:
            if se != 0:
                raise ValueError("progressive scan mixes DC and AC")
            is_dc = True
        else:
            if len(scan) != 1 or se > 63 or se < ss:
                raise ValueError("bad AC scan header")
            is_dc = False
        reader = _BitReader(payload, pos)
        self.eobrun = 0
        preds = [0] * len(self.comps)
        expected_rst = 0

        def restart():
            nonlocal expected_rst, preds
            reader.align()
            p = reader.pos
            while payload[p] == 0xFF and payload[p + 1] == 0xFF:
                p += 1
            if payload[p] == 0xFF and 0xD0 <= payload[p + 1] <= 0xD7:
                if payload[p + 1] - 0xD0 != expected_rst & 7:
                    raise ValueError("restart marker out of sequence")
                reader.pos = p + 2
                expected_rst += 1
                preds[:] = [0] * len(self.comps)
                self.eobrun = 0
            else:
                raise ValueError("expected restart marker")

        n_units = 0
        if is_dc and len(scan) > 1:
            # interleaved DC scan over the MCU grid
            for my in range(self.mcuy):
                for mx in range(self.mcux):
                    if (restart_interval and n_units
                            and n_units % restart_interval == 0):
                        restart()
                    for ci, dc_t, _ in scan:
                        _, hs, vs, _ = self.comps[ci]
                        for by in range(vs):
                            for bx in range(hs):
                                blk = self.coef[ci][my * vs + by, mx * hs + bx]
                                self._dc_unit(reader, blk, huff_dc.get(dc_t),
                                              ah, al, preds, ci)
                    n_units += 1
        else:
            # non-interleaved: raster over the single component's blocks
            ci, dc_t, ac_t = scan[0]
            bh, bw = self.nblocks[ci]
            for by in range(bh):
                for bx in range(bw):
                    if (restart_interval and n_units
                            and n_units % restart_interval == 0):
                        restart()
                    blk = self.coef[ci][by, bx]
                    if is_dc:
                        self._dc_unit(reader, blk, huff_dc.get(dc_t),
                                      ah, al, preds, ci)
                    elif ah == 0:
                        self._ac_first(reader, blk, huff_ac[ac_t], ss, se, al)
                    else:
                        self._ac_refine(reader, blk, huff_ac[ac_t], ss, se, al)
                    n_units += 1
        return reader.pos

    # -- data units ----------------------------------------------------------

    def _dc_unit(self, reader, blk, dc_table, ah, al, preds, ci):
        if ah == 0:  # first pass: Huffman diff, point-transformed
            if dc_table is None:
                raise ValueError("DC scan without DC table")
            s = reader.huff(dc_table)
            if s > 15:
                raise ValueError("DC category out of range")  # see baseline
            diff = _extend(reader.receive(s), s) if s else 0
            preds[ci] += diff
            blk[0] = preds[ci] << al
        else:  # refinement: one raw bit per block
            if reader.receive(1):
                blk[0] |= 1 << al

    def _ac_first(self, reader, blk, ac_table, ss, se, al):
        if self.eobrun > 0:
            self.eobrun -= 1
            return
        k = ss
        while k <= se:
            rs = reader.huff(ac_table)
            r, s = rs >> 4, rs & 0xF
            if s == 0:
                if r == 15:
                    k += 16  # ZRL
                    continue
                self.eobrun = (1 << r) - 1  # EOBn: this block + 2^r-1 more
                if r:
                    self.eobrun += reader.receive(r)
                break
            k += r
            if k > se:
                raise ValueError("AC run past band end")
            blk[k] = _extend(reader.receive(s), s) << al
            k += 1

    def _ac_refine(self, reader, blk, ac_table, ss, se, al):
        """§G.2.2 successive-approximation AC refinement: correction bits
        for already-nonzero coefficients are interleaved positionally as
        the decoder advances; newly-significant coefficients arrive as
        run/1 symbols with a sign bit."""
        p1 = 1 << al

        def correct(k):
            # append one correction bit to coef k (history-nonzero)
            if reader.receive(1) and not (blk[k] & p1):
                blk[k] += p1 if blk[k] > 0 else -p1

        k = ss
        if self.eobrun == 0:
            while k <= se:
                rs = reader.huff(ac_table)
                r, s = rs >> 4, rs & 0xF
                newval = 0
                if s == 0:
                    if r != 15:
                        self.eobrun = (1 << r)  # current block's tail + more
                        if r:
                            self.eobrun += reader.receive(r)
                        break
                    # ZRL: advance past 16 zero-history positions
                elif s == 1:
                    newval = p1 if reader.receive(1) else -p1
                else:
                    raise ValueError("refinement size must be 1")
                while k <= se:
                    if blk[k] != 0:
                        correct(k)
                    else:
                        if r == 0:
                            break
                        r -= 1
                    k += 1
                if s:
                    if k > se:
                        raise ValueError("refinement placement past band")
                    blk[k] = newval
                k += 1
        if self.eobrun > 0:
            while k <= se:
                if blk[k] != 0:
                    correct(k)
                k += 1
            self.eobrun -= 1

    # -- output --------------------------------------------------------------

    def reconstruct(self, qt, adobe_transform=None) -> np.ndarray | None:
        planes = []
        for (cid, hs, vs, tq_id), coef in zip(self.comps, self.coef):
            q_zz = qt[tq_id]  # zigzag order, like the coefficients
            bh, bw = coef.shape[:2]
            natural = np.zeros_like(coef, dtype=np.float64)
            natural[:, :, _ZIGZAG] = coef * q_zz
            blocks = natural.reshape(bh, bw, 8, 8)
            spatial = np.einsum("xu,ijuv,yv->ijxy", _M, blocks, _M) + 128.0
            plane = spatial.transpose(0, 2, 1, 3).reshape(bh * 8, bw * 8)
            planes.append(plane)
        return _planes_to_rgb(self.comps, planes, self.h, self.w,
                              self.hmax, self.vmax, adobe_transform)


# ---------------------------------------------------------------------------
# encoder (tests + deterministic corpus synthesis)
# ---------------------------------------------------------------------------


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            b = (self.acc >> self.nbits) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)  # byte stuffing
            self.acc &= (1 << self.nbits) - 1

    def flush(self) -> None:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # pad with 1-bits per spec


def _quality_tables(quality: int) -> tuple[np.ndarray, np.ndarray]:
    """IJG quality scaling of the Annex-K tables (quality 100 would not be
    all-ones under IJG; pass quant_override for the lossless-ish tests).

    Returns tables ZIGZAG-SCANNED (`t[_ZIGZAG]`): _QT_LUMA/_QT_CHROMA are
    the Annex-K raster-order presentation, while both consumers index by
    scan position — the DQT payload is zigzag-ordered per B.2.4.1, and
    _encode_block divides zigzag-scanned coefficients elementwise. Writing
    the raster literals directly was self-consistent (decoders invert
    whatever table the stream carries) but scrambled the frequency
    weighting through the zigzag permutation, deviating from IJG/Annex-K
    quality semantics."""
    quality = min(max(quality, 1), 100)
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    def sc(t):
        out = np.clip((t * scale + 50) // 100, 1, 255).astype(np.int64)
        return out[_ZIGZAG]
    return sc(_QT_LUMA), sc(_QT_CHROMA)


def _encode_block(bw, block, q_zz, pred, dc_tab, ac_tab) -> int:
    """FDCT + quantize + Huffman one 8x8 block; returns the new DC pred."""
    f = _M.T @ (block - 128.0) @ _M  # forward orthonormal DCT
    # scan index k carries flat coefficient _ZIGZAG[k] (the decoder's
    # inverse: coefs[_ZIGZAG[k]] = value)
    zz = np.round(f.reshape(64)[_ZIGZAG] /
                  q_zz.astype(np.float64)).astype(np.int64)
    diff = int(zz[0]) - pred
    s = int(diff != 0 and int(np.abs(diff)).bit_length())
    code, ln = dc_tab[s]
    bw.write(code, ln)
    if s:
        bw.write(diff if diff > 0 else diff + (1 << s) - 1, s)
    # AC: run-length of zeros in zigzag order
    run = 0
    last_nz = max(np.nonzero(zz)[0]) if np.any(zz) else 0
    for k in range(1, 64):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, ln = ac_tab[0xF0]  # ZRL
            bw.write(code, ln)
            run -= 16
        size = int(np.abs(v)).bit_length()
        code, ln = ac_tab[(run << 4) | size]
        bw.write(code, ln)
        bw.write(v if v > 0 else v + (1 << size) - 1, size)
        run = 0
    if last_nz < 63:
        code, ln = ac_tab[0x00]  # EOB
        bw.write(code, ln)
    return int(zz[0])


def _prepare_encode(arr: np.ndarray, quality: int, subsample: bool,
                    quant_override: np.ndarray | None):
    """Shared encoder front half: color transform, sampling layout, MCU-
    padded per-component planes, quant tables. Returns
    (h, w, ncomp, samp, planes, q_l, q_c, hmax, vmax, mcux, mcuy)."""
    arr = np.asarray(arr, dtype=np.float64)
    gray = arr.ndim == 2
    cmyk = arr.ndim == 3 and arr.shape[2] == 4
    if gray:
        ycc = arr[:, :, None]
    elif cmyk:
        ycc = arr  # Adobe-inverted CMYK channels pass through untransformed
    else:
        r, g, b = arr[:, :, 0], arr[:, :, 1], arr[:, :, 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        ycc = np.stack([y, cb, cr], axis=2)
    h, w = ycc.shape[:2]
    if quant_override is not None:
        q_l = q_c = np.asarray(quant_override, dtype=np.int64)
    else:
        q_l, q_c = _quality_tables(quality)
    ncomp = ycc.shape[2]
    samp = [(2, 2), (1, 1), (1, 1)] if (subsample and ncomp == 3) \
        else [(1, 1)] * ncomp
    hmax = max(s[0] for s in samp[:ncomp])
    vmax = max(s[1] for s in samp[:ncomp])
    mcux, mcuy = -(-w // (8 * hmax)), -(-h // (8 * vmax))

    # per-component planes at component resolution, edge-padded to MCU grid
    planes = []
    for ci in range(ncomp):
        hs, vs = samp[ci]
        ph, pw = mcuy * vs * 8, mcux * hs * 8
        src = ycc[:, :, ci]
        if (hs, vs) != (hmax, vmax):  # subsample by box mean
            fy, fx = vmax // vs, hmax // hs
            ey, ex = -(-h // fy) * fy, -(-w // fx) * fx
            padded = np.pad(src, ((0, ey - h), (0, ex - w)), mode="edge")
            src = padded.reshape(ey // fy, fy, ex // fx, fx).mean(axis=(1, 3))
        sh, sw = src.shape
        planes.append(np.pad(src, ((0, ph - sh), (0, pw - sw)), mode="edge"))
    return h, w, ncomp, samp, planes, q_l, q_c, hmax, vmax, mcux, mcuy


def encode_jpeg_baseline(arr: np.ndarray, quality: int = 85,
                         subsample: bool = False,
                         restart_interval: int = 0,
                         quant_override: np.ndarray | None = None) -> bytes:
    """HxWx3 (RGB) or HxW (gray) uint8 -> baseline JPEG bytes.
    subsample=True emits 4:2:0 chroma; quant_override (64 zigzag values)
    replaces both quality tables — all-ones gives the near-lossless mode
    the roundtrip tests bound."""
    (h, w, ncomp, samp, planes, q_l, q_c,
     hmax, vmax, mcux, mcuy) = _prepare_encode(arr, quality, subsample,
                                               quant_override)

    dc_tabs = [_build_huff_encode(*_STD_DC_LUMA),
               _build_huff_encode(*_STD_DC_CHROMA)]
    ac_tabs = [_build_huff_encode(*_STD_AC_LUMA),
               _build_huff_encode(*_STD_AC_CHROMA)]

    out = bytearray(b"\xff\xd8")  # SOI

    def seg(marker: int, body: bytes) -> None:
        out.extend(struct.pack(">BBH", 0xFF, marker, len(body) + 2) + body)

    seg(0xDB, bytes([0]) + bytes(int(x) for x in q_l))
    if ncomp >= 3:
        seg(0xDB, bytes([1]) + bytes(int(x) for x in q_c))
    if ncomp == 4:
        # APP14 Adobe marker, transform 0 = (inverted) CMYK — what tells
        # decoders the 4 channels are ink planes, not YCCK
        seg(0xEE, b"Adobe" + struct.pack(">HHHB", 100, 0, 0, 0))
    sof = struct.pack(">BHHB", 8, h, w, ncomp)
    for ci in range(ncomp):
        hs, vs = samp[ci]
        sof += bytes([ci + 1, (hs << 4) | vs, 0 if ci == 0 else 1])
    seg(0xC0, sof)
    for tc, tabs in ((0, (_STD_DC_LUMA, _STD_DC_CHROMA)),
                     (1, (_STD_AC_LUMA, _STD_AC_CHROMA))):
        for th in range(2 if ncomp >= 3 else 1):
            bits, vals = tabs[th]
            seg(0xC4, bytes([(tc << 4) | th]) + bytes(bits) + bytes(vals))
    if restart_interval:
        seg(0xDD, struct.pack(">H", restart_interval))
    sos = bytes([ncomp])
    for ci in range(ncomp):
        t = 0 if ci == 0 else 1
        sos += bytes([ci + 1, (t << 4) | t])
    sos += bytes([0, 63, 0])
    seg(0xDA, sos)

    bw = _BitWriter()
    preds = [0] * ncomp
    n_mcu = 0
    rst = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and n_mcu and n_mcu % restart_interval == 0:
                bw.flush()
                out.extend(bw.out)
                bw = _BitWriter()
                out.extend(bytes([0xFF, 0xD0 + (rst & 7)]))
                rst += 1
                preds = [0] * ncomp
            for ci in range(ncomp):
                hs, vs = samp[ci]
                q_zz = q_l if ci == 0 else q_c
                for by in range(vs):
                    for bx in range(hs):
                        y0 = (my * vs + by) * 8
                        x0 = (mx * hs + bx) * 8
                        block = planes[ci][y0:y0 + 8, x0:x0 + 8]
                        preds[ci] = _encode_block(
                            bw, block, q_zz, preds[ci],
                            dc_tabs[0 if ci == 0 else 1],
                            ac_tabs[0 if ci == 0 else 1])
            n_mcu += 1
    bw.flush()
    out.extend(bw.out)
    out.extend(b"\xff\xd9")  # EOI
    return bytes(out)


# ---------------------------------------------------------------------------
# progressive encoder (SOF2) — exists to roundtrip-test the progressive
# decoder bit-exactly: both encoders quantize identically, so a progressive
# stream with a fully-refining scan script must decode to the SAME pixels
# as the baseline stream of the same image/tables.
# ---------------------------------------------------------------------------

# one flat AC Huffman table covering ALL 256 RS symbols (128 at 8 bits +
# 128 at 9 bits; Kraft sum 0.75, DHT BITS entries stay <= 255, all-ones
# code unused): progressive scans need EOBn symbols (0x10..0xE0) that the
# Annex-K baseline tables don't carry; a flat table trades stream size
# (tests don't care) for not needing per-scan frequency-optimized tables.
_PROG_AC_TABLE = ([0] * 7 + [128, 128] + [0] * 7, list(range(256)))

_EOBRUN_MAX = 32767  # largest run EOBn (r<=14) can express


class _ACScanState:
    """Cross-block AC-scan state: pending EOB run + (refinement) the
    correction bits buffered for blocks inside that run (§G.1.2.3: they
    are emitted right after the EOBn symbol, in block/position order)."""

    def __init__(self):
        self.eobrun = 0
        self.pending_bits: list[int] = []


def _flush_eobrun(bw, ac_tab, st: _ACScanState) -> None:
    if st.eobrun > 0:
        r = st.eobrun.bit_length() - 1
        code, ln = ac_tab[r << 4]
        bw.write(code, ln)
        if r:
            bw.write(st.eobrun - (1 << r), r)
        st.eobrun = 0
    for b in st.pending_bits:
        bw.write(b, 1)
    st.pending_bits = []


def _enc_ac_first(bw, ac_tab, zz, ss, se, al, st: _ACScanState) -> None:
    """§G.1.2.2 spectral-selection first pass (point transform: abs >> al,
    truncation toward zero)."""
    vals = []
    for k in range(ss, se + 1):
        v = int(zz[k])
        t = abs(v) >> al
        vals.append(t if v >= 0 else -t)
    last = -1
    for i, v in enumerate(vals):
        if v:
            last = i
    if last < 0:
        st.eobrun += 1
        if st.eobrun == _EOBRUN_MAX:
            _flush_eobrun(bw, ac_tab, st)
        return
    _flush_eobrun(bw, ac_tab, st)
    run = 0
    for i in range(last + 1):
        v = vals[i]
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, ln = ac_tab[0xF0]
            bw.write(code, ln)
            run -= 16
        s = abs(v).bit_length()
        code, ln = ac_tab[(run << 4) | s]
        bw.write(code, ln)
        bw.write(v if v > 0 else v + (1 << s) - 1, s)
        run = 0
    if last < se - ss:
        st.eobrun += 1
        if st.eobrun == _EOBRUN_MAX:
            _flush_eobrun(bw, ac_tab, st)


def _enc_ac_refine(bw, ac_tab, zz, ss, se, al, st: _ACScanState) -> None:
    """§G.1.2.3 successive-approximation AC refinement, mirroring the
    decoder's consumption order exactly: run/1 symbol + sign bit, then the
    correction bits of already-significant coefficients interleaved
    positionally as the (simulated) decoder advances."""
    t, pos_sign = [], []
    for k in range(ss, se + 1):
        v = int(zz[k])
        t.append(abs(v) >> al)
        pos_sign.append(v >= 0)
    eob = -1  # index of last NEWLY-significant coefficient (t == 1)
    for i, tv in enumerate(t):
        if tv == 1:
            eob = i
    if eob < 0:
        st.eobrun += 1
        st.pending_bits.extend(tv & 1 for tv in t if tv > 1)
        if st.eobrun == _EOBRUN_MAX:
            _flush_eobrun(bw, ac_tab, st)
        return
    _flush_eobrun(bw, ac_tab, st)
    p = 0  # decoder-advance pointer within the band
    i = 0
    while i <= eob:
        r = 0
        j = i
        while t[j] != 1:  # zero-history run up to the next new coefficient
            if t[j] == 0:
                r += 1
            j += 1
        while r > 15:
            code, ln = ac_tab[0xF0]
            bw.write(code, ln)
            zh = 0  # ZRL: decoder passes 16 zero-history positions,
            while zh < 16:  # reading corrections at old positions en route
                if t[p] == 0:
                    zh += 1
                elif t[p] > 1:
                    bw.write(t[p] & 1, 1)
                p += 1
            r -= 16
        code, ln = ac_tab[(r << 4) | 1]
        bw.write(code, ln)
        bw.write(1 if pos_sign[j] else 0, 1)
        while p < j:
            if t[p] > 1:
                bw.write(t[p] & 1, 1)
            p += 1
        p = j + 1
        i = j + 1
    if eob < se - ss:  # tail joins a fresh EOB run
        st.eobrun += 1
        st.pending_bits.extend(
            t[k] & 1 for k in range(eob + 1, se - ss + 1) if t[k] > 1
        )
        if st.eobrun == _EOBRUN_MAX:
            _flush_eobrun(bw, ac_tab, st)


def _quantized_zz_blocks(planes, samp, ncomp, q_l, q_c, mcux, mcuy):
    """FDCT + quantize every 8x8 block: per-component (bh, bw, 64) int64
    arrays in ZIGZAG order — same rounding as _encode_block, so baseline
    and progressive streams carry identical coefficients."""
    out = []
    for ci in range(ncomp):
        hs, vs = samp[ci]
        q = (q_l if ci == 0 else q_c).astype(np.float64)
        bh, bw_ = mcuy * vs, mcux * hs
        blocks = planes[ci].reshape(bh, 8, bw_, 8).transpose(0, 2, 1, 3)
        f = np.einsum("xu,ijxy,yv->ijuv", _M, blocks - 128.0, _M)
        zz = np.round(f.reshape(bh, bw_, 64)[:, :, _ZIGZAG] / q).astype(np.int64)
        out.append(zz)
    return out


# default scan script: exercises every progressive decode path — DC first
# with a point transform, spectral-selection AC bands with EOB runs, AC
# successive-approximation refinement (incl. correction bits + ZRL), and
# DC refinement. Fully refines to Al=0, so decode == baseline decode.
_DEFAULT_PROG_SCANS = [
    ("dc", None, 0, 0, 0, 1),
    ("ac", "each", 1, 5, 0, 2),
    ("ac", "each", 6, 63, 0, 2),
    ("ac", "each", 1, 63, 2, 1),
    ("ac", "each", 1, 63, 1, 0),
    ("dc", None, 0, 0, 1, 0),
]


def encode_jpeg_progressive(arr: np.ndarray, quality: int = 85,
                            subsample: bool = False,
                            quant_override: np.ndarray | None = None,
                            scans: list | None = None) -> bytes:
    """HxWx3 (RGB) or HxW (gray) uint8 -> progressive (SOF2) JPEG bytes.

    `scans` entries are (kind, comps, Ss, Se, Ah, Al) with kind in
    {'dc','ac'}; comps None = all (DC scans interleave), 'each' = one
    non-interleaved scan per component, or an explicit component index.
    The default script fully refines, so decoding yields exactly the
    pixels of the baseline encoding with the same tables."""
    (h, w, ncomp, samp, planes, q_l, q_c,
     hmax, vmax, mcux, mcuy) = _prepare_encode(arr, quality, subsample,
                                               quant_override)
    coefs = _quantized_zz_blocks(planes, samp, ncomp, q_l, q_c, mcux, mcuy)
    nblocks = []
    for ci in range(ncomp):
        hs, vs = samp[ci]
        cw, ch = -(-w * hs // hmax), -(-h * vs // vmax)
        nblocks.append((-(-ch // 8), -(-cw // 8)))

    dc_tabs = [_build_huff_encode(*_STD_DC_LUMA),
               _build_huff_encode(*_STD_DC_CHROMA)]
    ac_flat = _build_huff_encode(*_PROG_AC_TABLE)

    out = bytearray(b"\xff\xd8")

    def seg(marker: int, body: bytes) -> None:
        out.extend(struct.pack(">BBH", 0xFF, marker, len(body) + 2) + body)

    seg(0xDB, bytes([0]) + bytes(int(x) for x in q_l))
    if ncomp >= 3:
        seg(0xDB, bytes([1]) + bytes(int(x) for x in q_c))
    if ncomp == 4:
        seg(0xEE, b"Adobe" + struct.pack(">HHHB", 100, 0, 0, 0))
    sof = struct.pack(">BHHB", 8, h, w, ncomp)
    for ci in range(ncomp):
        hs, vs = samp[ci]
        sof += bytes([ci + 1, (hs << 4) | vs, 0 if ci == 0 else 1])
    seg(0xC2, sof)  # SOF2: progressive DCT, Huffman
    for th in range(2 if ncomp >= 3 else 1):
        bits, vals = (_STD_DC_LUMA, _STD_DC_CHROMA)[th]
        seg(0xC4, bytes([th]) + bytes(bits) + bytes(vals))
    bits, vals = _PROG_AC_TABLE
    seg(0xC4, bytes([0x10]) + bytes(bits) + bytes(vals))

    def emit_scan(kind, comp_sel, ss, se, ah, al):
        members = (range(ncomp) if comp_sel is None else [comp_sel])
        sos = bytes([len(members)])
        for ci in members:
            t = 0 if ci == 0 else 1
            sos += bytes([ci + 1, (t << 4) | 0])
        sos += bytes([ss, se, (ah << 4) | al])
        seg(0xDA, sos)
        bw = _BitWriter()
        if kind == "dc":
            preds = [0] * ncomp
            if len(members) > 1:  # interleaved over the MCU grid
                order = []
                for my in range(mcuy):
                    for mx in range(mcux):
                        for ci in members:
                            hs, vs = samp[ci]
                            for by in range(vs):
                                for bx in range(hs):
                                    order.append(
                                        (ci, my * vs + by, mx * hs + bx))
            else:
                ci = members[0]
                bh, bw_ = nblocks[ci]
                order = [(ci, by, bx) for by in range(bh) for bx in range(bw_)]
            for ci, by, bx in order:
                dc = int(coefs[ci][by, bx, 0])
                if ah == 0:  # first pass: diffs of dc >> al (arith shift)
                    v = dc >> al
                    diff = v - preds[ci]
                    preds[ci] = v
                    s = int(diff != 0 and abs(diff).bit_length())
                    code, ln = dc_tabs[0 if ci == 0 else 1][s]
                    bw.write(code, ln)
                    if s:
                        bw.write(diff if diff > 0 else diff + (1 << s) - 1, s)
                else:  # refinement: raw bit al of the (floor-shifted) DC
                    bw.write((dc >> al) & 1, 1)
        else:
            ci = comp_sel
            st = _ACScanState()
            bh, bw_ = nblocks[ci]
            enc = _enc_ac_first if ah == 0 else _enc_ac_refine
            for by in range(bh):
                for bx in range(bw_):
                    enc(bw, ac_flat, coefs[ci][by, bx], ss, se, al, st)
            _flush_eobrun(bw, ac_flat, st)
        bw.flush()
        out.extend(bw.out)

    for kind, comp_sel, ss, se, ah, al in (scans or _DEFAULT_PROG_SCANS):
        if comp_sel == "each":
            for ci in range(ncomp):
                emit_scan(kind, ci, ss, se, ah, al)
        else:
            emit_scan(kind, comp_sel, ss, se, ah, al)

    out.extend(b"\xff\xd9")
    return bytes(out)
