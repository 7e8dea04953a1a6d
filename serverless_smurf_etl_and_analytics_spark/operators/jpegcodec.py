"""Zero-dependency baseline JPEG codec (ITU-T T.81, public spec) —
the third real raster codec beside PPM(P6) and PNG in
``operators/multimodal.py``, closing the last honestly-stubbed image
modality without PIL (which this environment does not ship).

Scope — exactly baseline sequential DCT:

- **decode**: SOF0/SOF1 frames, 8-bit samples, 1 or 3 components, any
  sampling factors (4:4:4 / 4:2:2 / 4:2:0 ...), arbitrary DQT/DHT
  tables (8- or 16-bit quant precision), restart markers (DRI/RSTn).
  Progressive (SOF2) and arithmetic coding raise NotImplementedError —
  honestly out of scope, exactly like webp/video.
- **encode**: 4:4:4 or 4:2:0 YCbCr (or single-component grayscale),
  libjpeg-formula quality scaling of the Annex K quant tables, and
  deliberately SIMPLE valid Huffman tables (every DC symbol 4 bits,
  every AC symbol 8 bits — Kraft-valid canonical codes, ~2x the bytes
  of the optimal tables but dependency-free and unambiguous; the
  tables ride the file's DHT segments, so any decoder reads them).

Correctness-grade, not throughput-grade (the PNG unfilter note): the
Huffman bit loop is per-symbol Python. A production pipeline hands
bulk decode to PIL/libjpeg-turbo; what the engine pins is the REAL
decode path — actual entropy decode, dequantize, IDCT, chroma
upsample, color convert — behind the same Arrow-batched mapInPandas
plumbing as the other codecs. The DCT is the orthonormal matrix form
(T @ block @ T.T), exact to float64 round-off.
"""

from __future__ import annotations

import struct

import numpy as np

# natural-order index of each zigzag position (T.81 Figure 5)
ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10,
        17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34,
        27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36,
        29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46,
        53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int64,
)

# Annex K base quantization tables (natural row order)
Q_LUM = np.array(
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
    dtype=np.int64,
)
Q_CHROM = np.array(
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
    dtype=np.int64,
)

# orthonormal 8-point DCT-II matrix: coeffs = T @ block @ T.T
_T = np.zeros((8, 8))
for _k in range(8):
    for _n in range(8):
        _T[_k, _n] = np.cos((2 * _n + 1) * _k * np.pi / 16.0) * (
            np.sqrt(1.0 / 8) if _k == 0 else np.sqrt(2.0 / 8)
        )


def _quality_scale(base: np.ndarray, quality: int) -> np.ndarray:
    """libjpeg quality formula: 50 = Annex K as-is, 100 = all-ones."""
    q = min(100, max(1, int(quality)))
    scale = 5000 // q if q < 50 else 200 - 2 * q
    return np.clip((base * scale + 50) // 100, 1, 255)


# ---- simple valid Huffman tables (encoder side) ---------------------------
# Every DC symbol (0..11) gets a 4-bit canonical code; every AC symbol
# (EOB, ZRL, and all run/size combos = 162) an 8-bit one. Kraft sums:
# 12/16 and 162/256, both < 1, and the last canonical code is never the
# all-ones pattern T.81 reserves. Wasteful but valid — and the tables
# travel in the DHT segments, so interoperability is by construction.

_DC_SYMS = list(range(12))
_AC_SYMS = [0x00, 0xF0] + [
    (r << 4) | s for r in range(16) for s in range(1, 11)
]
_AC_SYMS = sorted(set(_AC_SYMS))


def _fixed_table(symbols: list[int], length: int):
    """(bits, vals, {symbol: (code, length)}) for an all-one-length
    canonical code."""
    bits = [0] * 17
    bits[length] = len(symbols)
    codes = {s: (i, length) for i, s in enumerate(symbols)}
    return bits, list(symbols), codes


_DC_BITS, _DC_VALS, _DC_CODES = _fixed_table(_DC_SYMS, 4)
_AC_BITS, _AC_VALS, _AC_CODES = _fixed_table(_AC_SYMS, 8)


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            b = (self.acc >> (self.nbits - 8)) & 0xFF
            self.nbits -= 8
            self.out.append(b)
            if b == 0xFF:  # byte stuffing
                self.out.append(0x00)

    def flush(self) -> None:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # 1-fill per spec


def _magnitude(v: int) -> tuple[int, int]:
    """(size, bits) for a DC diff / AC coefficient value."""
    if v == 0:
        return 0, 0
    size = int(abs(v)).bit_length()
    bits = v if v > 0 else v + (1 << size) - 1
    return size, bits


def _encode_block(
    bw: _BitWriter, block: np.ndarray, qtab: np.ndarray, dc_pred: int
) -> int:
    """DCT -> quantize -> zigzag -> Huffman one 8x8 block; returns the
    new DC predictor."""
    coeffs = _T @ (block - 128.0) @ _T.T
    q = np.round(coeffs.flatten() / qtab).astype(np.int64)[ZIGZAG]
    size, bits = _magnitude(int(q[0]) - dc_pred)
    code, ln = _DC_CODES[size]
    bw.write(code, ln)
    if size:
        bw.write(bits, size)
    run = 0
    for v in q[1:]:
        v = int(v)
        if v == 0:
            run += 1
            continue
        while run > 15:
            c, ln = _AC_CODES[0xF0]  # ZRL
            bw.write(c, ln)
            run -= 16
        size, bits = _magnitude(v)
        c, ln = _AC_CODES[(run << 4) | size]
        bw.write(c, ln)
        bw.write(bits, size)
        run = 0
    if run:
        c, ln = _AC_CODES[0x00]  # EOB
        bw.write(c, ln)
    return int(q[0])


def _dht_segment(tc: int, th: int, bits: list[int], vals: list[int]) -> bytes:
    body = bytes([(tc << 4) | th]) + bytes(bits[1:17]) + bytes(vals)
    return b"\xff\xc4" + struct.pack(">H", 2 + len(body)) + body


def _dqt_segment(tq: int, table: np.ndarray) -> bytes:
    body = bytes([tq]) + bytes(int(table[z]) for z in ZIGZAG)
    return b"\xff\xdb" + struct.pack(">H", 2 + len(body)) + body


def _pad_to(plane: np.ndarray, mult: int) -> np.ndarray:
    """Edge-replicate pad both dims up to a multiple of ``mult``."""
    h, w = plane.shape
    ph = (-h) % mult
    pw = (-w) % mult
    return np.pad(plane, ((0, ph), (0, pw)), mode="edge")


def encode_jpeg(
    pixels,
    quality: int = 90,
    subsample: bool = False,
    restart_interval: int = 0,
) -> bytes:
    """Encode (H, W, 3) uint8 RGB (or (H, W) grayscale) as a baseline
    JFIF JPEG. ``subsample=True`` writes 4:2:0 chroma (2x2-mean
    downsample, the interleaved-MCU layout real camera files use);
    default is 4:4:4. ``restart_interval`` > 0 emits a DRI segment
    and RSTn markers every that-many MCUs (what camera firmware
    writes for error resilience — and what exercises the decoder's
    restart path)."""
    px = np.asarray(pixels)
    gray = px.ndim == 2
    if not gray and (px.ndim != 3 or px.shape[2] != 3):
        raise ValueError(f"expected (H,W,3) or (H,W) pixels, got {px.shape}")
    h, w = px.shape[:2]
    qlum = _quality_scale(Q_LUM, quality)
    qchrom = _quality_scale(Q_CHROM, quality)

    if gray:
        planes = [px.astype(np.float64)]
        samp = [(1, 1)]
        qids = [0]
    else:
        rgb = px.astype(np.float64)
        r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        if subsample:
            ye = _pad_to(y, 16)
            cbe = _pad_to(cb, 16)
            cre = _pad_to(cr, 16)
            cb2 = cbe.reshape(
                cbe.shape[0] // 2, 2, cbe.shape[1] // 2, 2
            ).mean(axis=(1, 3))
            cr2 = cre.reshape(
                cre.shape[0] // 2, 2, cre.shape[1] // 2, 2
            ).mean(axis=(1, 3))
            planes = [ye, cb2, cr2]
            samp = [(2, 2), (1, 1), (1, 1)]
        else:
            planes = [y, cb, cr]
            samp = [(1, 1), (1, 1), (1, 1)]
        qids = [0, 1, 1]

    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    # pad every plane to its own MCU-aligned size
    planes = [
        _pad_to(p, 8 * (hmax // samp[i][0]) if False else 8)
        for i, p in enumerate(planes)
    ]
    # number of MCUs from the LUMA geometry
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    # ensure each plane covers its MCU grid (edge-replicate again)
    full = []
    for i, p in enumerate(planes):
        need_h = mcus_y * samp[i][1] * 8
        need_w = mcus_x * samp[i][0] * 8
        ph = need_h - p.shape[0]
        pw = need_w - p.shape[1]
        if ph or pw:
            p = np.pad(p, ((0, max(0, ph)), (0, max(0, pw))), mode="edge")
        full.append(p[:need_h, :need_w])

    bw = _BitWriter()
    preds = [0] * len(full)
    # quant divisors in NATURAL order (_encode_block zigzags after
    # the division), hoisted out of the MCU loop
    qnats = [
        (qlum if qid == 0 else qchrom).astype(np.float64)
        for qid in qids
    ]
    mcu_count = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_count and (
                mcu_count % restart_interval == 0
            ):
                bw.flush()
                bw.out += bytes(
                    [0xFF, 0xD0 + (mcu_count // restart_interval - 1) % 8]
                )
                preds = [0] * len(full)
            for ci, p in enumerate(full):
                hs, vs = samp[ci]
                for by in range(vs):
                    for bx in range(hs):
                        y0 = (my * vs + by) * 8
                        x0 = (mx * hs + bx) * 8
                        block = p[y0 : y0 + 8, x0 : x0 + 8]
                        preds[ci] = _encode_block(
                            bw, block, qnats[ci], preds[ci]
                        )
            mcu_count += 1
    bw.flush()

    out = bytearray(b"\xff\xd8")  # SOI
    out += (
        b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01"
        + b"\x00" + struct.pack(">HH", 1, 1) + b"\x00\x00"
    )
    out += _dqt_segment(0, qlum)
    if not gray:
        out += _dqt_segment(1, qchrom)
    ncomp = 1 if gray else 3
    sof = struct.pack(">BHHB", 8, h, w, ncomp)
    for ci in range(ncomp):
        sof += bytes(
            [ci + 1, (samp[ci][0] << 4) | samp[ci][1], qids[ci]]
        )
    out += b"\xff\xc0" + struct.pack(">H", 2 + len(sof)) + sof
    out += _dht_segment(0, 0, _DC_BITS, _DC_VALS)
    out += _dht_segment(1, 0, _AC_BITS, _AC_VALS)
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    sos = bytes([ncomp])
    for ci in range(ncomp):
        sos += bytes([ci + 1, 0x00])  # DC table 0, AC table 0 for all
    sos += b"\x00\x3f\x00"
    out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos
    out += bw.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# ---- decoder ---------------------------------------------------------------


class _BitReader:
    """Entropy-segment bit reader: 0xFF00 unstuffing, stops cleanly at
    any non-RST marker (leaves it for the caller)."""

    def __init__(self, buf: bytes, pos: int) -> None:
        self.buf = buf
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> None:
        if self.pos >= len(self.buf):
            raise ValueError("truncated JPEG entropy stream")
        b = self.buf[self.pos]
        if b == 0xFF:
            nxt = (
                self.buf[self.pos + 1]
                if self.pos + 1 < len(self.buf)
                else None
            )
            if nxt == 0x00:
                self.pos += 2
            elif nxt is not None and 0xD0 <= nxt <= 0xD7:
                raise _RestartMarker(nxt)
            else:
                # a real marker (EOI/next segment): pad with 1s like a
                # truncated final byte — decoders accept this tail
                b = 0xFF
                self.acc = (self.acc << 8) | b
                self.nbits += 8
                return
        else:
            self.pos += 1
        self.acc = (self.acc << 8) | b
        self.nbits += 8

    def bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v

    def align_past_restart(self) -> None:
        """Consume the RST marker at the current byte position and
        reset bit alignment."""
        self.nbits = 0
        # skip fill bytes up to the marker
        while self.pos + 1 < len(self.buf):
            if (
                self.buf[self.pos] == 0xFF
                and 0xD0 <= self.buf[self.pos + 1] <= 0xD7
            ):
                self.pos += 2
                return
            self.pos += 1
        raise ValueError("expected restart marker")


class _RestartMarker(Exception):
    def __init__(self, marker: int) -> None:
        self.marker = marker


def _build_huff(bits: list[int], vals: list[int]) -> dict:
    """{(length, code): symbol} canonical table from DHT BITS/VALS."""
    table = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length]):
            table[(length, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return table


def _huff_decode(br: _BitReader, table: dict) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | br.bit()
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid Huffman code in JPEG stream")


def _extend(v: int, size: int) -> int:
    """T.81 EXTEND: map magnitude bits back to a signed value."""
    if size == 0:
        return 0
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


def decode_jpeg(payload: bytes) -> np.ndarray:
    """Decode a baseline JPEG payload to an (H, W, 3) uint8 array
    (grayscale replicated to 3 channels). Raises NotImplementedError
    for progressive/arithmetic/12-bit streams and ValueError for
    malformed data — never a silently wrong image."""
    buf = bytes(payload)
    if buf[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    qtabs: dict[int, np.ndarray] = {}
    htabs: dict[tuple[int, int], dict] = {}
    frame = None
    restart_interval = 0
    while pos + 4 <= len(buf):
        if buf[pos] != 0xFF:
            raise ValueError(f"expected marker at {pos}")
        marker = buf[pos + 1]
        if marker == 0xD8:
            pos += 2
            continue
        if marker == 0xD9:
            break
        (seglen,) = struct.unpack_from(">H", buf, pos + 2)
        seg = buf[pos + 4 : pos + 2 + seglen]
        pos += 2 + seglen
        if marker == 0xDB:  # DQT — possibly several tables per segment
            o = 0
            while o < len(seg):
                pq, tq = seg[o] >> 4, seg[o] & 0xF
                o += 1
                if pq == 0:
                    t = np.frombuffer(
                        seg[o : o + 64], np.uint8
                    ).astype(np.int64)
                    o += 64
                else:
                    t = np.frombuffer(
                        seg[o : o + 128], ">u2"
                    ).astype(np.int64)
                    o += 128
                nat = np.zeros(64, np.int64)
                nat[ZIGZAG] = t  # DQT stores zigzag order
                qtabs[tq] = nat
        elif marker == 0xC4:  # DHT — possibly several tables
            o = 0
            while o < len(seg):
                tc, th = seg[o] >> 4, seg[o] & 0xF
                bits = [0] + list(seg[o + 1 : o + 17])
                n = sum(bits)
                vals = list(seg[o + 17 : o + 17 + n])
                htabs[(tc, th)] = _build_huff(bits, vals)
                o += 17 + n
        elif marker in (0xC0, 0xC1):  # SOF0/SOF1: baseline sequential
            prec, h, w, ncomp = struct.unpack_from(">BHHB", seg, 0)
            if prec != 8:
                raise NotImplementedError(f"{prec}-bit JPEG not supported")
            comps = []
            for i in range(ncomp):
                cid, hv, tq = seg[6 + 3 * i : 9 + 3 * i]
                comps.append(
                    {"id": cid, "h": hv >> 4, "v": hv & 0xF, "tq": tq}
                )
            frame = {"h": h, "w": w, "comps": comps}
        elif marker == 0xC2:
            raise NotImplementedError(
                "progressive JPEG (SOF2) not supported by the baseline "
                "decoder; use PIL for progressive streams"
            )
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"JPEG SOF marker 0x{marker:02x} (non-baseline) not "
                "supported"
            )
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack_from(">H", seg, 0)
        elif marker == 0xDA:  # SOS — entropy data follows
            if frame is None:
                raise ValueError("SOS before SOF")
            ns = seg[0]
            scan = {}
            for i in range(ns):
                cid, tt = seg[1 + 2 * i : 3 + 2 * i]
                scan[cid] = (tt >> 4, tt & 0xF)
            return _decode_scan(
                buf, pos, frame, scan, qtabs, htabs, restart_interval
            )
        # other markers (APPn, COM): skipped
    raise ValueError("no SOS scan in JPEG")


def _decode_scan(
    buf: bytes,
    pos: int,
    frame: dict,
    scan: dict,
    qtabs: dict,
    htabs: dict,
    restart_interval: int,
) -> np.ndarray:
    h, w, comps = frame["h"], frame["w"], frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    planes = [
        np.zeros(
            (mcus_y * c["v"] * 8, mcus_x * c["h"] * 8), np.float64
        )
        for c in comps
    ]
    br = _BitReader(buf, pos)
    preds = [0] * len(comps)
    mcu_count = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_count and (
                mcu_count % restart_interval == 0
            ):
                br.align_past_restart()
                preds = [0] * len(comps)
            try:
                for ci, c in enumerate(comps):
                    dc_t, ac_t = scan[c["id"]]
                    dct = htabs[(0, dc_t)]
                    act = htabs[(1, ac_t)]
                    qt = qtabs[c["tq"]]
                    for by in range(c["v"]):
                        for bx in range(c["h"]):
                            blk = _decode_block(
                                br, dct, act, qt, preds, ci
                            )
                            y0 = (my * c["v"] + by) * 8
                            x0 = (mx * c["h"] + bx) * 8
                            planes[ci][
                                y0 : y0 + 8, x0 : x0 + 8
                            ] = blk
            except _RestartMarker:
                raise ValueError(
                    "unexpected restart marker mid-MCU"
                ) from None
            mcu_count += 1
    # upsample each component to full resolution, crop, color-convert
    out = []
    for ci, c in enumerate(comps):
        p = planes[ci]
        fy, fx = vmax // c["v"], hmax // c["h"]
        if fy > 1 or fx > 1:
            p = np.repeat(np.repeat(p, fy, axis=0), fx, axis=1)
        out.append(p[:h, :w])
    if len(out) == 1:
        g = np.clip(np.round(out[0]), 0, 255).astype(np.uint8)
        return np.repeat(g[:, :, None], 3, axis=2)
    y, cb, cr = out
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    rgb = np.stack([r, g, b], axis=2)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


def _decode_block(
    br: _BitReader,
    dct: dict,
    act: dict,
    qtab: np.ndarray,
    preds: list[int],
    ci: int,
) -> np.ndarray:
    zz = np.zeros(64, np.int64)
    size = _huff_decode(br, dct)
    diff = _extend(br.bits(size), size) if size else 0
    preds[ci] += diff
    zz[0] = preds[ci]
    k = 1
    while k < 64:
        rs = _huff_decode(br, act)
        r, s = rs >> 4, rs & 0xF
        if s == 0:
            if r == 15:  # ZRL
                k += 16
                continue
            break  # EOB
        k += r
        if k > 63:
            raise ValueError("AC run past end of block")
        zz[k] = _extend(br.bits(s), s)
        k += 1
    coeffs = np.zeros(64, np.float64)
    coeffs[ZIGZAG] = zz * qtab[ZIGZAG]
    block = _T.T @ coeffs.reshape(8, 8) @ _T
    return block + 128.0
