"""Baseline JPEG codec in pure numpy + stdlib — no libjpeg/PIL.

Covers the sequential-DCT baseline process (the overwhelming majority of
web-corpus JPEGs): marker parse, DQT/DHT/SOF0/SOS/DRI, Huffman entropy
decode with byte-unstuffing and restart markers, dequantize + dezigzag,
matrix IDCT, chroma upsampling for any (h, v) sampling factors, YCbCr→RGB.
Progressive (SOF2), arithmetic coding, and 12-bit precision raise — those
genuinely warrant libjpeg in a deployment.

The encoder (`encode_jpeg`) writes baseline 4:4:4 with flat quantization
tables and simple fixed-length canonical Huffman tables — it exists so the
decoder is testable in this container (roundtrip ≈ identity within the
quantization error it controls); it is NOT a size-optimal encoder.

Per-block Python loops bound throughput; the mapInPandas batching above
this keeps cores busy, and a deployment swaps in libjpeg behind the same
``decode_jpeg(bytes) -> (h, w, 3) uint8`` contract.
"""

from __future__ import annotations

import struct

import numpy as np

ZIGZAG = np.array([
     0,  1,  8, 16,  9,  2,  3, 10,
    17, 24, 32, 25, 18, 11,  4,  5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13,  6,  7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
])

_k = np.arange(8)
_DCT = np.cos((2 * _k[None, :] + 1) * _k[:, None] * np.pi / 16) / 2.0
_DCT[0] *= 1.0 / np.sqrt(2.0)


def _idct2(coef: np.ndarray) -> np.ndarray:
    return _DCT.T @ coef @ _DCT


def _fdct2(block: np.ndarray) -> np.ndarray:
    return _DCT @ block @ _DCT.T


# --------------------------------------------------------------- decoding

class _Bits:
    """MSB-first bit reader over an unstuffed entropy segment."""

    def __init__(self, data: bytes):
        self.bits = np.unpackbits(np.frombuffer(data, dtype=np.uint8))
        self.pos = 0

    def read(self, n: int) -> int:
        if n == 0:
            return 0
        v = 0
        b = self.bits
        p = self.pos
        if p + n > len(b):
            raise ValueError("truncated JPEG entropy data")
        for i in range(n):
            v = (v << 1) | int(b[p + i])
        self.pos = p + n
        return v


def _build_huff(counts: bytes, symbols: bytes) -> dict:
    """(length, code) -> symbol, canonical order per the JPEG spec."""
    table = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(counts[length - 1]):
            table[(length, code)] = symbols[k]
            code += 1
            k += 1
        code <<= 1
    return table


def _huff_decode(bits: _Bits, table: dict) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | bits.read(1)
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid Huffman code")


def _extend(v: int, s: int) -> int:
    if s == 0:
        return 0
    return v if v >= (1 << (s - 1)) else v - (1 << s) + 1


def decode_jpeg(payload: bytes) -> np.ndarray:
    """Baseline JPEG → (h, w, 3) uint8 RGB (grayscale replicated)."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG")
    qt: dict[int, np.ndarray] = {}
    huff_dc: dict[int, dict] = {}
    huff_ac: dict[int, dict] = {}
    frame = None
    restart = 0
    pos = 2
    scan = None
    while pos < len(payload):
        if payload[pos] != 0xFF:
            pos += 1
            continue
        marker = payload[pos + 1]
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            pos += 2
            continue
        if marker == 0xD9:  # EOI
            break
        (seglen,) = struct.unpack_from(">H", payload, pos + 2)
        seg = payload[pos + 4 : pos + 2 + seglen]
        if marker == 0xDB:  # DQT
            i = 0
            while i < len(seg):
                prec, tid = seg[i] >> 4, seg[i] & 0xF
                if prec != 0:
                    raise ValueError("16-bit quant tables not supported")
                qt[tid] = np.frombuffer(seg, np.uint8, 64, i + 1).astype(np.int32)
                i += 65
        elif marker == 0xC4:  # DHT
            i = 0
            while i < len(seg):
                cls, tid = seg[i] >> 4, seg[i] & 0xF
                counts = seg[i + 1 : i + 17]
                n = sum(counts)
                table = _build_huff(counts, seg[i + 17 : i + 17 + n])
                (huff_dc if cls == 0 else huff_ac)[tid] = table
                i += 17 + n
        elif marker == 0xC0:  # SOF0 baseline
            prec, h, w, nc = struct.unpack_from(">BHHB", seg, 0)
            if prec != 8:
                raise ValueError("only 8-bit precision supported")
            comps = []
            for ci in range(nc):
                cid, hv, tq = struct.unpack_from(">BBB", seg, 6 + 3 * ci)
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0xF, "tq": tq})
            frame = {"h": h, "w": w, "comps": comps}
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB):
            raise ValueError(
                f"non-baseline JPEG (SOF{marker - 0xC0}) — deploy libjpeg"
            )
        elif marker == 0xDD:  # DRI
            (restart,) = struct.unpack_from(">H", seg, 0)
        elif marker == 0xDA:  # SOS
            ns = seg[0]
            sel = {}
            for si in range(ns):
                cid, tabs = seg[1 + 2 * si], seg[2 + 2 * si]
                sel[cid] = (tabs >> 4, tabs & 0xF)
            scan = (pos + 2 + seglen, sel)
            break
        pos += 2 + seglen
    if frame is None or scan is None:
        raise ValueError("malformed JPEG (missing SOF0/SOS)")

    data_start, sel = scan
    # entropy segment: up to EOI, minus stuffing; split at restart markers
    raw = payload[data_start:]
    end = raw.find(b"\xff\xd9")
    raw = raw[: end if end >= 0 else len(raw)]
    intervals: list[bytes] = []
    cur = bytearray()
    i = 0
    while i < len(raw):
        b = raw[i]
        if b == 0xFF:
            nxt = raw[i + 1] if i + 1 < len(raw) else 0
            if nxt == 0x00:
                cur.append(0xFF)
                i += 2
                continue
            if 0xD0 <= nxt <= 0xD7:  # RSTn: new interval, reset predictors
                intervals.append(bytes(cur))
                cur = bytearray()
                i += 2
                continue
            break
        cur.append(b)
        i += 1
    intervals.append(bytes(cur))

    comps = frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = -(-frame["w"] // (8 * hmax))
    mcuy = -(-frame["h"] // (8 * vmax))
    planes = {
        c["id"]: np.zeros((mcuy * c["v"] * 8, mcux * c["h"] * 8), dtype=np.float64)
        for c in comps
    }
    pred = {c["id"]: 0 for c in comps}
    bits = _Bits(intervals[0])
    interval_ix = 0
    n_in_interval = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart and n_in_interval == restart:
                interval_ix += 1
                bits = _Bits(intervals[interval_ix])
                pred = {c["id"]: 0 for c in comps}
                n_in_interval = 0
            n_in_interval += 1
            for c in comps:
                dc_t = huff_dc[sel[c["id"]][0]]
                ac_t = huff_ac[sel[c["id"]][1]]
                q = qt[c["tq"]]
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        zz = np.zeros(64, dtype=np.int32)
                        s = _huff_decode(bits, dc_t)
                        pred[c["id"]] += _extend(bits.read(s), s)
                        zz[0] = pred[c["id"]]
                        k = 1
                        while k < 64:
                            rs = _huff_decode(bits, ac_t)
                            r, s = rs >> 4, rs & 0xF
                            if rs == 0x00:  # EOB
                                break
                            if rs == 0xF0:  # ZRL
                                k += 16
                                continue
                            k += r
                            if k > 63:
                                raise ValueError("AC index overflow")
                            zz[k] = _extend(bits.read(s), s)
                            k += 1
                        coef = np.zeros(64, dtype=np.float64)
                        coef[ZIGZAG] = zz * q
                        block = _idct2(coef.reshape(8, 8)) + 128.0
                        y0 = (my * c["v"] + by) * 8
                        x0 = (mx * c["h"] + bx) * 8
                        planes[c["id"]][y0 : y0 + 8, x0 : x0 + 8] = block

    h, w = frame["h"], frame["w"]
    full = []
    for c in comps:
        p = planes[c["id"]]
        ry, rx = vmax // c["v"], hmax // c["h"]
        if ry > 1 or rx > 1:  # nearest upsample to full resolution
            p = np.repeat(np.repeat(p, ry, axis=0), rx, axis=1)
        full.append(p[:h, :w])
    if len(full) == 1:
        g = np.clip(np.round(full[0]), 0, 255).astype(np.uint8)
        return np.repeat(g[..., None], 3, axis=2)
    y, cb, cr = full[0], full[1] - 128.0, full[2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    return np.clip(np.round(np.stack([r, g, b], axis=-1)), 0, 255).astype(np.uint8)


# --------------------------------------------------------------- encoding

def _flat_huff_spec(symbols: list[int], length: int) -> tuple[bytes, bytes, dict]:
    """Fixed-length canonical Huffman table over ``symbols`` (valid while
    len(symbols)·2^-length ≤ 1). Returns (counts16, symbol bytes,
    symbol -> (length, code))."""
    counts = bytearray(16)
    counts[length - 1] = len(symbols)
    # with no shorter codes, canonical assignment at one length is simply
    # 0, 1, 2, … in symbol order — matching any spec decoder's DHT walk
    enc = {s: (length, i) for i, s in enumerate(symbols)}
    return bytes(counts), bytes(symbols), enc


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, code: int, length: int):
        for i in range(length - 1, -1, -1):
            self.acc = (self.acc << 1) | ((code >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)  # byte stuffing
                self.acc = 0
                self.n = 0

    def flush(self):
        if self.n:
            self.acc <<= 8 - self.n
            self.acc |= (1 << (8 - self.n)) - 1  # pad with 1s per spec
            self.out.append(self.acc)
            if self.acc == 0xFF:
                self.out.append(0x00)
            self.acc = 0
            self.n = 0


def _category(v: int) -> int:
    return 0 if v == 0 else int(abs(v)).bit_length()


def encode_jpeg(
    img: np.ndarray,
    qscale: int = 8,
    subsampling: str = "444",
    restart_every: int = 0,
) -> bytes:
    """(h, w, 3) uint8 RGB → baseline JPEG (flat quant = qscale,
    fixed-length canonical Huffman tables). ``subsampling`` is "444" or
    "420" (2×2 mean-downsampled chroma); ``restart_every`` > 0 inserts
    RSTn markers every that many MCUs (and resets the DC predictors).
    Lossy by qscale (plus chroma averaging for 420)."""
    if subsampling not in ("444", "420"):
        raise ValueError("subsampling must be '444' or '420'")
    gray = img.ndim == 2
    sub = 1 if gray else (2 if subsampling == "420" else 1)
    h, w = img.shape[:2]
    x = img.astype(np.float64)
    if gray:
        y, cb, cr = x, None, None
    else:
        y = 0.299 * x[..., 0] + 0.587 * x[..., 1] + 0.114 * x[..., 2]
        cb = -0.168736 * x[..., 0] - 0.331264 * x[..., 1] + 0.5 * x[..., 2] + 128.0
        cr = 0.5 * x[..., 0] - 0.418688 * x[..., 1] - 0.081312 * x[..., 2] + 128.0

    q = np.full(64, qscale, dtype=np.uint8)
    dc_syms = list(range(12))
    ac_syms = [0x00, 0xF0] + [
        (r << 4) | s for r in range(16) for s in range(1, 11)
    ]
    dc_counts, dc_symbytes, dc_enc = _flat_huff_spec(dc_syms, 4)
    ac_counts, ac_symbytes, ac_enc = _flat_huff_spec(ac_syms, 8)

    mcu_px = 8 * sub
    ph = -(-h // mcu_px) * mcu_px
    pw = -(-w // mcu_px) * mcu_px

    def pad(p):
        out = np.empty((ph, pw))
        out[: p.shape[0], : p.shape[1]] = p
        out[p.shape[0] :, : p.shape[1]] = p[-1:, :]
        out[:, p.shape[1] :] = out[:, p.shape[1] - 1 : p.shape[1]]
        return out

    yp = pad(y)
    if gray:
        cbp = crp = None
    elif sub == 2:
        cbp = pad(cb)
        crp = pad(cr)
        cbp = cbp.reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3))
        crp = crp.reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3))
    else:
        cbp, crp = pad(cb), pad(cr)

    bw = _BitWriter()
    pred = [0, 0, 0]

    def emit_block(ci: int, p: np.ndarray, by: int, bx: int):
        block = p[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] - 128.0
        coef = _fdct2(block)
        zz = np.round(coef.ravel()[ZIGZAG] / q).astype(np.int64)
        diff = int(zz[0]) - pred[ci]
        pred[ci] = int(zz[0])
        s = _category(diff)
        l, c = dc_enc[s]
        bw.write(c, l)
        if s:
            bw.write(diff if diff >= 0 else diff + (1 << s) - 1, s)
        k = 1
        while k < 64:
            run = 0
            while k < 64 and zz[k] == 0:
                run += 1
                k += 1
            if k == 64:
                l, c = ac_enc[0x00]
                bw.write(c, l)
                break
            while run >= 16:
                l, c = ac_enc[0xF0]
                bw.write(c, l)
                run -= 16
            v = int(zz[k])
            s = _category(v)
            l, c = ac_enc[(run << 4) | s]
            bw.write(c, l)
            bw.write(v if v >= 0 else v + (1 << s) - 1, s)
            k += 1

    entropy = bytearray()
    n_mcu = 0
    rst = 0
    for my in range(ph // mcu_px):
        for mx in range(pw // mcu_px):
            if restart_every and n_mcu and n_mcu % restart_every == 0:
                bw.flush()
                entropy += bw.out
                entropy += bytes([0xFF, 0xD0 + rst])
                rst = (rst + 1) % 8
                bw = _BitWriter()
                pred[:] = [0, 0, 0]
            n_mcu += 1
            for by in range(sub):
                for bx in range(sub):
                    emit_block(0, yp, my * sub + by, mx * sub + bx)
            if not gray:
                emit_block(1, cbp, my, mx)
                emit_block(2, crp, my, mx)
    bw.flush()
    entropy += bw.out

    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">BBH", 0xFF, marker, len(body) + 2) + body

    out = bytearray(b"\xff\xd8")
    out += seg(0xDB, b"\x00" + q.tobytes())
    ncomp = 1 if gray else 3
    sof = struct.pack(">BHHB", 8, h, w, ncomp)
    comp_ids = (1,) if gray else (1, 2, 3)
    for cid, hv in zip(comp_ids, ((sub << 4) | sub, 0x11, 0x11)):
        sof += struct.pack(">BBB", cid, hv, 0)
    out += seg(0xC0, sof)
    out += seg(0xC4, b"\x00" + dc_counts + dc_symbytes)
    out += seg(0xC4, b"\x10" + ac_counts + ac_symbytes)
    if restart_every:
        out += seg(0xDD, struct.pack(">H", restart_every))
    sos = bytes([ncomp]) + b"".join(struct.pack(">BB", cid, 0x00) for cid in comp_ids)
    sos += b"\x00\x3f\x00"
    out += seg(0xDA, sos)
    out += entropy
    out += b"\xff\xd9"
    return bytes(out)
