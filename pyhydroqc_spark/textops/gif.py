"""GIF codec in pure Python + numpy — no PIL.

Decoder covers GIF87a/GIF89a: logical screen + global/local color tables,
extension-block skipping, full variable-width LZW decompression (LSB-first
bit packing, clear/EOI, dictionary growth to 12 bits), and Adam-style
4-pass deinterlacing. Returns the FIRST image frame as (h, w, 3) uint8 RGB
(animated GIFs: later frames are composition state the training-feature
path doesn't need; grab them by slicing the block stream again if ever
required).

Encoder writes a spec-valid single-frame GIF for images with ≤256 unique
colors using the classic "uncompressed GIF" technique (a CLEAR code before
every literal keeps the code width fixed) — it exists to make the decoder
testable in this container, not to be small.
"""

from __future__ import annotations

import struct

import numpy as np


def _lzw_decode(min_code_size: int, data: bytes, n_pixels: int) -> np.ndarray:
    clear = 1 << min_code_size
    eoi = clear + 1
    out = np.empty(n_pixels, dtype=np.uint8)
    n_out = 0

    bitpos = 0
    total_bits = len(data) * 8

    def read_code(width: int) -> int:
        nonlocal bitpos
        if bitpos + width > total_bits:
            return eoi
        v = 0
        for i in range(width):
            p = bitpos + i
            v |= ((data[p >> 3] >> (p & 7)) & 1) << i  # LSB-first
        bitpos += width
        return v

    width = min_code_size + 1
    dict_entries: list[bytes] = [bytes([i]) for i in range(clear)] + [b"", b""]
    prev: bytes | None = None
    while n_out < n_pixels:
        code = read_code(width)
        if code == clear:
            dict_entries = [bytes([i]) for i in range(clear)] + [b"", b""]
            width = min_code_size + 1
            prev = None
            continue
        if code == eoi:
            break
        if code < len(dict_entries):
            entry = dict_entries[code]
        elif code == len(dict_entries) and prev is not None:
            entry = prev + prev[:1]
        else:
            raise ValueError("corrupt GIF LZW stream")
        take = min(len(entry), n_pixels - n_out)
        out[n_out : n_out + take] = np.frombuffer(entry[:take], dtype=np.uint8)
        n_out += take
        if prev is not None and len(dict_entries) < 4096:
            dict_entries.append(prev + entry[:1])
            if len(dict_entries) == (1 << width) and width < 12:
                width += 1
        prev = entry
    if n_out < n_pixels:
        raise ValueError("truncated GIF pixel data")
    return out


def decode_gif(payload: bytes) -> np.ndarray:
    if payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF")
    sw, sh, flags, _bg, _ar = struct.unpack_from("<HHBBB", payload, 6)
    pos = 13
    gct = None
    if flags & 0x80:
        n = 2 << (flags & 0x07)
        gct = np.frombuffer(payload, np.uint8, n * 3, pos).reshape(n, 3)
        pos += n * 3
    while pos < len(payload):
        b = payload[pos]
        if b == 0x21:  # extension: label + sub-blocks
            pos += 2
            while payload[pos] != 0:
                pos += 1 + payload[pos]
            pos += 1
        elif b == 0x2C:  # image descriptor
            _lx, _ty, w, h, iflags = struct.unpack_from("<HHHHB", payload, pos + 1)
            pos += 10
            table = gct
            if iflags & 0x80:
                n = 2 << (iflags & 0x07)
                table = np.frombuffer(payload, np.uint8, n * 3, pos).reshape(n, 3)
                pos += n * 3
            if table is None:
                raise ValueError("GIF frame without a color table")
            min_code_size = payload[pos]
            pos += 1
            chunks = []
            while payload[pos] != 0:
                ln = payload[pos]
                chunks.append(payload[pos + 1 : pos + 1 + ln])
                pos += 1 + ln
            pos += 1
            idx = _lzw_decode(min_code_size, b"".join(chunks), w * h).reshape(h, w)
            if iflags & 0x40:  # interlaced: 4-pass row order
                ordered = np.empty_like(idx)
                rows = (
                    list(range(0, h, 8))
                    + list(range(4, h, 8))
                    + list(range(2, h, 4))
                    + list(range(1, h, 2))
                )
                ordered[rows] = idx
                idx = ordered
            return table[np.minimum(idx, len(table) - 1)]
        elif b == 0x3B:  # trailer
            break
        else:
            raise ValueError(f"unexpected GIF block 0x{b:02x}")
    raise ValueError("GIF contains no image frame")


def encode_gif(img: np.ndarray) -> bytes:
    """(h, w, 3) uint8 RGB (≤256 unique colors) → single-frame GIF89a.
    Uses the fixed-width CLEAR-before-every-literal LZW form."""
    h, w = img.shape[:2]
    flat = img.reshape(-1, 3)
    colors, idx = np.unique(flat, axis=0, return_inverse=True)
    if len(colors) > 256:
        raise ValueError("encode_gif needs <=256 unique colors (quantize first)")
    # pad palette to a power of two (min 2 entries)
    bits = max(1, int(np.ceil(np.log2(max(2, len(colors))))))
    pal = np.zeros((1 << bits, 3), dtype=np.uint8)
    pal[: len(colors)] = colors
    min_code_size = max(2, bits)
    clear = 1 << min_code_size
    eoi = clear + 1
    width = min_code_size + 1

    bitbuf = bytearray()
    acc = 0
    nacc = 0

    def put(code: int):
        nonlocal acc, nacc
        acc |= code << nacc
        nacc += width
        while nacc >= 8:
            bitbuf.append(acc & 0xFF)
            acc >>= 8
            nacc -= 8

    put(clear)
    for v in idx:
        put(int(v))
        put(clear)  # keep the dictionary (and code width) fixed
    put(eoi)
    if nacc:
        bitbuf.append(acc & 0xFF)

    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | ((pal.shape[0].bit_length() - 2) & 7), 0, 0)
    out += pal.tobytes()
    out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0)
    out.append(min_code_size)
    for i in range(0, len(bitbuf), 255):
        block = bitbuf[i : i + 255]
        out.append(len(block))
        out += block
    out += b"\x00\x3b"
    return bytes(out)
