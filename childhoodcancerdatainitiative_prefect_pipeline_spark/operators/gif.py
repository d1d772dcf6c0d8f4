"""GIF codec — pure stdlib, lossless (LZW + palette).

The palette-indexed image class, completing the stdlib codec suite
(BMP raw, PNG filtered-deflate, JPEG transform-coded, GIF
LZW-palette).  Everything follows the PUBLIC GIF87a/89a
specification:

- :func:`encode_gif` — fixture/oracle writer: one image, global
  color table, LZW data emitted as literal codes with periodic CLEAR
  codes (the classic "uncompressed GIF" technique — valid LZW that
  never grows past ``min_code_size+1`` bits);
- :func:`decode_gif` — general decoder: screen/image descriptors,
  global AND local color tables, full dynamic-dictionary LZW
  (code-width growth to 12 bits, clear/EOI handling), extension
  blocks skipped by sub-block walk, 4-pass interlace row order,
  palette lookup → exact RGB channel sums.  Malformed payloads raise
  ``ValueError`` → the Arrow kernel dead-letters.

GIF is lossless, so certification needs no special regime — the
analytic-fixture trick of the BMP entry applies verbatim.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame


def encode_gif(
    width: int,
    height: int,
    index_fn,
    palette: list[tuple[int, int, int]],
    interlace: bool = False,
) -> bytes:
    """Minimal GIF89a writer: one frame, global color table.

    ``index_fn(x, y) -> palette index``; the palette is padded to the
    next power of two (min 2).  ``interlace=True`` writes rows in the
    spec's 4-pass order with the interlace flag set."""
    size = 2
    bits = 1
    while size < len(palette):
        size *= 2
        bits += 1
    if size > 256:
        raise ValueError("palette too large")
    pal = list(palette) + [(0, 0, 0)] * (size - len(palette))
    out = bytearray(b"GIF89a")
    out += struct.pack("<HH", width, height)
    out += bytes([0x80 | (bits - 1), 0, 0])  # GCT flag+size, bg, aspect
    for r, g, b in pal:
        out += bytes((r, g, b))
    out += b"\x2c" + struct.pack("<HHHH", 0, 0, width, height)
    out += bytes([0x40 if interlace else 0x00])

    min_code = max(2, bits)
    clear = 1 << min_code
    eoi = clear + 1
    width_bits = min_code + 1

    acc = 0
    nacc = 0
    data = bytearray()

    def emit(code: int) -> None:
        nonlocal acc, nacc
        acc |= code << nacc  # GIF packs LSB-first
        nacc += width_bits
        while nacc >= 8:
            data.append(acc & 0xFF)
            acc >>= 8
            nacc -= 8

    emit(clear)
    count = 0
    row_order = _interlace_rows(height) if interlace else range(height)
    for y in row_order:
        for x in range(width):
            emit(index_fn(x, y))
            count += 1
            # re-CLEAR before the dictionary would grow the code width
            # (after 2^min_code - 2 literals a new entry would exist)
            if count % ((1 << min_code) - 2) == 0:
                emit(clear)
    emit(eoi)
    if nacc:
        data.append(acc & 0xFF)

    out += bytes([min_code])
    for off in range(0, len(data), 255):
        chunk = data[off : off + 255]
        out += bytes([len(chunk)]) + chunk
    out += b"\x00\x3b"  # block terminator + trailer
    return bytes(out)


def _interlace_rows(height: int) -> list[int]:
    rows = list(range(0, height, 8))
    rows += list(range(4, height, 8))
    rows += list(range(2, height, 4))
    rows += list(range(1, height, 2))
    return rows


def decode_gif(payload: bytes) -> dict:
    """GIF → dimensions + exact RGB channel sums of the FIRST image.

    Handles global/local color tables, dynamic LZW, interlace, and
    skips extension blocks; raises on structural damage."""
    if len(payload) < 13 or payload[:3] != b"GIF":
        raise ValueError("not a GIF payload")
    if payload[3:6] not in (b"87a", b"89a"):
        raise ValueError("unknown GIF version")
    w, h = struct.unpack_from("<HH", payload, 6)
    flags = payload[10]
    pos = 13
    gct = None
    if flags & 0x80:
        n = 2 << (flags & 0x07)
        gct = [
            tuple(payload[pos + 3 * i : pos + 3 * i + 3]) for i in range(n)
        ]
        pos += 3 * n

    def skip_subblocks(p: int) -> int:
        while True:
            if p >= len(payload):
                raise ValueError("truncated sub-blocks")
            blen = payload[p]
            p += 1
            if blen == 0:
                return p
            p += blen

    while pos < len(payload):
        block = payload[pos]
        pos += 1
        if block == 0x3B:  # trailer
            raise ValueError("GIF has no image data")
        if block == 0x21:  # extension
            pos += 1  # label
            pos = skip_subblocks(pos)
            continue
        if block != 0x2C:
            raise ValueError(f"unknown GIF block 0x{block:02X}")
        left, top, iw, ih = struct.unpack_from("<HHHH", payload, pos)
        iflags = payload[pos + 8]
        pos += 9
        table = gct
        if iflags & 0x80:  # local color table
            n = 2 << (iflags & 0x07)
            table = [
                tuple(payload[pos + 3 * i : pos + 3 * i + 3])
                for i in range(n)
            ]
            pos += 3 * n
        if table is None:
            raise ValueError("no color table for image")
        interlaced = bool(iflags & 0x40)

        if pos >= len(payload):
            raise ValueError("truncated GIF before LZW data")
        min_code = payload[pos]
        pos += 1
        data = bytearray()
        while True:
            if pos >= len(payload):
                raise ValueError("truncated LZW sub-blocks")
            blen = payload[pos]
            pos += 1
            if blen == 0:
                break
            if pos + blen > len(payload):
                raise ValueError("truncated LZW sub-block body")
            data += payload[pos : pos + blen]
            pos += blen

        # LZW decode (LSB-first packing, dynamic width 3..12 bits)
        clear = 1 << min_code
        eoi = clear + 1
        dictionary: list[bytes] = [bytes([i]) for i in range(clear)] + [
            b"", b""
        ]
        width_bits = min_code + 1
        acc = nacc = bitpos = 0
        indices = bytearray()
        prev: bytes | None = None
        i = 0
        n = len(data)
        while True:
            while nacc < width_bits:
                if i >= n:
                    raise ValueError("LZW stream exhausted before EOI")
                acc |= data[i] << nacc
                i += 1
                nacc += 8
            code = acc & ((1 << width_bits) - 1)
            acc >>= width_bits
            nacc -= width_bits
            if code == clear:
                dictionary = [bytes([j]) for j in range(clear)] + [b"", b""]
                width_bits = min_code + 1
                prev = None
                continue
            if code == eoi:
                break
            if prev is None:
                if code >= len(dictionary):
                    raise ValueError("bad first LZW code")
                entry = dictionary[code]
            elif code < len(dictionary):
                entry = dictionary[code]
                dictionary.append(prev + entry[:1])
            elif code == len(dictionary):
                entry = prev + prev[:1]
                dictionary.append(entry)
            else:
                raise ValueError("LZW code out of range")
            indices += entry
            prev = entry
            if (
                len(dictionary) == (1 << width_bits)
                and width_bits < 12
            ):
                width_bits += 1
        if len(indices) < iw * ih:
            raise ValueError("LZW produced too few pixels")

        if interlaced:
            order = _interlace_rows(ih)
        else:
            order = list(range(ih))
        sum_r = sum_g = sum_b = 0
        pos_checksum = 0  # position-weighted: pins interlace reorder
        tlen = len(table)
        for out_row, y in enumerate(order):
            base = out_row * iw
            for x in range(iw):
                idx = indices[base + x]
                if idx >= tlen:
                    raise ValueError("palette index out of range")
                r, g, b = table[idx]
                sum_r += r
                sum_g += g
                sum_b += b
                pos_checksum += (y * iw + x + 1) * idx
        return {
            "width": iw,
            "height": ih,
            "sum_r": sum_r,
            "sum_g": sum_g,
            "sum_b": sum_b,
            "pos_checksum": pos_checksum,
        }
    raise ValueError("truncated GIF (no trailer)")


GIF_STATS_SCHEMA = (
    "media_id long, width long, height long, sum_r long, sum_g long, "
    "sum_b long, pos_checksum long, decode_error string"
)


def decode_gif_stats(media: DataFrame, id_col: str = "media_id") -> DataFrame:
    """Arrow-batched REAL GIF decode with dead-letter discipline."""
    cols = [
        id_col, "width", "height", "sum_r", "sum_g", "sum_b",
        "pos_checksum", "decode_error",
    ]

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf[id_col], pdf["payload"]):
                try:
                    d = decode_gif(bytes(payload))
                    rows.append(
                        (int(mid), d["width"], d["height"], d["sum_r"],
                         d["sum_g"], d["sum_b"], d["pos_checksum"], None)
                    )
                except Exception as ex:  # noqa: BLE001
                    rows.append(
                        (int(mid),) + (None,) * 6
                        + (f"{type(ex).__name__}: {ex}",)
                    )
            yield pd.DataFrame(rows, columns=cols)

    return media.select(id_col, "payload").mapInPandas(
        kernel, GIF_STATS_SCHEMA
    )
