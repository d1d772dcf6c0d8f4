"""Baseline JPEG codec — pure stdlib, no codec libraries.

Closes the last declared multimodal stub (`multimodal.py`'s JPEG
seam): like the BMP/PNG/WAV/BAM kernels, the container's lack of
PIL/libjpeg gates nothing that the stdlib plus the PUBLIC JPEG
specification (ITU-T T.81, baseline sequential DCT) can't express:

- :func:`encode_jpeg` — fixture/oracle writer: RGB pixels → YCbCr
  (JFIF), optional 4:2:0 chroma subsampling, forward DCT, uniform
  quantization, canonical Huffman entropy coding with self-describing
  DHT segments (the decoder reads whatever tables the stream declares
  — fixtures deliberately use non-Annex-K tables so the general DHT
  path is what gets exercised).
- :func:`decode_jpeg` — general baseline decoder: marker parse,
  DQT/DHT/SOF0/DRI/SOS, Huffman + run-length entropy decode, dequant,
  IDCT, sampling-factor upsampling (4:4:4 / 4:2:2 / 4:2:0), YCbCr→RGB,
  restart-marker resync.  Progressive (SOF2) and 12-bit streams
  raise ``ValueError`` — the kernel dead-letters them.

Exactness: images that are CONSTANT within each MCU decode
bit-exactly at quantization 1 (a flat block's DCT is a lone DC
coefficient, preserved exactly), and grayscale content survives the
color transform unchanged — so analytically-generated flat-block
fixtures give exact channel sums, the same certification trick as
the BMP/PNG entries.  General content round-trips within ±2/pixel
(quantization + color-transform rounding), pinned in unit tests.

Reference capability: src/sra_metadata.py and the DCC image manifest
flows treat JPEG attachments as opaque; this makes the decode leg
real for the multimodal pipeline (operators/multimodal.py:82 seam).
"""

from __future__ import annotations

import math
import struct

# ---------------------------------------------------------------------------
# Shared constants
# ---------------------------------------------------------------------------

#: zigzag scan: position in scan order → index in the 8×8 block
ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]

_M = [
    [
        0.5 * (1 / math.sqrt(2) if u == 0 else 1.0)
        * math.cos((2 * x + 1) * u * math.pi / 16)
        for x in range(8)
    ]
    for u in range(8)
]


def _fdct(block: list[float]) -> list[float]:
    """Forward 8×8 DCT-II (F = M·f·Mᵀ), block in row-major order."""
    tmp = [0.0] * 64
    for u in range(8):
        for x in range(8):
            m = _M[u][x]
            if m:
                for y in range(8):
                    tmp[u * 8 + y] += m * block[x * 8 + y]
    out = [0.0] * 64
    for u in range(8):
        for v in range(8):
            s = 0.0
            for y in range(8):
                s += tmp[u * 8 + y] * _M[v][y]
            out[u * 8 + v] = s
    return out


def _idct(coef: list[float]) -> list[float]:
    """Inverse 8×8 DCT (f = Mᵀ·F·M) — pure-Python reference kernel."""
    tmp = [0.0] * 64
    for x in range(8):
        for u in range(8):
            m = _M[u][x]
            if m:
                for v in range(8):
                    tmp[x * 8 + v] += m * coef[u * 8 + v]
    out = [0.0] * 64
    for x in range(8):
        for y in range(8):
            s = 0.0
            for v in range(8):
                s += tmp[x * 8 + v] * _M[v][y]
            out[x * 8 + y] = s
    return out


# ---------------------------------------------------------------------------
# IDCT+place kernels — the decode hot loop behind a selectable
# interface (r6 VERDICT item 6: the video probe is decode-bound; the
# numpy kernel batches every block of a scan through ONE Mᵀ·F·M
# matmul + vectorized dequant/clip/scatter instead of per-block
# Python loops).  Both kernels round half-even (Python round == np
# rint), so pixel output — and every downstream oracle hash — is
# identical; tests/test_operators.py pins kernel equivalence.
# ---------------------------------------------------------------------------

#: (base_y, base_x, zz) triples buffered by _decode_planes per component
_BlockList = "list[tuple[int, int, list[int]]]"


def _idct_place_python(
    plane: bytearray, cols: int, blocks, qt: list[int]
) -> None:
    """Reference kernel: per-block dequant → _idct → clamp → place."""
    for base_y, base_x, zz in blocks:
        coef = [0.0] * 64
        for i in range(64):
            coef[ZIGZAG[i]] = zz[i] * qt[i]
        px = _idct(coef)
        for yy in range(8):
            row = (base_y + yy) * cols + base_x
            for xx in range(8):
                v = int(round(px[yy * 8 + xx])) + 128
                plane[row + xx] = min(255, max(0, v))


def _batched_idct(coef, m):
    """(n,8,8) inverse DCT with the SAME accumulation order as
    :func:`_idct` (x→u ascending, then v ascending): each step is one
    elementwise multiply+add over the batch, so every double matches
    the scalar reference bit-for-bit — no BLAS reassociation can move
    a value across a .5 rounding boundary (ADVICE r7 item 2)."""
    import numpy as np

    n = coef.shape[0]
    tmp = np.zeros((n, 8, 8), dtype=np.float64)  # tmp[b,x,v]
    for u in range(8):
        # skipping an all-zero slice is bit-exact: it would only add
        # ±0.0 products, which never change any accumulated double
        if coef[:, u, :].any():
            tmp += m[u, :][None, :, None] * coef[:, u, None, :]
    out = np.zeros((n, 8, 8), dtype=np.float64)  # out[b,x,y]
    for v in range(8):
        if tmp[:, :, v].any():
            out += tmp[:, :, v, None] * m[v, None, :][None, :, :]
    return out


def _batched_fdct(blocks, m):
    """(n,8,8) forward DCT mirroring :func:`_fdct`'s accumulation
    order (u→x ascending, then y ascending); see :func:`_batched_idct`
    for why the order is pinned."""
    import numpy as np

    n = blocks.shape[0]
    tmp = np.zeros((n, 8, 8), dtype=np.float64)  # tmp[b,u,y]
    for x in range(8):
        tmp += m[:, x][None, :, None] * blocks[:, x, None, :]
    out = np.zeros((n, 8, 8), dtype=np.float64)  # out[b,u,v]
    for y in range(8):
        out += tmp[:, :, y, None] * m[:, y][None, None, :]
    return out


def _idct_place_numpy(
    plane: bytearray, cols: int, blocks, qt: list[int]
) -> None:
    """Vectorized kernel: one (n,8,8) batched fixed-order IDCT."""
    import numpy as np

    from itertools import chain

    n = len(blocks)
    zzm = np.fromiter(
        chain.from_iterable(b[2] for b in blocks),
        dtype=np.float64,
        count=n * 64,
    ).reshape(n, 64)
    deq = zzm * np.asarray(qt, dtype=np.float64)
    coef = np.empty((n, 64), dtype=np.float64)
    coef[:, ZIGZAG] = deq  # de-zigzag: coef[natural ZIGZAG[i]] = deq[i]
    m = np.asarray(_M, dtype=np.float64)
    px = _batched_idct(coef.reshape(n, 8, 8), m)
    v = np.rint(px).astype(np.int64) + 128
    np.clip(v, 0, 255, out=v)
    by = np.fromiter((b[0] for b in blocks), dtype=np.int64, count=n)
    bx = np.fromiter((b[1] for b in blocks), dtype=np.int64, count=n)
    yy = np.arange(8, dtype=np.int64)
    flat = (
        (by[:, None, None] + yy[None, :, None]) * cols
        + bx[:, None, None]
        + yy[None, None, :]
    )
    arr = np.frombuffer(plane, dtype=np.uint8)
    arr[flat.reshape(-1)] = v.reshape(-1).astype(np.uint8)


_IDCT_KERNELS = {"python": _idct_place_python, "numpy": _idct_place_numpy}
_idct_kernel_name = "numpy"


def set_idct_kernel(name: str) -> None:
    """Select the decode IDCT kernel ('numpy' default, 'python' ref)."""
    global _idct_kernel_name
    if name not in _IDCT_KERNELS:
        raise ValueError(f"unknown IDCT kernel {name!r}")
    _idct_kernel_name = name


def _idct_place(plane, cols, blocks, qt) -> None:
    if _idct_kernel_name == "numpy":
        try:
            _idct_place_numpy(plane, cols, blocks, qt)
            return
        except ImportError:  # numpy unavailable → reference kernel
            pass
    _idct_place_python(plane, cols, blocks, qt)


def _magnitude(v: int) -> tuple[int, int]:
    """JPEG magnitude category + value bits for a DC diff / AC coef."""
    s = abs(v).bit_length()
    bits = v if v >= 0 else v + (1 << s) - 1
    return s, bits


def _extend(bits: int, s: int) -> int:
    """Inverse of :func:`_magnitude` (T.81 figure F.12)."""
    if s == 0:
        return 0
    if bits < (1 << (s - 1)):
        return bits - (1 << s) + 1
    return bits


# ---------------------------------------------------------------------------
# Fixture Huffman tables: every category/(run,size) symbol at one
# canonical code length — compact to declare, decodes through the
# same general path as any Annex-K stream.
# ---------------------------------------------------------------------------

_DC_SYMBOLS = list(range(12))  # categories 0..11, 4-bit codes
_AC_SYMBOLS = [0x00, 0xF0] + [  # EOB, ZRL, then (run,size) pairs
    (run << 4) | size for run in range(16) for size in range(1, 11)
]  # 162 symbols, 8-bit codes


def _canonical_codes(symbols: list[int], length: int) -> dict[int, tuple[int, int]]:
    return {sym: (i, length) for i, sym in enumerate(symbols)}


_ENC_DC = _canonical_codes(_DC_SYMBOLS, 4)
_ENC_AC = _canonical_codes(_AC_SYMBOLS, 8)


def _dht_segment(tc: int, th: int, symbols: list[int], length: int) -> bytes:
    bits = [0] * 16
    bits[length - 1] = len(symbols)
    body = bytes([(tc << 4) | th]) + bytes(bits) + bytes(symbols)
    return b"\xff\xc4" + struct.pack(">H", len(body) + 2) + body


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self._acc = 0
        self._n = 0

    def write(self, code: int, length: int) -> None:
        self._acc = (self._acc << length) | (code & ((1 << length) - 1))
        self._n += length
        while self._n >= 8:
            self._n -= 8
            byte = (self._acc >> self._n) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:
                self.out.append(0x00)  # byte stuffing

    def flush(self) -> None:
        if self._n:
            pad = 8 - self._n
            self.write((1 << pad) - 1, pad)  # 1-fill to byte boundary


def _rgb_to_ycbcr(r: int, g: int, b: int) -> tuple[int, int, int]:
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128
    clamp = lambda v: min(255, max(0, int(round(v))))  # noqa: E731
    return clamp(y), clamp(cb), clamp(cr)


def _block_zigzag(
    plane: list[list[int]], bx: int, by: int, quant: int
) -> list[int]:
    """Scalar reference: extract (edge-clamped) + FDCT + quantize +
    zigzag one 8×8 block."""
    h = len(plane)
    w = len(plane[0])
    block = [0.0] * 64
    for y in range(8):
        sy = min(by + y, h - 1)
        for x in range(8):
            block[y * 8 + x] = plane[sy][min(bx + x, w - 1)] - 128.0
    coef = _fdct(block)
    q = [int(round(c / quant)) for c in coef]
    return [q[ZIGZAG[i]] for i in range(64)]


def _batch_component_zigzag(
    plane: list[list[int]], hs: int, vs: int, mcux: int, mcuy: int,
    quant: int,
):
    """All of one component's blocks, MCU-major, through ONE batched
    fixed-order FDCT (the encode hot loop: _fdct was ~70% of scalar
    encode time).  Returns a list of 64-int zigzag lists in exactly
    the order the scalar MCU walk would emit them; byte-identical to
    :func:`_block_zigzag` because the batched transform replicates the
    scalar accumulation order (see _batched_fdct) and np.rint rounds
    half-even like Python round."""
    import numpy as np

    h = len(plane)
    w = len(plane[0])
    rows, cols = mcuy * vs * 8, mcux * hs * 8
    arr = np.asarray(plane, dtype=np.float64)
    # edge replication == the scalar path's min(y, h-1)/min(x, w-1)
    arr = np.pad(arr, ((0, rows - h), (0, cols - w)), mode="edge") - 128.0
    blocks = (
        arr.reshape(rows // 8, 8, cols // 8, 8)
        .transpose(0, 2, 1, 3)
        .reshape(-1, 8, 8)
    )  # raster block order: block_row-major
    # reorder raster → MCU-major: for my, mx, by, bx
    my, by_, mx, bx_ = np.meshgrid(
        np.arange(mcuy), np.arange(vs), np.arange(mcux), np.arange(hs),
        indexing="ij",
    )
    raster = (
        (my * vs + by_) * (mcux * hs) + (mx * hs + bx_)
    ).transpose(0, 2, 1, 3).reshape(-1)
    m = np.asarray(_M, dtype=np.float64)
    coef = _batched_fdct(blocks[raster], m).reshape(-1, 64)
    q = np.rint(coef / float(quant)).astype(np.int64)
    return q[:, ZIGZAG].tolist()


def _entropy_encode_block(
    zz: list[int], pred: int, writer: _BitWriter
) -> int:
    """Huffman/run-length code one zigzag block; returns new DC pred."""
    diff = zz[0] - pred
    s, bits = _magnitude(diff)
    code, length = _ENC_DC[s]
    writer.write(code, length)
    if s:
        writer.write(bits, s)
    run = 0
    last_nz = 0
    for i in range(63, 0, -1):
        if zz[i]:
            last_nz = i
            break
    for i in range(1, last_nz + 1):
        v = zz[i]
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, length = _ENC_AC[0xF0]  # ZRL
            writer.write(code, length)
            run -= 16
        s, bits = _magnitude(v)
        if s > 10:
            raise ValueError("coefficient category >10 (raise quant)")
        code, length = _ENC_AC[(run << 4) | s]
        writer.write(code, length)
        writer.write(bits, s)
        run = 0
    if last_nz < 63:
        code, length = _ENC_AC[0x00]  # EOB
        writer.write(code, length)
    return zz[0]


def encode_jpeg(
    width: int,
    height: int,
    pixel_fn,
    quant: int = 1,
    subsample: str = "444",
    grayscale: bool = False,
    restart_interval: int = 0,
) -> bytes:
    """Minimal baseline JPEG writer for fixtures/oracles.

    ``pixel_fn(x, y) -> (r, g, b)`` (or a single int when
    ``grayscale``); ``quant`` is a uniform quantizer (1 = the exact
    regime for flat-block images); ``subsample`` ``"444"`` or
    ``"420"`` (3-component streams only); ``restart_interval`` emits
    DRI + RSTn markers every N MCUs (decoder resync coverage).
    """
    if subsample not in ("444", "420"):
        raise ValueError("subsample must be '444' or '420'")
    if grayscale:
        yp = [
            [int(pixel_fn(x, y)) & 0xFF for x in range(width)]
            for y in range(height)
        ]
        planes = [yp]
        sampling = [(1, 1)]
    else:
        yp, cb, cr = (
            [[0] * width for _ in range(height)] for _ in range(3)
        )
        for y in range(height):
            for x in range(width):
                yv, cbv, crv = _rgb_to_ycbcr(*pixel_fn(x, y))
                yp[y][x], cb[y][x], cr[y][x] = yv, cbv, crv
        if subsample == "420":
            ch = (height + 1) // 2
            cw = (width + 1) // 2

            def _down(p):
                out = [[0] * cw for _ in range(ch)]
                for sy in range(ch):
                    for sx in range(cw):
                        acc = n = 0
                        for dy in range(2):
                            for dx in range(2):
                                py, px = sy * 2 + dy, sx * 2 + dx
                                if py < height and px < width:
                                    acc += p[py][px]
                                    n += 1
                        out[sy][sx] = (acc + n // 2) // n
                return out

            planes = [yp, _down(cb), _down(cr)]
            sampling = [(2, 2), (1, 1), (1, 1)]
        else:
            planes = [yp, cb, cr]
            sampling = [(1, 1), (1, 1), (1, 1)]

    out = bytearray(b"\xff\xd8")  # SOI
    qt = bytes([0]) + bytes(min(255, quant) for _ in range(64))
    out += b"\xff\xdb" + struct.pack(">H", len(qt) + 2) + qt  # DQT
    ncomp = len(planes)
    sof = bytearray([8]) + struct.pack(">HH", height, width) + bytes([ncomp])
    for i, (hs, vs) in enumerate(sampling):
        sof += bytes([i + 1, (hs << 4) | vs, 0])
    out += b"\xff\xc0" + struct.pack(">H", len(sof) + 2) + bytes(sof)
    out += _dht_segment(0, 0, _DC_SYMBOLS, 4)
    out += _dht_segment(1, 0, _AC_SYMBOLS, 8)
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    sos = bytearray([ncomp])
    for i in range(ncomp):
        sos += bytes([i + 1, 0x00])  # DC table 0, AC table 0
    sos += bytes([0, 63, 0])
    out += b"\xff\xda" + struct.pack(">H", len(sos) + 2) + bytes(sos)

    hmax = max(h for h, _ in sampling)
    vmax = max(v for _, v in sampling)
    mcux = (width + 8 * hmax - 1) // (8 * hmax)
    mcuy = (height + 8 * vmax - 1) // (8 * vmax)

    # Transform stage: every block of every component through the
    # batched fixed-order FDCT when numpy is available (MCU-major
    # queues), else the scalar reference per block in the walk below.
    queues: list | None
    try:
        queues = [
            _batch_component_zigzag(
                planes[ci], hs, vs, mcux, mcuy, quant
            )
            for ci, (hs, vs) in enumerate(sampling)
        ]
    except ImportError:
        queues = None
    qpos = [0] * ncomp

    writer = _BitWriter()
    preds = [0] * ncomp
    mcu_index = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_index and (
                mcu_index % restart_interval == 0
            ):
                writer.flush()
                writer.out += bytes(
                    [0xFF, 0xD0 + (mcu_index // restart_interval - 1) % 8]
                )
                preds = [0] * ncomp
            mcu_index += 1
            for ci, (hs, vs) in enumerate(sampling):
                for by in range(vs):
                    for bx in range(hs):
                        if queues is not None:
                            zz = queues[ci][qpos[ci]]
                            qpos[ci] += 1
                        else:
                            zz = _block_zigzag(
                                planes[ci],
                                (mx * hs + bx) * 8,
                                (my * vs + by) * 8,
                                quant,
                            )
                        preds[ci] = _entropy_encode_block(
                            zz, preds[ci], writer
                        )
    writer.flush()
    out += writer.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# ---------------------------------------------------------------------------
# Decoder
# ---------------------------------------------------------------------------


class _BitReader:
    """MSB-first bit reader over JPEG entropy data (0xFF00 stuffing).

    Buffers whole bytes into an accumulator so ``read_bits(n)`` is one
    shift/mask instead of n per-bit calls, and exposes a transactional
    ``peek``/``skip`` pair for the table-driven Huffman fast path —
    profiling showed per-bit reads were ~60% of decode time.
    """

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self._acc = 0
        self._n = 0

    def _refill(self, need: int) -> None:
        """Buffer bytes until ``need`` bits are available (all-or-
        nothing: state commits only on success, so a failed refill —
        e.g. a marker hit during a speculative peek — changes
        nothing)."""
        data = self.data
        end = len(data)
        pos = self.pos
        acc = self._acc & ((1 << self._n) - 1)  # trim stale high bits
        have = self._n
        while have < need:
            if pos >= end:
                raise ValueError("entropy data exhausted")
            byte = data[pos]
            pos += 1
            if byte == 0xFF:
                if pos >= end:
                    raise ValueError("dangling 0xFF in entropy data")
                if data[pos] == 0x00:
                    pos += 1  # stuffed byte
                else:
                    raise ValueError("marker inside entropy data")
            acc = (acc << 8) | byte
            have += 8
        self._acc, self._n, self.pos = acc, have, pos

    def read_bit(self) -> int:
        if self._n == 0:
            self._refill(1)
        self._n -= 1
        return (self._acc >> self._n) & 1

    def read_bits(self, n: int) -> int:
        if n == 0:
            return 0
        if self._n < n:
            self._refill(n)
        self._n -= n
        return (self._acc >> self._n) & ((1 << n) - 1)

    def peek_bits(self, n: int) -> tuple[int, int]:
        """(value, available): up to ``n`` buffered bits, left-aligned
        to ``n``, without consuming.  Short near stream end/markers."""
        if self._n < n:
            try:
                self._refill(n)
            except ValueError:
                pass  # use whatever is buffered; slow path handles EOF
        have = self._n if self._n < n else n
        v = (self._acc >> (self._n - have)) & ((1 << have) - 1)
        return v << (n - have), have

    def skip_bits(self, n: int) -> None:
        self._n -= n

    def align_to_marker(self) -> int:
        """Byte-align and consume one RSTn/other marker; returns it."""
        self._n = 0
        while self.pos + 1 < len(self.data):
            if self.data[self.pos] == 0xFF and self.data[self.pos + 1] != 0:
                marker = self.data[self.pos + 1]
                self.pos += 2
                return marker
            self.pos += 1
        raise ValueError("expected marker, hit end of stream")


#: (bits, vals) → built table.  MJPEG streams re-declare identical DHT
#: segments every frame — building tables was ~16% of frame decode.
_HUFF_CACHE: dict[tuple[bytes, bytes], dict] = {}


def _build_huffman(bits: list[int], vals: bytes) -> dict:
    """Canonical table: (length, code) → symbol, plus an 8-bit prefix
    LUT (symbol, length) for codes ≤ 8 bits — the JPEG-standard fast
    decode: one peek resolves the overwhelmingly common short codes,
    the canonical map handles the 9-16 bit tail.  A full 16-bit LUT
    (``lut16``, packed (sym << 5) | length, 0 = invalid) backs the
    table-driven scan kernel; both are cached per (bits, vals)."""
    key = (bytes(bits), bytes(vals))
    hit = _HUFF_CACHE.get(key)
    if hit is not None:
        return hit
    table: dict[tuple[int, int], int] = {}
    lut: list[tuple[int, int] | None] = [None] * 256
    lut16 = [0] * 65536
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = vals[k]
            if length <= 8:
                base = code << (8 - length)
                entry = (vals[k], length)
                for i in range(1 << (8 - length)):
                    lut[base + i] = entry
            base16 = code << (16 - length)
            span = 1 << (16 - length)
            lut16[base16 : base16 + span] = [
                (vals[k] << 5) | length
            ] * span
            code += 1
            k += 1
        code <<= 1
    built = {"map": table, "lut": lut, "lut16": lut16}
    if len(_HUFF_CACHE) >= 64:  # bound worker-lifetime growth
        _HUFF_CACHE.clear()
    _HUFF_CACHE[key] = built
    return built


def _huff_decode(reader: _BitReader, table: dict) -> int:
    v, have = reader.peek_bits(8)
    if have:
        hit = table["lut"][v]
        if hit is not None and hit[1] <= have:
            reader.skip_bits(hit[1])
            return hit[0]
    # slow path: codes longer than 8 bits, or a short buffer at the
    # end of the stream (the peek consumed nothing, so re-walk bitwise)
    tmap = table["map"]
    code = 0
    for length in range(1, 17):
        code = (code << 1) | reader.read_bit()
        sym = tmap.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid Huffman code")


def _decode_scan_python(
    payload, pos, comps, by_id, scan, htables, restart_interval,
    mcux, mcuy,
):
    """Reference scan kernel: the original _BitReader MCU walk."""
    reader = _BitReader(payload, pos)
    preds = {c["id"]: 0 for c in comps}
    pending: dict[int, list] = {c["id"]: [] for c in comps}
    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and (
                mcu_count % restart_interval == 0
            ):
                marker = reader.align_to_marker()
                if not 0xD0 <= marker <= 0xD7:
                    raise ValueError(f"expected RST, got 0x{marker:02X}")
                preds = {c["id"]: 0 for c in comps}
            for sc in scan:
                comp = by_id[sc["id"]]
                dc_t = htables[(0, sc["td"])]
                ac_t = htables[(1, sc["ta"])]
                for by in range(comp["v"]):
                    for bx in range(comp["h"]):
                        s = _huff_decode(reader, dc_t)
                        diff = _extend(reader.read_bits(s), s)
                        preds[comp["id"]] += diff
                        zz = [0] * 64
                        zz[0] = preds[comp["id"]]
                        k = 1
                        while k < 64:
                            sym = _huff_decode(reader, ac_t)
                            if sym == 0x00:  # EOB
                                break
                            run, size = sym >> 4, sym & 0x0F
                            if size == 0:
                                if run != 15:
                                    raise ValueError("bad AC symbol")
                                k += 16  # ZRL
                                continue
                            k += run
                            if k > 63:
                                raise ValueError("AC index overrun")
                            zz[k] = _extend(reader.read_bits(size), size)
                            k += 1
                        base_y = (my * comp["v"] + by) * 8
                        base_x = (mx * comp["h"] + bx) * 8
                        pending[comp["id"]].append((base_y, base_x, zz))
            mcu_count += 1
    return pending


def _entropy_segments(data: bytes, pos: int) -> list[bytes]:
    """Entropy stream → destuffed byte segments split at RST markers.

    Destuffing ONCE up front (bytes.replace, C speed) removes the
    0xFF-stuffing branch from the per-symbol hot loop entirely.
    """
    segs = []
    start = i = pos
    n = len(data)
    while True:
        j = data.find(b"\xff", i)
        if j < 0:
            segs.append(data[start:n])
            break
        if j + 1 >= n:  # lone trailing 0xFF: truncated stream
            segs.append(data[start:j])
            break
        nxt = data[j + 1]
        if nxt == 0x00:
            i = j + 2
            continue
        if 0xD0 <= nxt <= 0xD7:
            segs.append(data[start:j])
            start = i = j + 2
            continue
        segs.append(data[start:j])  # EOI or other marker ends the scan
        break
    return [s.replace(b"\xff\x00", b"\xff") for s in segs]


def _decode_scan_fast(
    payload, pos, comps, by_id, scan, htables, restart_interval,
    mcux, mcuy,
):
    """Table-driven scan kernel (VERDICT r7 item 2): destuffed
    segments + a 16-bit-peek Huffman LUT + inline bit accumulator —
    no per-bit method calls, no stuffing checks in the loop.  Output
    (positions + zigzag coefficient lists) is identical to
    :func:`_decode_scan_python`; equivalence is pinned across a
    fixture battery in tests/test_operators.py.
    """
    segs = _entropy_segments(payload, pos)
    plan = []
    for sc in scan:
        comp = by_id[sc["id"]]
        plan.append((
            sc["id"],
            comp["v"] * comp["h"],
            htables[(0, sc["td"])]["lut16"],
            htables[(1, sc["ta"])]["lut16"],
        ))
    out: dict[int, list] = {c["id"]: [] for c in comps}
    preds = {c["id"]: 0 for c in comps}
    seg = segs[0]
    end = len(seg)
    p = 0
    acc = 0
    nb = 0
    seg_i = 0
    for mcu in range(mcux * mcuy):
        if restart_interval and mcu and mcu % restart_interval == 0:
            seg_i += 1
            if seg_i >= len(segs):
                raise ValueError("expected RST, hit end of stream")
            seg = segs[seg_i]
            end = len(seg)
            p = 0
            acc = 0
            nb = 0
            preds = {c["id"]: 0 for c in comps}
        for cid, nblk, dc16, ac16 in plan:
            pred = preds[cid]
            olist = out[cid]
            for _ in range(nblk):
                # --- DC coefficient ---
                if nb < 27 and p < end:
                    acc &= (1 << nb) - 1
                    while nb < 27 and p < end:
                        acc = (acc << 8) | seg[p]
                        p += 1
                        nb += 8
                v16 = (
                    (acc >> (nb - 16)) & 0xFFFF
                    if nb >= 16
                    else (acc << (16 - nb)) & 0xFFFF
                )
                e = dc16[v16]
                ln = e & 31
                if e == 0 or ln > nb:
                    raise ValueError(
                        "entropy data exhausted"
                        if p >= end and nb < 16
                        else "invalid Huffman code"
                    )
                nb -= ln
                s = e >> 5
                if s:
                    if nb < s:
                        raise ValueError("entropy data exhausted")
                    nb -= s
                    bits = (acc >> nb) & ((1 << s) - 1)
                    pred += (
                        bits - (1 << s) + 1
                        if bits < (1 << (s - 1))
                        else bits
                    )
                zz = [0] * 64
                zz[0] = pred
                k = 1
                # --- AC run-length loop ---
                while k < 64:
                    if nb < 27 and p < end:
                        acc &= (1 << nb) - 1
                        while nb < 27 and p < end:
                            acc = (acc << 8) | seg[p]
                            p += 1
                            nb += 8
                    v16 = (
                        (acc >> (nb - 16)) & 0xFFFF
                        if nb >= 16
                        else (acc << (16 - nb)) & 0xFFFF
                    )
                    e = ac16[v16]
                    ln = e & 31
                    if e == 0 or ln > nb:
                        raise ValueError(
                            "entropy data exhausted"
                            if p >= end and nb < 16
                            else "invalid Huffman code"
                        )
                    nb -= ln
                    sym = e >> 5
                    if sym == 0:  # EOB
                        break
                    size = sym & 0x0F
                    if size == 0:
                        if sym != 0xF0:
                            raise ValueError("bad AC symbol")
                        k += 16  # ZRL
                        continue
                    k += sym >> 4
                    if k > 63:
                        raise ValueError("AC index overrun")
                    if nb < size:
                        raise ValueError("entropy data exhausted")
                    nb -= size
                    bits = (acc >> nb) & ((1 << size) - 1)
                    zz[k] = (
                        bits - (1 << size) + 1
                        if bits < (1 << (size - 1))
                        else bits
                    )
                    k += 1
                olist.append(zz)
            preds[cid] = pred
    # Attach block positions: decode order per component is MCU-major
    # (my, mx, by, bx), so position is a pure function of the index.
    pending: dict[int, list] = {}
    for c in comps:
        v, hs = c["v"], c["h"]
        per = v * hs
        blocks = []
        for i, zz in enumerate(out[c["id"]]):
            mno, r = divmod(i, per)
            byy, bxx = divmod(r, hs)
            my, mx = divmod(mno, mcux)
            blocks.append(
                ((my * v + byy) * 8, (mx * hs + bxx) * 8, zz)
            )
        pending[c["id"]] = blocks
    return pending


_SCAN_KERNELS = {"python": _decode_scan_python, "fast": _decode_scan_fast}
_scan_kernel_name = "fast"


def set_scan_kernel(name: str) -> None:
    """Select the entropy-decode scan kernel ('fast' default,
    'python' reference)."""
    global _scan_kernel_name
    if name not in _SCAN_KERNELS:
        raise ValueError(f"unknown scan kernel {name!r}")
    _scan_kernel_name = name


def _decode_planes(payload: bytes):
    """Entropy-decode a baseline JPEG to its component planes.

    Returns ``(w, h, comps, hmax, vmax)`` where each comp dict holds
    its decoded ``plane`` (bytearray, ``cols``-wide rows at component
    resolution) and sampling factors.  Shared by the stats decode and
    the perceptual-hash grid pooling.
    """
    if len(payload) < 4 or payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload (missing SOI)")
    pos = 2
    n = len(payload)
    qtables: dict[int, list[int]] = {}
    htables: dict[tuple[int, int], dict] = {}
    frame = None
    restart_interval = 0
    scan = None
    while pos + 4 <= n:
        if payload[pos] != 0xFF:
            raise ValueError(f"bad marker alignment at {pos}")
        marker = payload[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            break
        if 0xD0 <= marker <= 0xD7:  # stray RST
            continue
        (seglen,) = struct.unpack_from(">H", payload, pos)
        seg = payload[pos + 2 : pos + seglen]
        if marker == 0xDB:  # DQT
            off = 0
            while off < len(seg):
                pq, tq = seg[off] >> 4, seg[off] & 0x0F
                off += 1
                if pq == 0:
                    vals = list(seg[off : off + 64])
                    off += 64
                else:
                    vals = [
                        struct.unpack_from(">H", seg, off + 2 * i)[0]
                        for i in range(64)
                    ]
                    off += 128
                qtables[tq] = vals
        elif marker in (0xC0, 0xC1):  # SOF0/1 baseline(+extended) DCT
            precision = seg[0]
            if precision != 8:
                raise ValueError(f"unsupported precision {precision}")
            h, w = struct.unpack_from(">HH", seg, 1)
            ncomp = seg[5]
            comps = []
            for i in range(ncomp):
                cid, hv, tq = seg[6 + 3 * i : 9 + 3 * i]
                comps.append(
                    {"id": cid, "h": hv >> 4, "v": hv & 0x0F, "tq": tq}
                )
            frame = {"w": w, "h": h, "comps": comps}
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise ValueError(
                f"unsupported JPEG process (SOF marker 0x{marker:02X})"
            )
        elif marker == 0xC4:  # DHT
            off = 0
            while off < len(seg):
                tc, th = seg[off] >> 4, seg[off] & 0x0F
                bits = list(seg[off + 1 : off + 17])
                cnt = sum(bits)
                vals = seg[off + 17 : off + 17 + cnt]
                htables[(tc, th)] = _build_huffman(bits, vals)
                off += 17 + cnt
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack_from(">H", seg, 0)
        elif marker == 0xDA:  # SOS
            ns = seg[0]
            scan = []
            for i in range(ns):
                cid, tt = seg[1 + 2 * i : 3 + 2 * i]
                scan.append({"id": cid, "td": tt >> 4, "ta": tt & 0x0F})
            pos += seglen
            break
        # APPn / COM / others: skip
        pos += seglen
    if frame is None or scan is None:
        raise ValueError("missing SOF/SOS")

    comps = frame["comps"]
    by_id = {c["id"]: c for c in comps}
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    w, h = frame["w"], frame["h"]
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    for c in comps:
        c["cols"] = mcux * c["h"] * 8
        c["rows"] = mcuy * c["v"] * 8
        c["plane"] = bytearray(c["cols"] * c["rows"])
        if c["tq"] not in qtables:
            raise ValueError(f"missing quant table {c['tq']}")
    for sc in scan:
        if (0, sc["td"]) not in htables or (1, sc["ta"]) not in htables:
            raise ValueError("missing Huffman table for scan")

    # Entropy decoding is inherently serial (DC prediction + bit
    # stream), but the IDCT is not: the scan kernel buffers every
    # block's (position, coefficients) and batches them through the
    # selected IDCT kernel per component — one vectorized fixed-order
    # transform for the whole scan.
    kernel = _SCAN_KERNELS[_scan_kernel_name]
    pending = kernel(
        payload, pos, comps, by_id, scan, htables,
        restart_interval, mcux, mcuy,
    )
    for c in comps:
        if pending[c["id"]]:
            _idct_place(
                c["plane"], c["cols"], pending[c["id"]], qtables[c["tq"]]
            )
    return w, h, comps, hmax, vmax


def decode_jpeg(payload: bytes) -> dict:
    """Baseline JPEG → dimensions + exact per-channel sums.

    Returns the BMP/PNG stats contract: ``{width, height, sum_r,
    sum_g, sum_b}`` (grayscale streams report the gray sum in all
    three channels).  Raises ``ValueError`` on anything outside
    baseline sequential 8-bit — the Arrow kernel dead-letters.
    """
    w, h, comps, hmax, vmax = _decode_planes(payload)
    sum_r = sum_g = sum_b = 0
    try:
        import numpy as np
    except ImportError:
        np = None
    if len(comps) == 1:
        c = comps[0]
        cols = c["cols"]
        plane = c["plane"]
        if np is not None:
            arr = np.frombuffer(plane, dtype=np.uint8)
            rows = (np.arange(h, dtype=np.int64) * cols)[:, None]
            sum_r = int(
                arr[rows + np.arange(w, dtype=np.int64)[None, :]]
                .astype(np.int64)
                .sum()
            )
        else:
            for y in range(h):
                row = y * cols
                sum_r += sum(plane[row : row + w])
        sum_g = sum_b = sum_r
    elif len(comps) == 3:
        cy, ccb, ccr = comps
        if np is not None:
            # Vectorized upsample+transform: elementwise IEEE ops in
            # the same expression structure as the scalar path, and
            # np.rint rounds half-even like Python round → identical
            # per-pixel values, just batched.
            ax = np.arange(w, dtype=np.int64)
            ay = np.arange(h, dtype=np.int64)

            def samp(c):
                a = np.frombuffer(c["plane"], dtype=np.uint8)
                rows = (ay * c["v"] // vmax) * c["cols"]
                xs = ax * c["h"] // hmax
                return a[rows[:, None] + xs[None, :]].astype(np.float64)

            lum, cb, cr = samp(cy), samp(ccb), samp(ccr)
            r = lum + 1.402 * (cr - 128.0)
            g = lum - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
            b = lum + 1.772 * (cb - 128.0)
            clipsum = lambda m: int(  # noqa: E731
                np.clip(np.rint(m), 0.0, 255.0).astype(np.int64).sum()
            )
            sum_r, sum_g, sum_b = clipsum(r), clipsum(g), clipsum(b)
        else:
            for y in range(h):
                yy = {
                    id(c): (y * c["v"] // vmax) * c["cols"] for c in comps
                }
                for x in range(w):
                    lum = cy["plane"][yy[id(cy)] + (x * cy["h"] // hmax)]
                    cb = ccb["plane"][yy[id(ccb)] + (x * ccb["h"] // hmax)]
                    cr = ccr["plane"][yy[id(ccr)] + (x * ccr["h"] // hmax)]
                    r = lum + 1.402 * (cr - 128)
                    g = (
                        lum - 0.344136 * (cb - 128) - 0.714136 * (cr - 128)
                    )
                    b = lum + 1.772 * (cb - 128)
                    sum_r += min(255, max(0, int(round(r))))
                    sum_g += min(255, max(0, int(round(g))))
                    sum_b += min(255, max(0, int(round(b))))
    else:
        raise ValueError(f"unsupported component count {len(comps)}")
    return {
        "width": w,
        "height": h,
        "sum_r": sum_r,
        "sum_g": sum_g,
        "sum_b": sum_b,
    }

def decode_jpeg_gray_grid(payload: bytes, grid: int = 8) -> list[int]:
    """Baseline JPEG → ``grid²`` pooled LUMA cell sums (row-major).

    The perceptual-hash input (``operators/imagehash.py`` /
    ``operators/video.py``): luma is sampled at image resolution and
    summed per grid cell — integer, so flat-block fixtures stay
    analytic.  Requires dimensions divisible by ``grid``.
    """
    w, h, comps, hmax, vmax = _decode_planes(payload)
    if w % grid or h % grid:
        raise ValueError("dimensions not divisible by hash grid")
    luma = comps[0]
    plane, cols = luma["plane"], luma["cols"]
    ch, cv = luma["h"], luma["v"]
    try:
        import numpy as np
    except ImportError:
        cells = [0] * (grid * grid)
        for y in range(h):
            row = (y * cv // vmax) * cols
            gy = y * grid // h
            for x in range(w):
                cells[gy * grid + x * grid // w] += plane[
                    row + (x * ch // hmax)
                ]
        return cells
    arr = np.frombuffer(plane, dtype=np.uint8)
    ay = np.arange(h, dtype=np.int64)
    ax = np.arange(w, dtype=np.int64)
    rows = (ay * cv // vmax) * cols
    xs = ax * ch // hmax
    sampled = arr[rows[:, None] + xs[None, :]].astype(np.int64)
    gy = ay * grid // h
    gx = ax * grid // w
    idx = (gy[:, None] * grid + gx[None, :]).ravel()
    # integer cell sums fit float64 exactly (≤ 255·w·h < 2^53)
    cells = np.bincount(
        idx, weights=sampled.ravel(), minlength=grid * grid
    )
    return [int(v) for v in cells]
