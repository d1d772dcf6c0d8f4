"""BAM statistics extraction — the reference's ``pysam.stats`` twin.

Reference: src/sra_metadata.py:30-90 (``get_bam_stats``): pysam runs
``samtools stats`` / ``samtools coverage`` per BAM and the flow greps
``raw total sequences`` / ``total length`` / ``average length`` plus a
mean coverage out of the text reports.  This module computes the same
four statistics from the BAM *bytes* with the stdlib alone:

- **BGZF layer** (:func:`bgzf_blocks`): a BAM is a series of gzip
  members with an extra ``BC`` subfield carrying the compressed block
  size; each block is raw-DEFLATE inflated and validated against its
  CRC32 + ISIZE footer.  Malformed blocks raise ``ValueError`` — the
  Arrow kernel dead-letters them, same contract as the image decoders
  (``operators/multimodal.py``).
- **BAM layer** (:func:`decode_bam_stats`): ``BAM\\1`` magic, header
  text, reference dictionary, then fixed-layout alignment records
  (SAM spec §4.2); per record we read ``flag``, ``l_seq`` and the
  CIGAR ops and accumulate counts/bases (sequence/qual/tags are
  skipped by offset, so the parse is O(records), not O(bytes)).

Outputs stay integral (milli-units for the two ratios) so the stats
are hash-certifiable: ``avg_read_len_milli = 1000·bases div reads``
and ``coverage_milli = 1000·mapped_bases div total_ref_len`` — the
latter matches ``samtools coverage``'s meandepth definition: mapped
bases are the CIGAR reference-aligned op lengths (M/=/X/D), so
soft-clipped or inserted read bases do not inflate coverage.

Scale: one BAM payload per row, parsed inside ``mapInPandas`` — a
manifest of 100k BAMs fans out across executors with constant memory
per task; the cluster never ships more than the stats frame back.
:func:`encode_bam`/:func:`encode_bgzf` exist for fixtures and the
analytic oracle (same pattern as ``encode_bmp``/``encode_png``).
"""

from __future__ import annotations

import struct
import zlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

_BGZF_EOF = bytes.fromhex(
    "1f8b08040000000000ff0600424302001b0003000000000000000000"
)

BAM_STATS_SCHEMA = (
    "file_id long, n_reads long, n_mapped long, n_duplicates long, "
    "total_bases long, avg_read_len_milli long, total_ref_len long, "
    "coverage_milli long, decode_error string"
)


# ---------------------------------------------------------------------------
# BGZF (blocked gzip) layer
# ---------------------------------------------------------------------------


def encode_bgzf(data: bytes, block_size: int = 65280) -> bytes:
    """Compress ``data`` into BGZF blocks + the standard EOF block."""
    out = bytearray()
    for off in range(0, len(data), block_size) or (0,):
        chunk = data[off : off + block_size]
        comp = zlib.compress(chunk, 6)[2:-4]  # raw deflate
        bsize = 12 + 6 + len(comp) + 8  # header+extra+payload+footer
        out += struct.pack(
            "<4BIBBHBBHH",
            0x1F, 0x8B, 0x08, 0x04,  # magic + FLG.FEXTRA
            0, 0, 0xFF,  # mtime, XFL, OS
            6,  # XLEN
            0x42, 0x43, 2,  # 'B' 'C', SLEN
            bsize - 1,
        )
        out += comp
        out += struct.pack("<II", zlib.crc32(chunk) & 0xFFFFFFFF, len(chunk))
    return bytes(out) + _BGZF_EOF


def bgzf_blocks(payload: bytes) -> Iterator[bytes]:
    """Walk BGZF blocks, yielding each inflated block (CRC-checked).

    Raises ``ValueError`` on any structural damage: bad gzip magic,
    missing ``BC`` subfield, truncation, CRC or length mismatch.
    """
    pos = 0
    n = len(payload)
    while pos < n:
        if pos + 18 > n:
            raise ValueError("truncated BGZF block header")
        magic, _mtime, _xfl, _os, xlen = struct.unpack_from(
            "<IIBBH", payload, pos
        )
        if magic & 0xFFFFFF != 0x088B1F or not (magic >> 24) & 0x04:
            raise ValueError("not a BGZF block (bad gzip magic/FEXTRA)")
        extra = payload[pos + 12 : pos + 12 + xlen]
        if len(extra) != xlen:
            raise ValueError("truncated BGZF extra field")
        bsize = None
        epos = 0
        while epos + 4 <= len(extra):
            si1, si2, slen = struct.unpack_from("<BBH", extra, epos)
            if si1 == 0x42 and si2 == 0x43 and slen == 2:
                bsize = struct.unpack_from("<H", extra, epos + 4)[0] + 1
            epos += 4 + slen
        if bsize is None:
            raise ValueError("BGZF block missing BC subfield")
        if pos + bsize > n:
            raise ValueError("truncated BGZF block body")
        comp = payload[pos + 12 + xlen : pos + bsize - 8]
        crc, isize = struct.unpack_from("<II", payload, pos + bsize - 8)
        raw = zlib.decompress(comp, wbits=-15)
        if len(raw) != isize or zlib.crc32(raw) & 0xFFFFFFFF != crc:
            raise ValueError("BGZF block CRC/length mismatch")
        if raw:
            yield raw
        pos += bsize


# ---------------------------------------------------------------------------
# BAM record layer
# ---------------------------------------------------------------------------

_SEQ_CODE = "=ACMGRSVTWYHKDBN"
_CIGAR_OPS = "MIDNSHP=X"


def encode_bam(
    refs: list[tuple[str, int]],
    reads: list[dict],
    header_text: str = "@HD\tVN:1.6\n",
) -> bytes:
    """Minimal BAM writer for fixtures/oracles.

    Each read dict: ``name`` (str), ``seq`` (str over ACGTN...),
    optional ``flag`` (int, default 0), ``ref_id``/``pos``/``mapq``,
    optional ``cigar`` as ``[(op_char, length), ...]`` — defaults to
    one all-M op over the full sequence.
    """
    body = bytearray(b"BAM\x01")
    text = header_text.encode()
    body += struct.pack("<I", len(text)) + text
    body += struct.pack("<I", len(refs))
    for name, length in refs:
        nb = name.encode() + b"\x00"
        body += struct.pack("<I", len(nb)) + nb + struct.pack("<I", length)
    for r in reads:
        name = r["name"].encode() + b"\x00"
        seq = r["seq"]
        l_seq = len(seq)
        packed = bytearray()
        for i in range(0, l_seq, 2):
            hi = _SEQ_CODE.index(seq[i])
            lo = _SEQ_CODE.index(seq[i + 1]) if i + 1 < l_seq else 0
            packed.append((hi << 4) | lo)
        ops = r.get("cigar") or [("M", l_seq)]
        cigar = b"".join(
            struct.pack("<I", (length << 4) | _CIGAR_OPS.index(op))
            for op, length in ops
        )
        rec = struct.pack(
            "<iiBBHHHiiii",
            r.get("ref_id", 0),
            r.get("pos", 0),
            len(name),
            r.get("mapq", 60),
            0,  # bin
            len(ops),  # n_cigar_op
            r.get("flag", 0),
            l_seq,
            -1,  # next_refID
            -1,  # next_pos
            0,  # tlen
        )
        rec += name + cigar + bytes(packed) + b"\xff" * l_seq
        body += struct.pack("<I", len(rec)) + rec
    return encode_bgzf(bytes(body))


def decode_bam_stats(payload: bytes) -> dict:
    """samtools-stats-shaped summary from raw BAM bytes.

    Returns reads / mapped / duplicates / total bases / milli-unit
    average read length and mean coverage (mapped bases over total
    reference length).  Raises ``ValueError`` on corruption at either
    layer — the kernel dead-letters.
    """
    data = b"".join(bgzf_blocks(payload))
    if data[:4] != b"BAM\x01":
        raise ValueError("not a BAM payload (bad magic)")
    (l_text,) = struct.unpack_from("<I", data, 4)
    pos = 8 + l_text
    (n_ref,) = struct.unpack_from("<I", data, pos)
    pos += 4
    total_ref_len = 0
    for _ in range(n_ref):
        (l_name,) = struct.unpack_from("<I", data, pos)
        (l_ref,) = struct.unpack_from("<I", data, pos + 4 + l_name)
        total_ref_len += l_ref
        pos += 8 + l_name
    n_reads = n_mapped = n_dup = 0
    total_bases = mapped_bases = 0
    n = len(data)
    while pos < n:
        if pos + 4 > n:
            raise ValueError("truncated BAM record length")
        (block_size,) = struct.unpack_from("<I", data, pos)
        if pos + 4 + block_size > n or block_size < 32:
            raise ValueError("truncated/garbled BAM record")
        l_read_name, _mapq = struct.unpack_from("<BB", data, pos + 4 + 8)
        (n_cigar_op,) = struct.unpack_from("<H", data, pos + 4 + 12)
        flag, l_seq = struct.unpack_from("<HI", data, pos + 4 + 14)
        n_reads += 1
        total_bases += l_seq
        if not flag & 0x4:  # mapped
            n_mapped += 1
            # samtools-coverage meandepth counts CIGAR reference-aligned
            # bases (ops M/=/X/D), not l_seq — soft-clips and insertions
            # consume the read but not the reference.
            cig_off = pos + 4 + 32 + l_read_name
            if cig_off + 4 * n_cigar_op > pos + 4 + block_size:
                raise ValueError("CIGAR overruns BAM record")
            for k in range(n_cigar_op):
                (val,) = struct.unpack_from("<I", data, cig_off + 4 * k)
                op = val & 0xF
                if op in (0, 2, 7, 8):  # M, D, =, X consume reference
                    mapped_bases += val >> 4
        if flag & 0x400:
            n_dup += 1
        pos += 4 + block_size
    return {
        "n_reads": n_reads,
        "n_mapped": n_mapped,
        "n_duplicates": n_dup,
        "total_bases": total_bases,
        "avg_read_len_milli": (
            total_bases * 1000 // n_reads if n_reads else 0
        ),
        "total_ref_len": total_ref_len,
        "coverage_milli": (
            mapped_bases * 1000 // total_ref_len if total_ref_len else 0
        ),
    }


def bam_stats(media: DataFrame, id_col: str = "file_id") -> DataFrame:
    """Arrow-batched BAM stats: one input row per BAM payload, one
    output row per file; malformed payloads dead-letter into
    ``decode_error`` instead of failing the stage."""

    cols = [
        id_col, "n_reads", "n_mapped", "n_duplicates", "total_bases",
        "avg_read_len_milli", "total_ref_len", "coverage_milli",
        "decode_error",
    ]

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for fid, payload in zip(pdf[id_col], pdf["payload"]):
                try:
                    d = decode_bam_stats(bytes(payload))
                    rows.append(
                        (int(fid), d["n_reads"], d["n_mapped"],
                         d["n_duplicates"], d["total_bases"],
                         d["avg_read_len_milli"], d["total_ref_len"],
                         d["coverage_milli"], None)
                    )
                except Exception as ex:  # noqa: BLE001
                    rows.append(
                        (int(fid),) + (None,) * 7
                        + (f"{type(ex).__name__}: {ex}",)
                    )
            yield pd.DataFrame(rows, columns=cols)

    return media.select(id_col, "payload").mapInPandas(
        kernel, BAM_STATS_SCHEMA
    )
