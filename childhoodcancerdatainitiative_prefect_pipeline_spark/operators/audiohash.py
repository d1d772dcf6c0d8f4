"""Perceptual AUDIO hashing + near-dup pairs (LLM-data op).

The audio twin of ``operators/imagehash.py``: a training corpus
dedups recordings the same way it dedups images — a compact
fingerprint over coarse signal structure, banded LSH candidates, a
Hamming verify.  Here the fingerprint is an energy-profile hash:

- :func:`wav_energy_grid` — PCM16 WAV → 64 window |sample| sums
  (integer, channel-summed) over the largest 64-divisible prefix;
- the hash/banding/verify machinery is REUSED from imagehash
  (``ahash_bits`` + ``ahash_near_dup_pairs``): a 64-cell integer
  grid is a 64-cell integer grid, whatever the modality — bit i =
  window i louder than the mean, 8×8-bit bands, pigeonhole-complete
  at Hamming ≤ 7.

Everything is integer arithmetic over decoded samples, so the
certified entry's oracle recomputes windows, bits, bands and
distances exactly in SQL.  Robustness notes (documented, not
oversold): the energy profile survives re-encoding and small gain
riding the mean, but NOT time-shifts — it is a dedup fingerprint
for near-identical copies (the corpus case), not content ID.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

from .imagehash import ahash_bits
from .multimodal import decode_wav


def wav_energy_grid(payload: bytes, windows: int = 64) -> list[int]:
    """PCM16 WAV → per-window |sample| sums (channels folded in).

    Uses the largest prefix divisible by ``windows`` so every window
    covers the same frame count; raises on malformed payloads or
    signals shorter than one frame per window (dead-letter).
    """
    import struct as _struct

    meta = decode_wav(payload)  # validates structure, raises on junk
    n_channels = meta["n_channels"]
    # re-walk the data chunk for raw samples (decode_wav returns sums)
    pos, n = 12, len(payload)
    data = None
    while pos + 8 <= n:
        cid = payload[pos : pos + 4]
        (clen,) = _struct.unpack_from("<I", payload, pos + 4)
        if cid == b"data":
            data = payload[pos + 8 : pos + 8 + clen]
            break
        pos += 8 + clen + (clen & 1)
    assert data is not None  # decode_wav already validated
    n_frames = len(data) // (2 * n_channels)
    per = n_frames // windows
    if per == 0:
        raise ValueError("signal shorter than one frame per window")
    cells = [0] * windows
    it = _struct.iter_unpack("<h", data[: per * windows * 2 * n_channels])
    for idx, (v,) in enumerate(it):
        cells[idx // (per * n_channels)] += v if v >= 0 else -v
    return cells


AUDIO_HASH_SCHEMA = (
    "media_id long, h1 long, h2 long, decode_error string"
)


def audio_ahash(
    media: DataFrame, id_col: str = "media_id", windows: int = 64
) -> DataFrame:
    """Arrow-batched WAV → energy-profile hash kernel; same
    (media_id, h1, h2) contract as ``image_ahash``, so
    ``ahash_near_dup_pairs`` consumes either."""
    cols = [id_col, "h1", "h2", "decode_error"]

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf[id_col], pdf["payload"]):
                try:
                    h1, h2 = ahash_bits(
                        wav_energy_grid(bytes(payload), windows)
                    )
                    rows.append((int(mid), h1, h2, None))
                except Exception as ex:  # noqa: BLE001
                    rows.append(
                        (int(mid), None, None, f"{type(ex).__name__}: {ex}")
                    )
            yield pd.DataFrame(rows, columns=cols)

    return media.select(id_col, "payload").mapInPandas(
        kernel, AUDIO_HASH_SCHEMA
    )
