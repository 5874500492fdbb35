"""Audio modality: REAL WAV (RIFF / PCM16) codec, numpy-only.

De-stubs the audio leg of the multimodal family (reference treats
media as opaque payload + typed metadata; see
``functions/multimodal.py`` for the image leg and the remaining
honest stubs). WAV/PCM needs no external library — the RIFF container
is fixed-offset chunks and the payload is a raw little-endian int16
raster — so encode AND decode genuinely execute here, Arrow-batched
in ``mapInPandas`` with zero shuffle.

Correctness: the synthetic corpus is a closed-form integer sample
sequence per document, so the DuckDB oracle recomputes every feature
(sample count, amplitude sum, max |s|, zero crossings, post-resample
length) arithmetically — any byte-level bug in the chunk layout,
sample width, or channel math breaks the value hash. All features are
exact integers: no float-rounding hazard in the hash compare.

Scale: payload bytes never shuffle; the decode → feature map is
embarrassingly parallel and memory is bounded by the Arrow batch size
(`spark.sql.execution.arrow.maxRecordsPerBatch`). At 100 TB the media
table partitions by (kind, date) and this stage is a pure map over
the scan — the same shape as petabyte ASR preprocessing.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession

from ..catalog import parallelize, table

# Closed-form corpus parameters — mirrored verbatim in the oracle SQL.
_N_BASE, _N_MOD = 64, 64  # n_samples = 64 + doc_id % 64  (<= 127)
_RATE_BASE = 8000  # sample_rate = 8000 * (1 + doc_id % 3)
_AMP_MOD, _AMP_OFF = 2003, 1001  # s(i) = (doc_id*131 + i*31) % 2003 - 1001


def _synth_samples(doc_id: int) -> tuple[int, np.ndarray]:
    n = _N_BASE + doc_id % _N_MOD
    rate = _RATE_BASE * (1 + doc_id % 3)
    i = np.arange(n, dtype=np.int64)
    s = ((doc_id * 131 + i * 31) % _AMP_MOD - _AMP_OFF).astype(np.int16)
    return rate, s


def encode_wav(samples: np.ndarray, rate: int) -> bytes:
    """Canonical RIFF/WAVE container: 'RIFF' size 'WAVE', a 16-byte
    'fmt ' chunk (PCM, mono, 16-bit), then the 'data' chunk holding
    the little-endian int16 payload."""
    payload = samples.astype("<i2").tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, rate, rate * 2, 2, 16)
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(payload)) + payload
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(payload: bytes) -> tuple[int, np.ndarray]:
    """REAL decoder: walks the RIFF chunk list (not fixed offsets —
    tolerates extra chunks before 'data'), validates PCM16 mono, and
    returns (sample_rate, int16 samples)."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, rate, samples = 12, None, None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        (size,) = struct.unpack_from("<I", payload, pos + 4)
        body = payload[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            audio_fmt, channels, rate, _, _, bits = struct.unpack_from(
                "<HHIIHH", body
            )
            if (audio_fmt, channels, bits) != (1, 1, 16):
                raise ValueError("only PCM16 mono supported")
        elif cid == b"data":
            samples = np.frombuffer(body, dtype="<i2")
        pos += 8 + size + (size & 1)  # RIFF chunks are word-aligned
    if rate is None or samples is None:
        raise ValueError("missing fmt/data chunk")
    return rate, samples


AUDIO_SCHEMA = "media_id bigint, data binary"
AUDIO_FEATURES_SCHEMA = (
    "media_id bigint, sample_rate bigint, n_samples bigint, "
    "sum_amp bigint, max_abs bigint, zero_cross bigint, n_resampled bigint"
)


def synth_audio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One deterministic PCM16 WAV per document, encoded through the
    real RIFF writer inside Arrow batches (write-side twin of decode)."""
    # bytes-capped fan-out (r15, guide §2): this path is TWO chained
    # mapInPandas stages (encode → decode/features) whose per-row work
    # is a few µs on fixture-sized payloads, so 32 near-empty Python
    # tasks × 2 boundary crossings are pure overhead (A/B: warm wall
    # 3.9 s → 1.6 s at sf0.1). At real media scale the natural file
    # splits exceed the cap and per-row decode cost dominates anyway.
    docs = parallelize(
        table(spark, sf_dir, "documents"), spark, bytes_per_split=2 << 20
    ).select("doc_id")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, blobs = [], []
            for doc_id in pdf["doc_id"]:
                doc_id = int(doc_id)
                rate, s = _synth_samples(doc_id)
                ids.append(doc_id)
                blobs.append(encode_wav(s, rate))
            yield pd.DataFrame({"media_id": ids, "data": blobs})

    return docs.mapInPandas(run, AUDIO_SCHEMA)


def audio_features(media: DataFrame) -> DataFrame:
    """Decode each WAV payload and emit integer-exact features, plus a
    decimate-by-2 re-encode/re-decode round trip (the resample path:
    payload in → smaller payload out → decoded again)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, blob in zip(pdf["media_id"], pdf["data"]):
                rate, s = decode_wav(bytes(blob))
                s64 = s.astype(np.int64)
                nonneg = s64 >= 0
                zc = int(np.count_nonzero(nonneg[1:] != nonneg[:-1]))
                half_rate, half = decode_wav(encode_wav(s[::2], rate // 2))
                assert half_rate == rate // 2
                rows.append(
                    (
                        int(mid),
                        rate,
                        s.size,
                        int(s64.sum()),
                        int(np.abs(s64).max()) if s.size else 0,
                        zc,
                        int(half.size),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id",
                    "sample_rate",
                    "n_samples",
                    "sum_amp",
                    "max_abs",
                    "zero_cross",
                    "n_resampled",
                ],
            )

    return media.mapInPandas(run, AUDIO_FEATURES_SCHEMA)


def q_audio_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end REAL audio codec: encode a deterministic PCM16 WAV
    per document, parse the actual RIFF bytes back (chunk walk, fmt
    validation, int16 raster), compute integer-exact signal features
    (amplitude sum, max |s|, zero-crossing count), then decimate-by-2
    and round-trip through the encoder again. The DuckDB oracle
    recomputes everything from the closed-form sample sequence — a
    one-byte container bug breaks the hash. Zero shuffle; the whole
    plan is scan → mapInPandas → mapInPandas."""
    return audio_features(synth_audio(spark, sf_dir))


ORACLE: dict[str, str] = {
    "q_audio_features": """
        -- recompute the features from the SAME closed-form sequence
        -- the engine encodes into real RIFF/PCM16 bytes and decodes
        -- back: n = 64 + doc_id%64, rate = 8000*(1+doc_id%3),
        -- s(i) = (doc_id*131 + i*31) % 2003 - 1001
        WITH params AS (
          SELECT doc_id, 64 + doc_id % 64 AS n,
                 8000 * (1 + doc_id % 3) AS rate
          FROM documents
        ), samp AS (
          SELECT p.doc_id, p.n, p.rate, i.i,
                 (p.doc_id * 131 + i.i * 31) % 2003 - 1001 AS s
          FROM params p CROSS JOIN range(128) i(i)
          WHERE i.i < p.n
        ), lagged AS (
          SELECT *, lag(s) OVER (PARTITION BY doc_id ORDER BY i) AS prev
          FROM samp
        )
        SELECT doc_id AS media_id,
               CAST(rate AS BIGINT) AS sample_rate,
               CAST(n AS BIGINT) AS n_samples,
               CAST(sum(s) AS BIGINT) AS sum_amp,
               CAST(max(abs(s)) AS BIGINT) AS max_abs,
               CAST(sum(CASE WHEN prev IS NOT NULL
                              AND (s >= 0) <> (prev >= 0)
                             THEN 1 ELSE 0 END) AS BIGINT) AS zero_cross,
               CAST((n + 1) // 2 AS BIGINT) AS n_resampled
        FROM lagged
        GROUP BY doc_id, n, rate
    """,
}
