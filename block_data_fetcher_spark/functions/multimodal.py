"""Multimodal columns for LLM-data pipelines (north star).

Design: image/audio/video payloads are opaque ``binary`` columns with a
typed metadata struct riding alongside — the Spark-native shape for
petabyte media corpora (payload bytes stay columnar/compressed in
parquet; metadata predicates prune row-groups without touching bytes).

Heavy per-item work (decode, resize, feature extraction, frame
sampling) runs as Arrow-batched ``mapInPandas`` — the ONLY sanctioned
Python hot path in this engine (SURVEY §2.8 policy): vectorized
transfer, bounded batches, no row-at-a-time pickling. The actual codec
calls are STUBBED deterministically (no PIL/ffmpeg in this container,
and none may be installed); the stubs are clearly marked and the
surrounding plumbing — schema, batch iteration, partition behavior —
is real and tested.

Scale: mapInPandas streams Arrow batches; memory is bounded by
``spark.sql.execution.arrow.maxRecordsPerBatch``. Media tables
partition by (kind, date); feature extraction is embarrassingly
parallel — zero shuffle.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import parallelize, table

MEDIA_SCHEMA = (
    "media_id bigint, kind string, data binary, "
    "meta struct<format:string, n_bytes:bigint, tag:string>"
)

FEATURE_SCHEMA = (
    "media_id bigint, kind string, n_bytes bigint, checksum bigint, "
    "feat array<double>"
)

_KINDS = ["image", "audio", "video"]


def synth_media(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic media table derived from ``documents``: payload =
    utf-8 bytes of the text (a stand-in for real image/audio bytes),
    kind = doc_id % 3. Exercises the real binary-column plumbing."""
    docs = parallelize(table(spark, sf_dir, "documents"), spark)
    kind = F.element_at(
        F.array(*[F.lit(k) for k in _KINDS]), (F.col("doc_id") % 3 + 1).cast("int")
    )
    data = F.encode("text", "utf-8")
    return docs.select(
        F.col("doc_id").alias("media_id"),
        kind.alias("kind"),
        data.alias("data"),
        F.struct(
            F.lit("raw/v1").alias("format"),
            F.length(data).cast("long").alias("n_bytes"),
            F.col("lang").alias("tag"),
        ).alias("meta"),
    )


# ---------------------------------------------------------------------------
# STUB decode — deterministic fake in place of a real codec.
# ---------------------------------------------------------------------------


def _fake_decode(payload: bytes) -> list[float]:
    """STUB: stands in for image decode / audio PCM extraction.
    Deterministic 4-dim 'feature': byte-statistics of the payload.
    Replace with PIL/torchaudio/ffmpeg in a real deployment."""
    if not payload:
        return [0.0, 0.0, 0.0, 0.0]
    a = np.frombuffer(payload, dtype=np.uint8)
    return [
        float(a.size),
        float(a[0]),
        float(a[-1]),
        float(int(a.sum(dtype=np.int64)) % 997),
    ]


def extract_features(media: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over the binary column."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            data = pdf["data"]
            feats = data.map(_fake_decode)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    # n_bytes/checksum reuse the decode output (feat[0] =
                    # size, feat[3] = byte-sum % 997) — the payload is
                    # traversed once per row, vectorized in numpy, not
                    # three times through Python byte loops.
                    "n_bytes": feats.map(lambda f: int(f[0])).astype("int64"),
                    "checksum": feats.map(lambda f: int(f[3])).astype("int64"),
                    "feat": feats,
                }
            )

    return media.mapInPandas(run, FEATURE_SCHEMA)


def resize(media: DataFrame, factor: int = 4) -> DataFrame:
    """STUB resize: keep every ``factor``-th byte of the payload — the
    plumbing shape of image/audio downsampling (payload in → smaller
    payload out, metadata updated) without a codec. Replace the numpy
    slice with PIL.Image.resize / librosa.resample in a real
    deployment; the mapInPandas contract (binary in, binary out,
    Arrow-batched, schema preserved) is the real part."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pdf.copy()
            out["data"] = pdf["data"].map(
                lambda b: np.frombuffer(b, dtype=np.uint8)[::factor].tobytes()
            )
            out["meta"] = [
                {**m, "n_bytes": len(d), "format": f"{m['format']};ds{factor}"}
                for m, d in zip(pdf["meta"], out["data"])
            ]
            yield out

    return media.mapInPandas(run, MEDIA_SCHEMA)


def frame_sample(media: DataFrame, every: int = 64) -> DataFrame:
    """STUB frame sampler: slice the payload every `every` bytes — the
    plumbing shape of video frame-sampling (one input row → N frame
    rows) without a codec."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_ids, out_idx, out_frames = [], [], []
            for mid, payload in zip(pdf["media_id"], pdf["data"]):
                for i, off in enumerate(range(0, len(payload), every)):
                    out_ids.append(mid)
                    out_idx.append(i)
                    out_frames.append(bytes(payload[off : off + every]))
            yield pd.DataFrame(
                {"media_id": out_ids, "frame_idx": out_idx, "frame": out_frames}
            )

    return media.mapInPandas(run, "media_id bigint, frame_idx int, frame binary")


# ---------------------------------------------------------------------------
# Catalog queries
# ---------------------------------------------------------------------------


def q_multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metadata-only rollup over the media table: proves predicates on
    the typed meta struct never touch payload bytes (column pruning —
    the scan reads meta+kind only)."""
    media = synth_media(spark, sf_dir)
    return media.groupBy("kind").agg(
        F.count("*").alias("n_items"),
        F.sum(F.col("meta.n_bytes")).alias("total_bytes"),
        F.count_if(F.col("meta.tag") == "en").alias("n_en"),
    )


def q_media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mapInPandas feature extraction (rows-only check — byte-level
    arithmetic is not expressible in the DuckDB oracle; unit-tested
    against plain-Python instead)."""
    media = synth_media(spark, sf_dir)
    feats = extract_features(media)
    return feats.select(
        "media_id",
        "kind",
        "n_bytes",
        "checksum",
        F.round(F.element_at("feat", 4), 1).alias("f_sum"),
    )


def q_media_framesample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video-style frame sampling through the Arrow `mapInPandas`
    plumbing (rows-only check — the 1→N fan-out and byte slicing are
    unit-tested against plain Python in tests/test_multimodal.py):
    per media item, the sampled frame count, the max frame index, and
    the total sampled bytes. The decode step is the deterministic STUB
    (no codecs in this container); schema, batching, and fan-out shape
    are the real scale path."""
    media = synth_media(spark, sf_dir)
    frames = frame_sample(media, every=64)
    return frames.groupBy("media_id").agg(
        F.count("*").alias("n_frames"),
        F.max("frame_idx").alias("max_idx"),
        F.sum(F.length("frame")).alias("sampled_bytes"),
    )


def q_media_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact binary-payload dedup — the media twin of the text
    dedup family: group identical payloads by md5 of the BYTES (not
    any decoded form), keep the lowest media_id, report group sizes.

    Scale shape: the hash is computed scan-side (payload bytes never
    shuffle — only the 16-byte digest and ids do), then one groupBy
    on the digest; the survivors join back by id if payloads are
    needed. This is how petabyte media dedup actually runs: bytes
    stay in place, digests move."""
    media = synth_media(spark, sf_dir)
    return (
        media.select("media_id", "kind", F.md5("data").alias("digest"))
        .groupBy("digest")
        .agg(
            F.min("media_id").alias("keep_id"),
            F.count("*").alias("n_copies"),
        )
        .select("keep_id", "n_copies")
    )


ORACLE: dict[str, str] = {
    "q_media_dedup": """
        -- payload = utf-8 bytes of text, so grouping by text is
        -- byte-identical grouping (DuckDB's md5 takes no BLOB)
        SELECT min(doc_id) AS keep_id, count(*) AS n_copies
        FROM documents GROUP BY text
    """,
    "q_multimodal_meta": """
        SELECT CASE CAST(doc_id % 3 AS INTEGER) WHEN 0 THEN 'image'
                    WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
               count(*) AS n_items,
               CAST(sum(CAST(octet_length(encode(text)) AS BIGINT))
                    AS BIGINT) AS total_bytes,
               count(*) FILTER (WHERE lang = 'en') AS n_en
        FROM documents GROUP BY 1
    """,
}
