"""Multimodal-column plumbing — opaque binary payloads with typed metadata.

A 100 TB training-data pipeline carries image/audio/video as opaque
``binary`` columns plus typed metadata, decoding only inside Arrow-batched
Python (SURVEY's EXT multimodal mandate). The real media codecs (PIL,
librosa, av) are NOT in this container, so the decode step is a
deterministic fake (`_fake_decode`) behind the same ``mapInPandas``
plumbing a real decoder would use — schema, partitioning, batch shape, and
Arrow binary transfer are all real and differentially tested; swapping in a
real codec changes only the numpy body.

The payload here is ``encode(documents.text, 'utf-8')`` — an ASCII byte
stream, which lets the DuckDB oracle recompute every "decoded" feature via
character arithmetic, making even the UDF-backed op EXACT-oracled.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load
from ..registry import op

FRAME_STRIDE = 32  # every 32nd byte is a "frame" for the sampling demo


def _payloads(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents + synthetic binary payload and media-kind metadata."""
    d = load(spark, sf_dir).documents
    kind = (
        F.when(F.col("doc_id") % 3 == 0, "image")
        .when(F.col("doc_id") % 3 == 1, "audio")
        .otherwise("video")
    )
    return d.select(
        "doc_id",
        F.encode("text", "utf-8").alias("payload"),
        kind.alias("media_kind"),
    )


@op(
    "mm_binary_metadata",
    oracle="""
    SELECT doc_id,
           CASE WHEN doc_id % 3 = 0 THEN 'image'
                WHEN doc_id % 3 = 1 THEN 'audio'
                ELSE 'video' END AS media_kind,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
           lower(hex(encode(substring(text, 1, 4)))) AS header_hex,
           md5(text) AS payload_md5
    FROM documents
    """,
)
def mm_binary_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed metadata over the opaque payload, computed entirely JVM-side:
    byte length, 4-byte header hex (the magic-number sniff), content md5.
    No decode, no Python — the cheap metadata pass that runs before any
    expensive media decoding in a real pipeline."""
    p = _payloads(spark, sf_dir)
    return p.select(
        "doc_id",
        "media_kind",
        F.length("payload").cast("bigint").alias("n_bytes"),
        F.lower(F.hex(F.expr("substring(payload, 1, 4)"))).alias("header_hex"),
        F.md5("payload").alias("payload_md5"),
    )


@op(
    "mm_decode_stub",
    oracle="""
    WITH b AS (
      SELECT doc_id, length(text) AS n,
             CASE WHEN doc_id % 3 = 0 THEN 'image'
                  WHEN doc_id % 3 = 1 THEN 'audio'
                  ELSE 'video' END AS media_kind
      FROM documents
    ), frames AS (
      SELECT d.doc_id, ascii(substring(d.text, p.pos, 1)) AS byte_val
      FROM documents d CROSS JOIN (SELECT unnest(generate_series(1, 1000)) AS pos) p
      WHERE (p.pos - 1) % 32 = 0 AND p.pos <= length(d.text)
    ), fstats AS (
      SELECT doc_id, CAST(count(*) AS INT) AS n_frames,
             CAST(CAST(sum(byte_val) AS DOUBLE) / count(*) AS DOUBLE) AS frame_mean
      FROM frames GROUP BY doc_id
    )
    SELECT b.doc_id, b.media_kind,
           CAST(b.n % 640 AS INT) AS width,
           CAST(b.n % 480 AS INT) AS height,
           f.n_frames, f.frame_mean
    FROM b JOIN fstats f ON b.doc_id = f.doc_id
    """,
)
def mm_decode_stub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batched "decode": ``mapInPandas`` receives the binary payloads,
    frame-samples every 32nd byte via numpy, and emits decoded features
    (dims, frame count, frame-byte mean). ``_fake_decode`` is the
    deterministic stand-in for the real codec (PIL/librosa/av are not in
    this container — a real decoder raises NotImplementedError until one is
    installed); everything around it — Arrow binary transfer, batch
    iteration, output schema — is the production plumbing.

    Integer byte sums → one double division, so the UDF output is exactly
    reproducible by the oracle's character arithmetic."""

    def _fake_decode(np, buf: bytes, kind: str) -> tuple[int, int, int, float]:
        arr = np.frombuffer(buf, dtype=np.uint8)
        frames = arr[::FRAME_STRIDE]
        # a real codec would dispatch on kind here:
        #   if kind == "image": raise NotImplementedError("PIL not available")
        return (
            len(arr) % 640,
            len(arr) % 480,
            len(frames),
            float(int(frames.sum(dtype=np.int64))) / len(frames),
        )

    def decode(batches: Iterator["object"]) -> Iterator["object"]:
        import numpy as np
        import pandas as pd

        for pdf in batches:
            feats = [
                _fake_decode(np, buf, kind)
                for buf, kind in zip(pdf["payload"], pdf["media_kind"])
            ]
            out = pd.DataFrame(
                feats, columns=["width", "height", "n_frames", "frame_mean"]
            )
            out.insert(0, "media_kind", pdf["media_kind"].values)
            out.insert(0, "doc_id", pdf["doc_id"].values)
            yield out

    p = _payloads(spark, sf_dir)
    return p.mapInPandas(
        decode,
        "doc_id bigint, media_kind string, width int, height int, n_frames int, frame_mean double",
    )


THUMB_SIZE = 64  # resample every payload to a fixed 64-byte "thumbnail"


@op(
    "mm_resize_stub",
    oracle=f"""
    WITH idx AS (SELECT unnest(generate_series(0, {THUMB_SIZE - 1})) AS i),
    sampled AS (
      SELECT d.doc_id, x.i,
             ascii(substring(d.text, 1 + (x.i * length(d.text)) // {THUMB_SIZE}, 1)) AS v
      FROM documents d CROSS JOIN idx x
    )
    SELECT doc_id,
           CAST(count(*) AS INT) AS thumb_bytes,
           string_agg(printf('%02x', v), '' ORDER BY i) AS thumb_hex,
           CAST(sum(v) AS BIGINT) AS thumb_sum
    FROM sampled GROUP BY doc_id
    """,
)
def mm_resize_stub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resize plumbing: every payload stride-resamples to a fixed 64-byte
    thumbnail inside ``mapInPandas`` (numpy fancy-indexing — exactly what a
    real image resize's row/column sampling does, minus the codec). Emits
    the thumbnail as hex plus its byte sum; the oracle recomputes the same
    index arithmetic in SQL. Narrow Arrow-batched map, no shuffle; at
    100 TB this is the shape of the thumbnail/downsample pass that runs
    before feature extraction."""

    def resize(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            rows = []
            for doc_id, buf in zip(pdf["doc_id"], pdf["payload"]):
                arr = np.frombuffer(buf, dtype=np.uint8)
                idx = (np.arange(THUMB_SIZE, dtype=np.int64) * len(arr)) // THUMB_SIZE
                thumb = arr[idx]
                rows.append(
                    (doc_id, len(thumb), bytes(thumb).hex(), int(thumb.sum(dtype=np.int64)))
                )
            yield pd.DataFrame(rows, columns=["doc_id", "thumb_bytes", "thumb_hex", "thumb_sum"])

    return _payloads(spark, sf_dir).mapInPandas(
        resize, "doc_id bigint, thumb_bytes int, thumb_hex string, thumb_sum bigint"
    )


@op(
    "mm_feature_extract",
    oracle="""
    WITH bytes AS (
      SELECT d.doc_id,
             CASE WHEN d.doc_id % 3 = 0 THEN 'image'
                  WHEN d.doc_id % 3 = 1 THEN 'audio'
                  ELSE 'video' END AS media_kind,
             ascii(substring(d.text, p.pos, 1)) AS v
      FROM documents d
      CROSS JOIN (SELECT unnest(generate_series(1, 4000)) AS pos) p
      WHERE p.pos <= length(d.text)
    )
    SELECT doc_id, media_kind,
           CAST(count(*) AS BIGINT) AS n_bytes,
           CAST(count(*) FILTER (WHERE v < 64) AS BIGINT) AS bin0,
           CAST(count(*) FILTER (WHERE v >= 64 AND v < 128) AS BIGINT) AS bin1,
           CAST(count(*) FILTER (WHERE v >= 128 AND v < 192) AS BIGINT) AS bin2,
           CAST(count(*) FILTER (WHERE v >= 192) AS BIGINT) AS bin3,
           CAST(CAST(sum(v) AS DOUBLE) / count(*) AS DOUBLE) AS mean_byte
    FROM bytes GROUP BY doc_id, media_kind
    """,
)
def mm_feature_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature extraction over decoded payloads: 4-bin byte histogram +
    exact mean byte value per document, computed batch-wise in numpy under
    ``mapInPandas`` (the stand-in for a real embedding/feature model's
    preprocessing). Integer counts and an integer-sum/count division keep
    the UDF output exactly oracle-reproducible. The oracle's 4000-position
    unnest bounds documents.text length at test scale."""

    def extract(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            rows = []
            for doc_id, kind, buf in zip(pdf["doc_id"], pdf["media_kind"], pdf["payload"]):
                arr = np.frombuffer(buf, dtype=np.uint8)
                hist = np.bincount(arr >> 6, minlength=4)
                rows.append(
                    (
                        doc_id,
                        kind,
                        len(arr),
                        int(hist[0]),
                        int(hist[1]),
                        int(hist[2]),
                        int(hist[3]),
                        float(int(arr.sum(dtype=np.int64))) / len(arr),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "media_kind", "n_bytes", "bin0", "bin1", "bin2", "bin3", "mean_byte"],
            )

    return _payloads(spark, sf_dir).mapInPandas(
        extract,
        "doc_id bigint, media_kind string, n_bytes bigint, "
        "bin0 bigint, bin1 bigint, bin2 bigint, bin3 bigint, mean_byte double",
    )


N_SAMPLED_FRAMES = 8  # keyframe budget per video


@op(
    "mm_frame_sample",
    oracle=f"""
    SELECT d.doc_id,
           CAST(p.i AS INT) AS frame_idx,
           CAST(p.i * {FRAME_STRIDE} + 1 AS INT) AS byte_pos,
           CAST(ascii(substring(d.text, p.i * {FRAME_STRIDE} + 1, 1)) AS INT) AS frame_val,
           md5(substring(d.text, p.i * {FRAME_STRIDE} + 1,
                         least({FRAME_STRIDE}, length(d.text) - p.i * {FRAME_STRIDE}))) AS frame_md5
    FROM documents d
    CROSS JOIN (SELECT unnest(generate_series(0, {N_SAMPLED_FRAMES - 1})) AS i) p
    WHERE d.doc_id % 3 = 2 AND p.i * {FRAME_STRIDE} + 1 <= length(d.text)
    """,
)
def mm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling for video payloads — the keyframe-budget pass of a
    video ingestion pipeline (prompt mandate: decode / feature-extract /
    resize / FRAME-SAMPLE): each video payload yields its first
    {N_SAMPLED_FRAMES} stride-{FRAME_STRIDE} "frames" as one ROW PER FRAME
    (doc_id, frame_idx, byte offset, first frame byte, md5 of the frame
    slice) — the exploded shape downstream per-frame feature extraction
    consumes, vs mm_decode_stub's per-document aggregate. The fake codec
    treats every {FRAME_STRIDE}-byte slice as a frame (a real demuxer
    dispatches on the container format here); the fan-out is bounded by
    the budget, never by payload length — the property that keeps the
    output row count O(#videos · budget) at 100 TB.

    Arrow-batched ``mapInPandas`` over (payload, media_kind); non-video
    rows are filtered JVM-side BEFORE the Python stage so the codec only
    ever sees the rows it must touch (the same predicate the oracle
    states)."""

    def sample(batches: Iterator["object"]) -> Iterator["object"]:
        import hashlib

        import numpy as np
        import pandas as pd

        for pdf in batches:
            rows = []
            for doc_id, buf in zip(pdf["doc_id"], pdf["payload"]):
                arr = np.frombuffer(buf, dtype=np.uint8)
                n_frames = min(N_SAMPLED_FRAMES, (len(arr) + FRAME_STRIDE - 1) // FRAME_STRIDE)
                for i in range(n_frames):
                    pos = i * FRAME_STRIDE
                    frame = bytes(arr[pos : pos + FRAME_STRIDE])
                    rows.append(
                        (doc_id, i, pos + 1, int(arr[pos]), hashlib.md5(frame).hexdigest())
                    )
            yield pd.DataFrame(
                rows, columns=["doc_id", "frame_idx", "byte_pos", "frame_val", "frame_md5"]
            )

    p = _payloads(spark, sf_dir).where(F.col("media_kind") == "video")
    return p.mapInPandas(
        sample,
        "doc_id bigint, frame_idx int, byte_pos int, frame_val int, frame_md5 string",
    )
