"""Multimodal column handling (extension tier, SURVEY.md §2.4
`x_multimodal_cols`).

Design: media payloads are opaque `binary` columns + a typed metadata
struct, exactly how a 100 TB training pipeline stores them (parquet binary
chunks; decode only inside Arrow-batched Python workers).  The
codec-dependent decode / feature-extract step is STUBBED deterministically
in x_multimodal_features/_resize/_framesample — the image/audio codec
LIBRARIES aren't in this container (per round-1 brief) — but
`x_multimodal_decode` and `x_multimodal_audio_decode` (bottom of this
file) run the REAL path end to end for formats that need no codec:
actual P6 PPM images and RIFF/PCM16 WAV audio decoded with pure
numpy/struct (header parse, raster reshape, channel stats,
nearest-neighbor thumbnail, duration/energy/peak), EXACT-checked
against SQL oracles.  Every piece of Spark
plumbing (schema, mapInPandas batch iteration, partition behavior,
metadata projection) is therefore exercised with genuine decoding, and
the stubs share its exact shape.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import load_table
from ..registry import register

FEATURE_SCHEMA = (
    "doc_id long, media_type string, n_bytes long, "
    "width int, height int, checksum long"
)


def decode_media(payload: bytes, media_type: str) -> dict:
    """STUB decode: a real implementation would dispatch to PIL/librosa/
    ffmpeg here.  Deterministic fake: 'dimensions' derived from payload
    length, checksum = byte sum.  Raises for unknown media types like a real
    decoder would."""
    if media_type not in ("image", "audio"):
        raise NotImplementedError(f"no decoder for media_type={media_type!r}")
    n = len(payload)
    return {
        "width": (n % 64) + 1,
        "height": ((n // 64) % 64) + 1,
        "checksum": sum(payload) if payload else 0,
    }


def extract_features(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas worker: Arrow batches in, feature rows out — the shape a
    real decoder plugs into (one vectorized loop per batch, no per-row
    Python dispatch overhead beyond the decode itself)."""
    for pdf in batches:
        feats = [decode_media(p, m) for p, m in zip(pdf["payload"], pdf["media_type"])]
        out = pd.DataFrame(
            {
                "doc_id": pdf["doc_id"].values,
                "media_type": pdf["media_type"].values,
                "n_bytes": [len(p) for p in pdf["payload"]],
                "width": [f["width"] for f in feats],
                "height": [f["height"] for f in feats],
                "checksum": [f["checksum"] for f in feats],
            }
        )
        yield out


def with_media_columns(docs: DataFrame) -> DataFrame:
    """Mint the multimodal layout from the documents fixture: text bytes as
    the opaque payload + a typed metadata struct (mirrors how the reference
    treats `data` as an opaque string payload with an envelope,
    ServerSentEvent.java:29-34)."""
    return docs.select(
        "doc_id",
        F.encode(F.col("text"), "utf-8").alias("payload"),
        F.when(F.col("doc_id") % 2 == 0, "image").otherwise("audio").alias(
            "media_type"
        ),
        F.struct(
            F.col("source").alias("origin"),
            F.col("lang").alias("lang"),
            F.length("text").alias("content_length"),
        ).alias("meta"),
    )


@register(
    "x_multimodal_cols",
    oracle="""
    SELECT doc_id,
           CASE WHEN doc_id % 2 = 0 THEN 'image' ELSE 'audio' END AS media_type,
           strlen(text) AS n_bytes,
           source AS origin
    FROM documents
    """,
)
def x_multimodal_cols(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary payload + metadata struct projection (the storage layout
    itself; byte length via octet_length on the binary column)."""
    d = load_table(spark, sf_dir, "documents")
    media = with_media_columns(d)
    return media.select(
        "doc_id",
        "media_type",
        F.octet_length("payload").cast("long").alias("n_bytes"),
        F.col("meta.origin").alias("origin"),
    )


def resize_media(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas resize stub: clamp 'dimensions' to 32×32 and emit a
    payload truncated to w*h bytes (a real implementation calls
    PIL.Image.resize here; the batch plumbing and output schema are what
    Spark sees either way)."""
    for pdf in batches:
        feats = [decode_media(p, m) for p, m in zip(pdf["payload"], pdf["media_type"])]
        w = [min(f["width"], 32) for f in feats]
        h = [min(f["height"], 32) for f in feats]
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"].values,
                "width": w,
                "height": h,
                "resized": [
                    bytes(p[: wi * hi]) for p, wi, hi in zip(pdf["payload"], w, h)
                ],
            }
        )


@register(
    "x_multimodal_resize",
    oracle="""
    SELECT doc_id,
           CAST(LEAST((strlen(text) % 64) + 1, 32) AS INTEGER) AS width,
           CAST(LEAST(((strlen(text) // 64) % 64) + 1, 32) AS INTEGER) AS height,
           LEAST(strlen(text),
                 LEAST((strlen(text) % 64) + 1, 32)
                 * LEAST(((strlen(text) // 64) % 64) + 1, 32)) AS resized_bytes
    FROM documents
    WHERE doc_id % 3 = 0
    """,
)
def x_multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resize through mapInPandas over binary payloads (decode/resize
    stubbed deterministically; Arrow batch plumbing real).  Comparison
    surface: doc_id + clamped dimensions + resized byte count."""
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") % 3 == 0)
    media = with_media_columns(d).select("doc_id", "payload", "media_type")
    resized = media.mapInPandas(
        resize_media, "doc_id long, width int, height int, resized binary"
    )
    return resized.select(
        "doc_id",
        "width",
        "height",
        F.octet_length("resized").cast("long").alias("resized_bytes"),
    )


def sample_frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas frame sampler: treat the binary payload as fixed-size
    64-byte 'frames', keep every 4th (a real video sampler has the same
    shape: payload in, list-of-frame-chunks out, one output row per kept
    frame)."""
    FRAME, STRIDE = 64, 4
    for pdf in batches:
        out_rows = []
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            frames = [
                payload[i : i + FRAME] for i in range(0, len(payload), FRAME)
            ]
            for fi in range(0, len(frames), STRIDE):
                out_rows.append((doc_id, fi, len(frames[fi]), frames[fi]))
        yield pd.DataFrame(
            out_rows, columns=["doc_id", "frame_idx", "frame_bytes", "frame"]
        )


@register(
    "x_multimodal_framesample",
    oracle="""
    WITH f AS (
      SELECT doc_id,
             (g.i - 1) * 4 AS frame_idx,
             LEAST(64, strlen(text) - (g.i - 1) * 4 * 64) AS frame_bytes
      FROM documents,
           UNNEST(generate_series(1, CAST(ceil(ceil(strlen(text) / 64.0) / 4.0)
                                          AS BIGINT))) AS g(i)
      WHERE doc_id % 7 = 0)
    SELECT doc_id, frame_idx, frame_bytes FROM f
    """,
)
def x_multimodal_framesample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling over binary payloads via mapInPandas (every 4th
    64-byte frame).  The frame bytes themselves stay Spark-side (binary);
    the comparison surface is (doc_id, frame_idx, frame_bytes)."""
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") % 7 == 0)
    media = with_media_columns(d).select("doc_id", "payload", "media_type")
    frames = media.mapInPandas(
        sample_frames,
        "doc_id long, frame_idx long, frame_bytes long, frame binary",
    )
    return frames.select("doc_id", "frame_idx", "frame_bytes")


@register(
    "x_multimodal_features",
    oracle="""
    SELECT doc_id,
           CASE WHEN doc_id % 2 = 0 THEN 'image' ELSE 'audio' END AS media_type,
           strlen(text) AS n_bytes,
           CAST((strlen(text) % 64) + 1 AS INTEGER) AS width,
           CAST(((strlen(text) // 64) % 64) + 1 AS INTEGER) AS height
    FROM documents
    WHERE doc_id % 5 = 0
    """,
)
def x_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature extraction through mapInPandas over binary payloads (decode
    stubbed; Arrow batch plumbing real).  Checksum column dropped from the
    comparison surface only to keep the oracle in pure SQL."""
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") % 5 == 0)
    media = with_media_columns(d)
    feats = media.select("doc_id", "payload", "media_type").mapInPandas(
        extract_features, FEATURE_SCHEMA
    )
    return feats.select("doc_id", "media_type", "n_bytes", "width", "height")


def _ppm_payloads(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Ingest simulation: mint a REAL P6 PPM image per doc — header
    'P6\\n{w} {h}\\n255\\n' + w*h raw RGB triplets with arithmetic pixel
    content (byte i = (doc_id*7 + 13*i) % 256), so the decoded channel
    statistics are independently computable in pure SQL."""
    for pdf in batches:
        rows = []
        for doc_id in pdf["doc_id"]:
            doc_id = int(doc_id)
            w = 4 + doc_id % 5
            h = 3 + doc_id % 4
            body = bytes((doc_id * 7 + 13 * i) % 256 for i in range(3 * w * h))
            rows.append((doc_id, f"P6\n{w} {h}\n255\n".encode() + body))
        yield pd.DataFrame(rows, columns=["doc_id", "payload"])


def decode_ppm(payload: bytes) -> dict:
    """REAL image decode, no codec library needed: parse the P6 header,
    wrap the raster in a numpy (h, w, 3) array, and compute per-channel
    sums plus a nearest-neighbor 2x2 thumbnail sum — the actual
    decode -> array -> feature/resize path a training pipeline runs,
    exercised end-to-end instead of stubbed."""
    import numpy as np

    magic, dims, maxval, raster = payload.split(b"\n", 3)
    if magic != b"P6":
        raise NotImplementedError(f"no decoder for magic={magic!r}")
    w, h = map(int, dims.split())
    assert int(maxval) == 255
    arr = np.frombuffer(raster, dtype=np.uint8).reshape(h, w, 3)
    ch = arr.sum(axis=(0, 1), dtype=np.int64)
    thumb = arr[(np.arange(2) * h) // 2][:, (np.arange(2) * w) // 2]
    return {
        "width": w,
        "height": h,
        "r_sum": int(ch[0]),
        "g_sum": int(ch[1]),
        "b_sum": int(ch[2]),
        "thumb_sum": int(thumb.sum(dtype=np.int64)),
    }


def _decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        feats = [decode_ppm(p) for p in pdf["payload"]]
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"].values,
                "width": [f["width"] for f in feats],
                "height": [f["height"] for f in feats],
                "r_sum": [f["r_sum"] for f in feats],
                "g_sum": [f["g_sum"] for f in feats],
                "b_sum": [f["b_sum"] for f in feats],
                "thumb_sum": [f["thumb_sum"] for f in feats],
            }
        )


@register(
    "x_multimodal_decode",
    oracle="""
    WITH dims AS (
      SELECT doc_id, 4 + doc_id % 5 AS w, 3 + doc_id % 4 AS h
      FROM documents WHERE doc_id % 4 = 1),
    px AS (
      SELECT doc_id, w, h, g.i AS i,
             (doc_id * 7 + 13 * g.i) % 256 AS v
      FROM dims, UNNEST(generate_series(0, 3 * w * h - 1)) AS g(i)),
    thumb AS (
      SELECT d.doc_id,
             SUM((d.doc_id * 7
                  + 13 * (3 * (((y.y * d.h) // 2) * d.w + (x.x * d.w) // 2)
                          + c.c)) % 256) AS t_sum
      FROM dims d,
           UNNEST(generate_series(0, 1)) AS y(y),
           UNNEST(generate_series(0, 1)) AS x(x),
           UNNEST(generate_series(0, 2)) AS c(c)
      GROUP BY d.doc_id)
    SELECT p.doc_id,
           CAST(MIN(p.w) AS INTEGER) AS width,
           CAST(MIN(p.h) AS INTEGER) AS height,
           CAST(SUM(CASE WHEN p.i % 3 = 0 THEN p.v END) AS BIGINT) AS r_sum,
           CAST(SUM(CASE WHEN p.i % 3 = 1 THEN p.v END) AS BIGINT) AS g_sum,
           CAST(SUM(CASE WHEN p.i % 3 = 2 THEN p.v END) AS BIGINT) AS b_sum,
           CAST(MIN(t.t_sum) AS BIGINT) AS thumb_sum
    FROM px p JOIN thumb t ON p.doc_id = t.doc_id
    GROUP BY p.doc_id
    """,
)
def x_multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The multimodal path WITHOUT the stub: mint real P6 PPM images in
    one mapInPandas stage (ingest simulation), then decode them with
    pure numpy in a second — header parse, (h, w, 3) raster reshape,
    per-channel sums, nearest-neighbor 2x2 thumbnail — the genuine
    decode -> ndarray -> feature/resize chain, end-to-end through Arrow
    batches, proving the tier's plumbing carries REAL image decoding
    when a format needs no external codec.  The arithmetic pixel
    content makes every decoded statistic independently computable by
    the SQL oracle (exact integer sums, no float tolerance).  At 100 TB
    both stages are map-only over binary columns; swapping decode_ppm
    for a JPEG codec changes one function, not the plan."""
    d = load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") % 4 == 1
    ).select("doc_id")
    payloads = d.mapInPandas(_ppm_payloads, "doc_id long, payload binary")
    return payloads.mapInPandas(
        _decode_batches,
        "doc_id long, width int, height int, "
        "r_sum long, g_sum long, b_sum long, thumb_sum long",
    )


WAV_RATE = 8000  # Hz; one PCM16 sample = 125 us exactly


def _wav_payloads(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Ingest simulation, audio twin of _ppm_payloads: mint a REAL mono
    PCM16 WAV per doc (canonical 44-byte RIFF header + samples
    s_i = ((doc_id*11 + 17*i) % 4001) - 2000), decodable by any WAV
    reader and statable in pure SQL."""
    import struct

    for pdf in batches:
        rows = []
        for doc_id in pdf["doc_id"]:
            doc_id = int(doc_id)
            n = 50 + doc_id % 50
            samples = [
                ((doc_id * 11 + 17 * i) % 4001) - 2000 for i in range(n)
            ]
            data = struct.pack(f"<{n}h", *samples)
            hdr = struct.pack(
                "<4sI4s4sIHHIIHH4sI",
                b"RIFF", 36 + len(data), b"WAVE",
                b"fmt ", 16, 1, 1, WAV_RATE, WAV_RATE * 2, 2, 16,
                b"data", len(data),
            )
            rows.append((doc_id, hdr + data))
        yield pd.DataFrame(rows, columns=["doc_id", "payload"])


def decode_wav(payload: bytes) -> dict:
    """REAL audio decode, no codec library: parse the RIFF/fmt/data
    chunks, check PCM16 mono, and compute sample statistics with numpy —
    the decode -> ndarray -> feature path an audio pipeline runs."""
    import struct

    import numpy as np

    riff, _size, wave = struct.unpack("<4sI4s", payload[:12])
    if riff != b"RIFF" or wave != b"WAVE":
        raise NotImplementedError("not a RIFF/WAVE payload")
    (fmt_id, fmt_sz, audio_fmt, channels, rate, _bps, _align, bits) = (
        struct.unpack("<4sIHHIIHH", payload[12:36])
    )
    assert fmt_id == b"fmt " and audio_fmt == 1 and channels == 1 and bits == 16
    data_id, data_len = struct.unpack("<4sI", payload[36:44])
    assert data_id == b"data"
    samples = np.frombuffer(payload[44 : 44 + data_len], dtype="<i2")
    return {
        "n_samples": len(samples),
        "duration_us": len(samples) * 1_000_000 // rate,
        "amp_sum": int(samples.sum(dtype=np.int64)),
        "sq_sum": int((samples.astype(np.int64) ** 2).sum()),
        "peak": int(np.abs(samples.astype(np.int64)).max()),
    }


def _decode_wav_batches(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        feats = [decode_wav(p) for p in pdf["payload"]]
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"].values,
                "n_samples": [f["n_samples"] for f in feats],
                "duration_us": [f["duration_us"] for f in feats],
                "amp_sum": [f["amp_sum"] for f in feats],
                "sq_sum": [f["sq_sum"] for f in feats],
                "peak": [f["peak"] for f in feats],
            }
        )


@register(
    "x_multimodal_audio_decode",
    oracle=f"""
    WITH dims AS (
      SELECT doc_id, 50 + doc_id % 50 AS n
      FROM documents WHERE doc_id % 4 = 2),
    smp AS (
      SELECT doc_id, n,
             ((doc_id * 11 + 17 * g.i) % 4001) - 2000 AS v
      FROM dims, UNNEST(generate_series(0, n - 1)) AS g(i))
    SELECT doc_id,
           CAST(MIN(n) AS BIGINT) AS n_samples,
           CAST(MIN(n) * 1000000 // {WAV_RATE} AS BIGINT) AS duration_us,
           CAST(SUM(v) AS BIGINT) AS amp_sum,
           CAST(SUM(v * v) AS BIGINT) AS sq_sum,
           CAST(MAX(abs(v)) AS BIGINT) AS peak
    FROM smp GROUP BY doc_id
    """,
)
def x_multimodal_audio_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio twin of x_multimodal_decode: REAL mono PCM16 WAV files
    minted in one mapInPandas stage and decoded in a second with struct +
    numpy alone — RIFF chunk parse, int16 raster, exact duration
    (125 us/sample at {WAV_RATE} Hz), amplitude/energy sums, peak.  The
    arithmetic samples keep every decoded statistic an exact-integer SQL
    oracle.  Map-only both stages; a real opus/flac codec would replace
    decode_wav only."""
    d = load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") % 4 == 2
    ).select("doc_id")
    payloads = d.mapInPandas(_wav_payloads, "doc_id long, payload binary")
    return payloads.mapInPandas(
        _decode_wav_batches,
        "doc_id long, n_samples long, duration_us long, "
        "amp_sum long, sq_sum long, peak long",
    )


Y4M_W, Y4M_H = 4, 4  # tiny C444 frames: 3 planes of W*H bytes each
FRAME_STRIDE = 3  # keep every 3rd frame


def _y4m_payloads(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Ingest simulation, video twin: mint a REAL YUV4MPEG2 stream per
    doc — stream header, then (6 + doc_id % 7) frames of 'FRAME\\n' +
    C444 planes with arithmetic content (frame f, byte i ->
    (doc_id*13 + f*31 + i*7) % 256)."""
    for pdf in batches:
        rows = []
        for doc_id in pdf["doc_id"]:
            doc_id = int(doc_id)
            n_frames = 6 + doc_id % 7
            plane = 3 * Y4M_W * Y4M_H
            buf = [f"YUV4MPEG2 W{Y4M_W} H{Y4M_H} F25:1 Ip A1:1 C444\n".encode()]
            for f in range(n_frames):
                buf.append(b"FRAME\n")
                buf.append(
                    bytes((doc_id * 13 + f * 31 + i * 7) % 256 for i in range(plane))
                )
            rows.append((doc_id, b"".join(buf)))
        yield pd.DataFrame(rows, columns=["doc_id", "payload"])


def sample_y4m_frames(payload: bytes) -> list[tuple[int, int, int]]:
    """REAL video demux, no codec library: parse the YUV4MPEG2 stream
    header (dimensions, colorspace), walk the FRAME markers, and for
    every FRAME_STRIDE-th frame compute the luma-plane byte sum from the
    numpy view — the demux -> frame-tensor -> sample chain a video
    pipeline runs."""
    import numpy as np

    nl = payload.index(b"\n")
    header = payload[:nl].split()
    assert header[0] == b"YUV4MPEG2"
    params = {p[:1]: p[1:] for p in header[1:]}
    w, h = int(params[b"W"]), int(params[b"H"])
    assert params[b"C"] == b"444"
    frame_len = 3 * w * h
    out = []
    pos = nl + 1
    fi = 0
    while pos < len(payload):
        assert payload[pos : pos + 6] == b"FRAME\n"
        pos += 6
        if fi % FRAME_STRIDE == 0:
            luma = np.frombuffer(payload[pos : pos + w * h], dtype=np.uint8)
            out.append((fi, int(luma.sum(dtype=np.int64)), frame_len))
        pos += frame_len
        fi += 1
    return out


def _sample_y4m_batches(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        rows = []
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            for fi, luma_sum, frame_len in sample_y4m_frames(payload):
                rows.append((int(doc_id), fi, luma_sum, frame_len))
        yield pd.DataFrame(
            rows, columns=["doc_id", "frame_idx", "luma_sum", "frame_bytes"]
        )


@register(
    "x_multimodal_video_sample",
    oracle=f"""
    WITH vids AS (
      SELECT doc_id, 6 + doc_id % 7 AS n_frames
      FROM documents WHERE doc_id % 4 = 3),
    kept AS (
      SELECT doc_id, g.f AS frame_idx
      FROM vids, UNNEST(generate_series(0, n_frames - 1)) AS g(f)
      WHERE g.f % {FRAME_STRIDE} = 0),
    px AS (
      SELECT doc_id, frame_idx,
             (doc_id * 13 + frame_idx * 31 + g.i * 7) % 256 AS v
      FROM kept, UNNEST(generate_series(0, {Y4M_W * Y4M_H - 1})) AS g(i))
    SELECT doc_id, frame_idx,
           CAST(SUM(v) AS BIGINT) AS luma_sum,
           CAST({3 * Y4M_W * Y4M_H} AS BIGINT) AS frame_bytes
    FROM px GROUP BY doc_id, frame_idx
    """,
)
def x_multimodal_video_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video twin completing the real-decode triple: mint genuine
    YUV4MPEG2 streams, then demux them with numpy alone — stream-header
    parse, FRAME-marker walk, luma-plane view per kept frame (every
    {FRAME_STRIDE}rd) — real frame sampling over a real video container,
    with exact-integer luma sums the SQL oracle recomputes.  Map-only
    both stages; a real h264 depacketizer would replace
    sample_y4m_frames only, and at 100 TB frames fan out one output row
    per kept frame exactly as a training sampler needs."""
    d = load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") % 4 == 3
    ).select("doc_id")
    payloads = d.mapInPandas(_y4m_payloads, "doc_id long, payload binary")
    return payloads.mapInPandas(
        _sample_y4m_batches,
        "doc_id long, frame_idx long, luma_sum long, frame_bytes long",
    )


def phash_ppm(payload: bytes) -> int:
    """4x4 average-hash over the decoded grayscale raster: sample a
    nearest-neighbor 4x4 grid, sum RGB per cell (integer gray x3),
    set bit k when 16*cell_k > sum(cells) — the strict compare keeps
    every bit an exact integer decision."""
    import numpy as np

    magic, dims, maxval, raster = payload.split(b"\n", 3)
    if magic != b"P6":
        raise NotImplementedError(f"no decoder for magic={magic!r}")
    w, h = map(int, dims.split())
    arr = np.frombuffer(raster, dtype=np.uint8).reshape(h, w, 3)
    cells = (
        arr[(np.arange(4) * h) // 4][:, (np.arange(4) * w) // 4]
        .sum(axis=2, dtype=np.int64)
    )
    total = int(cells.sum())
    bits = (16 * cells > total).flatten()
    return int(sum(1 << k for k, b in enumerate(bits) if b))


def _phash_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"].values,
                "phash": [phash_ppm(p) for p in pdf["payload"]],
            }
        )


@register(
    "x_multimodal_phash",
    oracle="""
    WITH dims AS (
      SELECT doc_id, 4 + doc_id % 5 AS w, 3 + doc_id % 4 AS h
      FROM documents WHERE doc_id % 4 = 1),
    cells AS (
      SELECT d.doc_id, y.y * 4 + x.x AS k,
             SUM((d.doc_id * 7
                  + 13 * (3 * (((y.y * d.h) // 4) * d.w
                               + (x.x * d.w) // 4) + c.c)) % 256) AS g
      FROM dims d,
           UNNEST(generate_series(0, 3)) AS y(y),
           UNNEST(generate_series(0, 3)) AS x(x),
           UNNEST(generate_series(0, 2)) AS c(c)
      GROUP BY d.doc_id, k),
    tot AS (SELECT doc_id, SUM(g) AS t FROM cells GROUP BY doc_id),
    hsh AS (
      SELECT c.doc_id,
             CAST(SUM(CASE WHEN 16 * c.g > t.t
                           THEN CAST(1 AS BIGINT) << c.k
                           ELSE 0 END) AS BIGINT) AS phash
      FROM cells c JOIN tot t ON t.doc_id = c.doc_id
      GROUP BY c.doc_id)
    SELECT phash,
           CAST(COUNT(*) AS BIGINT) AS n_images,
           CAST(MIN(doc_id) AS BIGINT) AS min_doc_id,
           CAST(MAX(doc_id) AS BIGINT) AS max_doc_id
    FROM hsh GROUP BY phash
    """,
)
def x_multimodal_phash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual-hash dedup over the image tier: mint the real P6
    payloads (ingest simulation, x_multimodal_decode's generator),
    decode and average-hash each raster in numpy (4x4 nearest grid,
    bit = cell brighter than the image mean), then bucket by the
    16-bit hash — equal hashes are perceptual duplicate candidates,
    the image-side analog of x_dedup_simhash's text buckets.  The
    strict integer compare (16·cell > Σcells) makes every bit an
    exact decision the SQL oracle replays arithmetically.

    100 TB posture: mint + decode + hash are map-only mapInPandas
    stages over binary columns (Arrow-batched numpy, never per-row
    Python); the shuffle carries (doc_id, 16-bit hash) — two
    integers per image — onto a hash-bucket census.  Near-dup
    (hamming ≤ d) extends by banding the 16 bits exactly like
    simhash's nibble buckets; the equal-hash form here is the
    exact-bucket tier."""
    d = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % 4 == 1)
        .select("doc_id")
    )
    payloads = d.mapInPandas(
        _ppm_payloads, "doc_id long, payload binary"
    )
    hashes = payloads.mapInPandas(
        _phash_batches, "doc_id long, phash long"
    )
    return hashes.groupBy("phash").agg(
        F.count("*").cast("long").alias("n_images"),
        F.min("doc_id").cast("long").alias("min_doc_id"),
        F.max("doc_id").cast("long").alias("max_doc_id"),
    )


# phash near-dup banding: 4 bands x 4 bits over the 16-bit hash; by
# pigeonhole any pair at Hamming distance <= PHASH_HAM_THR (= bands-1)
# shares at least one unchanged band, so banded recall is COMPLETE at
# the threshold (the x_dedup_simhash nibble-bucket argument, image
# edition)
PHASH_BANDS = 4
PHASH_BAND_BITS = 4
PHASH_HAM_THR = 3

_PHASH_ORACLE_HSH = """
    dims AS (
      SELECT doc_id, 4 + doc_id % 5 AS w, 3 + doc_id % 4 AS h
      FROM documents WHERE doc_id % 4 = 1),
    cells AS (
      SELECT d.doc_id, y.y * 4 + x.x AS k,
             SUM((d.doc_id * 7
                  + 13 * (3 * (((y.y * d.h) // 4) * d.w
                               + (x.x * d.w) // 4) + c.c)) % 256) AS g
      FROM dims d,
           UNNEST(generate_series(0, 3)) AS y(y),
           UNNEST(generate_series(0, 3)) AS x(x),
           UNNEST(generate_series(0, 2)) AS c(c)
      GROUP BY d.doc_id, k),
    tot AS (SELECT doc_id, SUM(g) AS t FROM cells GROUP BY doc_id),
    hsh AS (
      SELECT c.doc_id,
             CAST(SUM(CASE WHEN 16 * c.g > t.t
                           THEN CAST(1 AS BIGINT) << c.k
                           ELSE 0 END) AS BIGINT) AS phash
      FROM cells c JOIN tot t ON t.doc_id = c.doc_id
      GROUP BY c.doc_id)"""


@register(
    "x_multimodal_phash_neardup",
    oracle=f"""
    WITH {_PHASH_ORACLE_HSH},
    banded AS (
      SELECT doc_id, phash, b.b AS band,
             (phash >> ({PHASH_BAND_BITS} * b.b))
               & {2 ** PHASH_BAND_BITS - 1} AS bval
      FROM hsh, UNNEST(generate_series(0, {PHASH_BANDS - 1})) AS b(b)),
    cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, a.phash AS pa,
             b.doc_id AS doc_b, b.phash AS pb
      FROM banded a JOIN banded b
        ON b.band = a.band AND b.bval = a.bval
       AND a.doc_id < b.doc_id)
    SELECT doc_a, doc_b,
           CAST(bit_count(xor(pa, pb)) AS BIGINT) AS hamming
    FROM cand
    WHERE bit_count(xor(pa, pb)) <= {PHASH_HAM_THR}
    """,
)
def x_multimodal_phash_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual NEAR-duplicate image pairs — the Hamming-banded
    extension x_multimodal_phash's docstring names: two rasters whose
    16-bit average-hashes differ in ≤ {PHASH_HAM_THR} bits are
    perceptual-duplicate candidates (re-encode, mild crop, brightness
    shift).  Banding is {PHASH_BANDS}×{PHASH_BAND_BITS} bits; by
    pigeonhole a ≤{PHASH_HAM_THR}-bit pair shares an unchanged band,
    so candidate generation has COMPLETE recall at the threshold and
    the exact bit_count(xor) verify gives exact precision — the
    LSH-banding contract (x_dedup_near_minhash) on the image tier.

    Cross-engine exactness: the hash arithmetic replays integer-exactly
    in the oracle (the x_multimodal_phash derivation), band extraction
    is shift/mask, and Hamming distance is bit_count of xor — every
    stage integer.

    100 TB posture: mint/decode/hash are map-only mapInPandas stages;
    the shuffle carries (doc_id, 16-bit hash) × {PHASH_BANDS} band rows;
    pair expansion is bounded per band bucket (E[|bucket|] =
    N/2^{PHASH_BAND_BITS} per band at uniform hashes — production
    64-bit phashes use {PHASH_BANDS} bands of 16 bits, same plan, far
    smaller buckets); verification is map-side on the candidate
    relation.  A hot bucket (constant-color rasters) is the df-cap
    case — the COACT_*/GRAPH_PD_* auto-knee applies if it
    materializes."""
    from ..plans import spread

    # spread(): the mint+decode+hash mapInPandas chain inherits the
    # scan's partitioning — ONE Python worker does every image on a
    # one-task scan otherwise (round-13 rule)
    d = spread(
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % 4 == 1)
        .select("doc_id"),
        "doc_id",
    )
    payloads = d.mapInPandas(_ppm_payloads, "doc_id long, payload binary")
    hashes = payloads.mapInPandas(
        _phash_batches, "doc_id long, phash long"
    ).localCheckpoint(eager=True)  # both band sides: mint+hash run once
    banded = hashes.select(
        "doc_id",
        "phash",
        F.explode(
            F.array(*[F.lit(b) for b in range(PHASH_BANDS)])
        ).alias("band"),
    ).withColumn(
        "bval",
        F.expr(
            f"shiftright(phash, {PHASH_BAND_BITS} * band) "
            f"& {2 ** PHASH_BAND_BITS - 1}"
        ),
    )
    a = banded.select(
        F.col("doc_id").alias("doc_a"),
        F.col("phash").alias("pa"),
        "band",
        "bval",
    )
    b = banded.select(
        F.col("doc_id").alias("doc_b"),
        F.col("phash").alias("pb"),
        F.col("band").alias("band_b"),
        F.col("bval").alias("bval_b"),
    )
    ham = F.bit_count(
        F.col("pa").bitwiseXOR(F.col("pb"))
    ).cast("long")
    # Round 13 (§2.3/§2.4): verify BEFORE deduplicating — hamming is a
    # function of the pair, so filter∘distinct ≡ distinct∘filter, and
    # the ≤{thr}-bit cut runs map-side on the join output: the distinct
    # shuffle carries only true near-dup pairs (dup-evidence-sized)
    # instead of every banded candidate (Σ C(bucket,2) ≈ 122M rows at
    # sf1 — measured 7.0 s → see OPTIMIZATION_r13.md)
    return (
        a.join(
            b,
            (F.col("band_b") == F.col("band"))
            & (F.col("bval_b") == F.col("bval"))
            & (F.col("doc_a") < F.col("doc_b")),
        )
        .select("doc_a", "doc_b", ham.alias("hamming"))
        .filter(F.col("hamming") <= PHASH_HAM_THR)
        .distinct()
    )
