"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Training-data pipelines carry image/audio/video as ``binary`` columns with
a metadata struct; decode/feature-extraction runs as Arrow-batched Pandas
UDFs over ``mapInPandas``. The media libraries (PIL/ffmpeg/librosa) are
NOT in this container, so the actual byte→pixels decode is stubbed —
clearly marked — behind :func:`register_decoder`; everything Spark-side
(schema contract, batch iteration, partition sizing, output shapes) is
real and tested with the deterministic fake decoder.

Scale notes: media rows are large — ``repartition`` by size budget before
mapInPandas so a batch of payloads fits executor memory
(``media_repartition``), and NEVER collect payloads to the driver. The
Arrow batch size is governed by ``spark.sql.execution.arrow.
maxRecordsPerBatch`` — set it small (e.g. 64) for multi-MB payloads.
"""

from __future__ import annotations

import hashlib
from typing import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("modality", StringType()),       # image | audio | video
        StructField("payload", BinaryType()),        # opaque encoded bytes
        StructField("mime_type", StringType()),
        StructField("width", IntegerType()),         # image/video
        StructField("height", IntegerType()),
        StructField("duration_ms", IntegerType()),   # audio/video
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("modality", StringType()),
        StructField("payload_bytes", LongType()),
        StructField("payload_digest", StringType()),
        StructField("feature", ArrayType(FloatType())),
    ]
)

_DECODER: dict[str, Callable[[bytes], list[float]]] = {}


def register_decoder(modality: str, fn: Callable[[bytes], list[float]]) -> None:
    """Install a real decoder (e.g. PIL-based) for a modality."""
    _DECODER[modality] = fn


def _stub_decode(payload: bytes, dim: int = 8) -> list[float]:
    """DETERMINISTIC FAKE decode — stands in for the real media decoder.

    Real deployments ``register_decoder("image", pil_decode)`` etc.; this
    fake hashes bytes to a fixed-dim float vector so the Spark plumbing
    (schema/batching/partitioning) is fully exercisable without media libs.
    """
    d = hashlib.sha256(payload or b"").digest()
    return [int.from_bytes(d[4 * i : 4 * i + 4], "little") / 2**32 for i in range(dim)]


def chunk_payloads(
    df: DataFrame,
    chunk_bytes: int = 1 << 20,
    payload_col: str = "payload",
    id_col: str = "media_id",
) -> DataFrame:
    """Split binary payloads into fixed-size byte chunks (map-only).

    The upload/shard unit for large media blobs: pure expressions —
    ``sequence`` over the chunk count, ``substring`` on the binary (Spark
    slices BinaryType by byte), one ``posexplode``. Zero shuffle, no
    Python; same plan shape as text chunking (operators/text.py
    chunk_documents) applied to bytes. Output: ``(id, chunk_id,
    chunk binary, n_bytes)``; empty payloads yield one empty chunk so
    every media row survives (NULL payloads are dropped by the explode,
    like NULL text in the text operators).
    """
    if chunk_bytes < 1:
        raise ValueError(f"chunk_bytes must be >= 1, got {chunk_bytes}")
    p = F.col(payload_col)
    n = F.ceil(F.octet_length(p) / F.lit(float(chunk_bytes))).cast("int")
    # greatest() IGNORES nulls (returns 0 for a NULL count), so gate the
    # whole chunk array on payload presence — a NULL array explodes to
    # nothing, which is how NULL payloads get dropped
    idx = F.sequence(F.lit(0), F.greatest(n - 1, F.lit(0)))
    chunks = F.when(
        p.isNotNull(),
        F.transform(idx, lambda i: p.substr(i * chunk_bytes + 1, F.lit(chunk_bytes))),
    )
    return (
        df.select(F.col(id_col), F.posexplode(chunks).alias("chunk_id", "chunk"))
        .withColumn("n_bytes", F.octet_length("chunk"))
    )


def media_repartition(
    df: DataFrame,
    target_partition_bytes: int = 128 << 20,
    size_col: str | None = None,
    total_bytes: int | None = None,
) -> DataFrame:
    """Partition so ~``target_partition_bytes`` of payload land per task.

    Sizing source, cheapest first: ``total_bytes`` (caller knows, e.g.
    from object-store listing), else ``size_col`` (a metadata byte-count
    column — aggregating it never touches payloads), else
    ``length(payload)`` (correct but scans the blobs; avoid at scale).
    """
    if total_bytes is None:
        size_expr = F.col(size_col) if size_col else F.length("payload")
        total_bytes = df.agg(F.sum(size_expr)).first()[0] or 0
    parts = max(1, -(-int(total_bytes) // target_partition_bytes))
    return df.repartition(parts)


def extract_features(df: DataFrame, batch_hint: int = 64) -> DataFrame:
    """payload → feature vector via Arrow-batched mapInPandas.

    Uses the registered decoder per modality, else the deterministic stub.
    The UDF sees pandas batches (zero-copy Arrow transfer for the binary
    column); output is the narrow FEATURE_SCHEMA — payloads never travel
    further down the pipeline.
    """

    # Snapshot decoders into a local so the closure is fully self-contained:
    # cloudpickle serializes module-global references by *import*, which
    # breaks on executors that can't import this package (e.g. a driver
    # launched from another cwd). Locals are pickled by value.
    decoders = dict(_DECODER)

    def _stub(payload: bytes, dim: int = 8) -> list[float]:
        import hashlib as _h

        d = _h.sha256(payload or b"").digest()
        return [int.from_bytes(d[4 * i : 4 * i + 4], "little") / 2**32 for i in range(dim)]

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            feats, digests, sizes = [], [], []
            for modality, payload in zip(pdf["modality"], pdf["payload"]):
                raw = bytes(payload) if payload is not None else b""
                fn = decoders.get(modality)
                feats.append(fn(raw) if fn else _stub(raw))
                digests.append(hashlib.md5(raw).hexdigest())
                sizes.append(len(raw))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "modality": pdf["modality"],
                    "payload_bytes": sizes,
                    "payload_digest": digests,
                    "feature": feats,
                }
            )

    return df.mapInPandas(_extract, schema=FEATURE_SCHEMA)


def sample_frames(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling plan: one row per sampled timestamp.

    The *frame extraction itself* needs ffmpeg (not in container) — the
    returned plan carries (media_id, frame_ts_ms) rows ready for a
    registered ``video`` decoder; the expansion is pure Spark
    (``sequence`` + ``explode``), which is the scale-relevant part.
    """
    return (
        df.where(F.col("modality") == "video")
        .select(
            "media_id",
            F.explode(
                F.sequence(F.lit(0), F.greatest(F.col("duration_ms") - 1, F.lit(0)), F.lit(every_ms))
            ).alias("frame_ts_ms"),
        )
    )


def decode_or_raise(modality: str) -> Callable[[bytes], list[float]]:
    """Fetch the real decoder; raise if only the stub is available."""
    if modality not in _DECODER:
        raise NotImplementedError(
            f"no real decoder registered for {modality!r}; media libs are not "
            "available in this environment — register_decoder() in deployment"
        )
    return _DECODER[modality]


# ---------------------------------------------------------------------------
# REAL decoders (pure Python, no media libs): binary PGM and WAV PCM16.
# These are genuine byte→pixels / byte→samples parsers, registered via
# register_decoder() — the deployment hook stops being stub-only.
# Feature values are integer statistics chosen to stay exactly
# representable in float32 (|x| < 2^24), so the FEATURE_SCHEMA
# ArrayType(FloatType) round-trip is bit-exact and oracle-checkable.
# ---------------------------------------------------------------------------

def _parse_pgm(payload: bytes) -> tuple:
    """Binary-PGM (P5) parse shared by :func:`decode_pgm` and
    :func:`image_ahash_bands`: returns (width, height, maxval, raster)
    with the raster as the raw single-byte sequence."""
    if len(payload) < 2 or payload[0:2] != b"P5":
        raise ValueError("decode_pgm: not a binary PGM (missing P5 magic)")
    pos, fields = 2, []
    while len(fields) < 3:
        while pos < len(payload) and payload[pos] in b" \t\r\n":
            pos += 1
        if pos < len(payload) and payload[pos:pos + 1] == b"#":
            while pos < len(payload) and payload[pos] not in b"\r\n":
                pos += 1
            continue
        start = pos
        while pos < len(payload) and payload[pos] in b"0123456789":
            pos += 1
        if pos == start:
            raise ValueError("decode_pgm: malformed header")
        fields.append(int(payload[start:pos]))
    width, height, maxval = fields
    if not (0 < maxval < 256):
        raise ValueError(f"decode_pgm: unsupported maxval {maxval}")
    pos += 1  # exactly ONE whitespace byte separates header from raster
    raster = payload[pos:pos + width * height]
    if len(raster) != width * height:
        raise ValueError(
            f"decode_pgm: raster truncated ({len(raster)} of "
            f"{width * height} bytes)")
    return width, height, maxval, raster


def decode_pgm(payload: bytes) -> list[float]:
    """Decode a binary PGM (P5) image and return integer pixel stats.

    Full parse: 'P5' magic, whitespace/comment-tolerant ASCII header
    (width height maxval), exactly one whitespace byte, then the
    width*height single-byte raster (maxval < 256 only — the 2-byte
    raster variant is out of scope here).

    Feature layout (all integers, exact in float32 for rasters up to
    ~2^24/maxval² pixels): [width, height, maxval, n_px, px_sum,
    px_sumsq, px_min, px_max].
    """
    width, height, maxval, raster = _parse_pgm(payload)
    px_sum = sum(raster)
    px_sumsq = sum(v * v for v in raster)
    return [float(x) for x in (
        width, height, maxval, len(raster), px_sum, px_sumsq,
        min(raster), max(raster))]


def decode_wav_pcm16(payload: bytes) -> list[float]:
    """Decode a RIFF/WAVE PCM16 payload into per-channel sample stats.

    Full parse: RIFF/WAVE container with a proper chunk walk (word
    padding honored), 'fmt ' audio_format=1 / bits=16 validation,
    'data' chunk unpacked as interleaved little-endian int16 frames.

    Feature layout: [n_channels, sample_rate, n_frames] followed by
    [sum, sumsq, peak] per channel (exact in float32 for short clips
    at the amplitudes the catalog plants).
    """
    import struct

    if len(payload) < 12 or payload[0:4] != b"RIFF" \
            or payload[8:12] != b"WAVE":
        raise ValueError("decode_wav_pcm16: not a RIFF/WAVE payload")
    pos, fmt_chunk, data_chunk = 12, None, None
    while pos + 8 <= len(payload):
        cid = payload[pos:pos + 4]
        (size,) = struct.unpack("<I", payload[pos + 4:pos + 8])
        body = payload[pos + 8:pos + 8 + size]
        pos += 8 + size + (size & 1)  # chunks are word-aligned
        if cid == b"fmt ":
            fmt_chunk = body
        elif cid == b"data":
            data_chunk = body
    if fmt_chunk is None or data_chunk is None:
        raise ValueError("decode_wav_pcm16: missing fmt/data chunk")
    audio_fmt, n_ch, rate, _brate, _balign, bits = struct.unpack(
        "<HHIIHH", fmt_chunk[:16])
    if audio_fmt != 1 or bits != 16:
        raise ValueError(
            f"decode_wav_pcm16: only PCM16 supported "
            f"(fmt={audio_fmt}, bits={bits})")
    samples = struct.unpack(f"<{len(data_chunk) // 2}h",
                            data_chunk[:len(data_chunk) & ~1])
    if n_ch < 1 or len(samples) % n_ch:
        raise ValueError("decode_wav_pcm16: ragged final frame")
    feats = [float(n_ch), float(rate), float(len(samples) // n_ch)]
    for c in range(n_ch):
        ch = samples[c::n_ch]
        feats += [float(sum(ch)), float(sum(v * v for v in ch)),
                  float(max((abs(v) for v in ch), default=0))]
    return feats


def raw_frame_stats(
    media: DataFrame,
    width: int,
    height: int,
    frame_ms: int = 40,
    payload_col: str = "payload",
    id_col: str = "media_id",
    duration_col: str = "duration_ms",
) -> DataFrame:
    """Per-frame pixel statistics over RAW concatenated grayscale
    frames (the fixed-geometry plane layout video pipelines hand off
    after container demux) — computed ENTIRELY with native
    expressions: the payload is decoded to an ISO-8859-1 string once
    (byte i == code point i), each frame is sliced out ONCE with a
    single substring, split into per-pixel code points, and the pixel
    fold is `transform` + `aggregate` inside whole-stage codegen.
    No Python worker, no Arrow hop — the byte-level fast path that
    complements the registered-decoder path for formats that need a
    real parser.

    The payload is read once per media row and NEVER duplicated per
    frame (the frame loop is an array expression, not an explode-join),
    so a 2 GB clip costs one scan; only the narrow per-frame stat
    structs explode. Each pixel access is O(1): the per-frame substring
    is materialized once and then split — NOT per-pixel ``substr``
    against the whole payload, which is O(offset) per call on strings
    with code points > 127 (multi-byte in UTF-8) and would make the
    fold quadratic in payload size. Frame count comes from
    ``duration_col`` (an explicit column parameter) ``DIV frame_ms``,
    truncated to the frames actually present in the bytes.

    Returns (media_id, frame_idx, frame_ts_ms, px_sum, px_min, px_max).
    """
    sz = width * height
    s = F.decode(F.col(payload_col), "ISO-8859-1")
    n_from_dur = (F.col(duration_col) / frame_ms).cast("int")
    n_from_len = (F.length(s) / sz).cast("int")
    n_frames = F.least(n_from_dur, n_from_len)

    def frame_struct(f):
        # one O(sz) slice + one O(sz) split per frame: pixel access is
        # over the short frame string, never offset-indexed into the
        # full payload
        px = F.transform(
            F.split(s.substr(f * sz + 1, F.lit(sz)), ""), F.ascii)
        return F.struct(
            F.aggregate(px, F.lit(0), lambda acc, p: acc + p)
            .alias("px_sum"),
            F.array_min(px).alias("px_min"),
            F.array_max(px).alias("px_max"),
        )
    per_frame = F.when(
        n_frames > 0,
        F.transform(F.sequence(F.lit(0), n_frames - 1), frame_struct))
    return (
        media.select(
            F.col(id_col),
            F.posexplode(per_frame).alias("frame_idx", "_fs"))
        .select(
            id_col, "frame_idx",
            (F.col("frame_idx") * frame_ms).alias("frame_ts_ms"),
            F.col("_fs.px_sum").alias("px_sum"),
            F.col("_fs.px_min").alias("px_min"),
            F.col("_fs.px_max").alias("px_max"))
    )


# ---------------------------------------------------------------------------
# Perceptual average-hash (aHash): image near-duplicate detection.
# ---------------------------------------------------------------------------

def image_ahash_bands(
    media: DataFrame,
    id_col: str = "media_id",
    payload_col: str = "payload",
) -> DataFrame:
    """64-bit average hash of binary-PGM images, emitted as FOUR 16-bit
    band integers ``b0..b3`` — the image near-dup signature: bit k is 1
    iff 8x8 block (k//8, k%8)'s mean exceeds the global mean, decided
    with EXACT integer cross-multiplication (``block_sum * w * h >
    total_sum * block_px`` — no float thresholds, so any engine agrees
    bit-for-bit). Dimensions must be multiples of 8 (the upstream
    resize's contract; loud ValueError otherwise). Bands instead of one
    int64 because (a) the banded self-join consumes them directly and
    (b) 16-bit values sidestep sign-bit ambiguity across engines.

    One ``mapInPandas`` decode pass — Arrow-batched, executor-parallel,
    emits 4 small ints per image (the shuffle never carries pixels).
    """
    out_schema = (f"{id_col} long, b0 integer, b1 integer, "
                  "b2 integer, b3 integer")

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, bands = [], [[], [], [], []]
            for mid, payload in zip(pdf[id_col], pdf[payload_col]):
                w, h, _maxval, raster = _parse_pgm(bytes(payload))
                if w % 8 or h % 8:
                    raise ValueError(
                        f"image_ahash_bands: dimensions must be "
                        f"multiples of 8 after upstream resize, got "
                        f"{w}x{h} (media {mid})")
                bw, bh = w // 8, h // 8
                total = sum(raster)
                bits = []
                for r in range(8):
                    for c in range(8):
                        s = sum(raster[(r * bh + y) * w + c * bw + x]
                                for y in range(bh) for x in range(bw))
                        bits.append(int(s * w * h > total * bw * bh))
                ids.append(mid)
                for j in range(4):
                    bands[j].append(sum(
                        bits[16 * j + t] << t for t in range(16)))
            yield pd.DataFrame({
                id_col: ids, "b0": bands[0], "b1": bands[1],
                "b2": bands[2], "b3": bands[3]})

    return media.select(F.col(id_col), F.col(payload_col)) \
        .mapInPandas(fn, schema=out_schema)


def ahash_near_pairs(
    hashed: DataFrame,
    max_hamming: int = 3,
    id_col: str = "media_id",
) -> DataFrame:
    """Hamming-near pairs over :func:`image_ahash_bands` signatures:
    banded-equality blocking then exact XOR-popcount verify — the
    standard hamming LSH, RECALL-LOSSLESS here by pigeonhole: a pair at
    distance <= 3 differs in <= 3 of 64 bits, so at least one of the 4
    16-bit bands is untouched and the band join surfaces it
    (``max_hamming`` must stay < 4 for that guarantee; loud otherwise).

    Scale shape: candidates come from a hash join on (band_idx,
    band_value) — pair volume tracks genuine near-dup density, never
    |N|²; the verify is 4 integer XOR+popcounts per candidate.
    """
    if not 0 <= int(max_hamming) < 4:
        raise ValueError(
            f"max_hamming must be in 0..3 (4 bands are only "
            f"pigeonhole-lossless below 4), got {max_hamming}")
    bands = hashed.select(
        F.col(id_col).alias("_id"),
        F.stack(F.lit(4),
                F.lit(0), F.col("b0"), F.lit(1), F.col("b1"),
                F.lit(2), F.col("b2"), F.lit(3), F.col("b3"))
        .alias("_band", "_val"))
    cand = (
        bands.alias("x").join(
            bands.alias("y"),
            (F.col("x._band") == F.col("y._band"))
            & (F.col("x._val") == F.col("y._val"))
            & (F.col("x._id") < F.col("y._id")))
        .select(F.col("x._id").alias("id_a"),
                F.col("y._id").alias("id_b"))
        .distinct())
    ha = hashed.select(F.col(id_col).alias("id_a"),
                       *[F.col(f"b{j}").alias(f"_a{j}") for j in range(4)])
    hb = hashed.select(F.col(id_col).alias("id_b"),
                       *[F.col(f"b{j}").alias(f"_b{j}") for j in range(4)])
    ham = sum(F.bit_count(F.col(f"_a{j}").bitwiseXOR(F.col(f"_b{j}")))
              for j in range(4))
    return (cand.join(ha, "id_a").join(hb, "id_b")
            .select("id_a", "id_b", ham.alias("hamming"))
            .where(F.col("hamming") <= int(max_hamming)))
