"""Streaming MinHash-LSH candidate generation (stateful band buckets).

Near-dup detection AT INGEST: each arriving document's MinHash signature
is computed with the same per-row expressions as the batch operator
(`operators.dedup`), exploded to LSH band buckets, and matched against a
**stateful band-bucket store** (``applyInPandasWithState`` keyed by
(band_id, band_hash)). A new document emits one candidate pair per
previously-seen bucket member; exact-Jaccard verification then runs in
``foreachBatch`` with the batch verifier — LSH prunes, exact decides,
same contract as batch.

Scale/state design:

- State is keyed by bucket, value = the doc ids seen in that bucket
  within the watermark horizon (long array). EventTimeTimeout purges a
  bucket once the watermark passes its last arrival + horizon, so state
  is O(docs in horizon × bands), not O(corpus).
- Hot buckets (stop-phrase shingles) self-limit via ``max_bucket_size``:
  a bucket past the cap stops emitting pairs (it would be pruned by the
  verifier anyway — a bucket shared by thousands of docs carries almost
  no similarity signal) and logs through the emitted ``overflow`` flag.
"""

from __future__ import annotations

from typing import Iterator, Tuple

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    LongType,
    StructField,
    StructType,
)

CANDIDATE_SCHEMA = StructType(
    [
        StructField("id_a", LongType()),
        StructField("id_b", LongType()),
        StructField("band_id", LongType()),
        StructField("overflow", BooleanType()),
    ]
)

_STATE_SCHEMA = StructType(
    [
        StructField("ids", ArrayType(LongType())),
        StructField("last_ms", LongType()),
    ]
)


def _bucket_fn_factory(max_bucket_size: int, horizon_ms: int):
    def fn(
        key: Tuple[int, int],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        band_id = int(key[0])

        if state.hasTimedOut:
            state.remove()
            return

        rows = pd.concat(list(pdfs), ignore_index=True)
        new_ids = rows["doc_id"].astype("int64").drop_duplicates().to_list()
        ts_ms = int(rows["ts"].astype("int64").max() // 1_000_000)

        if state.exists:
            seen, last = list(state.get[0]), int(state.get[1])
        else:
            seen, last = [], ts_ms

        pairs_a, pairs_b, flags = [], [], []
        known = set(seen)
        overflowed = False
        for b in new_ids:
            if b in known:
                continue
            if len(seen) >= max_bucket_size:
                overflowed = True
                break
            for a in seen:
                lo, hi = (a, b) if a < b else (b, a)
                pairs_a.append(lo)
                pairs_b.append(hi)
                flags.append(False)
            seen.append(b)
            known.add(b)
        if overflowed:
            # report once per batch that this bucket hit its cap
            pairs_a.append(-1)
            pairs_b.append(-1)
            flags.append(True)

        state.update((seen, max(last, ts_ms)))
        state.setTimeoutTimestamp(max(last, ts_ms) + horizon_ms)
        if pairs_a:
            yield pd.DataFrame(
                {
                    "id_a": pairs_a,
                    "id_b": pairs_b,
                    "band_id": [band_id] * len(pairs_a),
                    "overflow": flags,
                }
            )

    return fn


def streaming_minhash_candidates(
    stream: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    ts_col: str = "ts",
    num_hashes: int = 32,
    bands: int = 16,
    shingle_n: int = 3,
    watermark: str = "1 hour",
    max_bucket_size: int = 64,
) -> DataFrame:
    """(id_a, id_b, band_id, overflow) candidate pairs over a doc stream.

    Downstream: ``.where(~overflow).select(id_a, id_b).dropDuplicates()``
    then exact-Jaccard verification per micro-batch (``foreachBatch`` +
    :func:`operators.dedup.jaccard_on_pairs`).
    """
    from bigdata_tag_system_spark.functions.text import shingles_from_tokens, tokens
    from bigdata_tag_system_spark.operators.dedup import _check_bands
    from bigdata_tag_system_spark.streaming.rule_stream import ensure_event_time

    _check_bands(num_hashes, bands)
    r = num_hashes // bands
    prepared = (
        ensure_event_time(stream, ts_col).withWatermark(ts_col, watermark)
        .select(
            F.col(id_col).cast("long").alias("doc_id"),
            F.col(ts_col).alias("ts"),
            tokens(text_col).alias("_t"),
        )
        .select(
            "doc_id", "ts", shingles_from_tokens("_t", shingle_n).alias("_sh"))
        .select(
            "doc_id", "ts",
            F.transform("_sh", lambda s: F.xxhash64(s)).alias("_hs"))
    )

    def one(seed: int):
        # unary lambda only: pyspark binds a second lambda param to the
        # array index, which would silently replace the seed
        return F.array_min(F.transform("_hs", lambda h: F.xxhash64(h, F.lit(seed))))

    with_sig = prepared.select(
        "doc_id", "ts",
        F.array(*[one(i) for i in range(num_hashes)]).alias("_sig"),
    )
    band_structs = F.array(
        *[
            F.struct(
                F.lit(b).cast("long").alias("band_id"),
                F.xxhash64(F.slice("_sig", b * r + 1, r)).alias("band_hash"),
            )
            for b in range(bands)
        ]
    )
    banded = with_sig.select(
        "doc_id", "ts", F.explode(band_structs).alias("b")
    ).select("doc_id", "ts", "b.band_id", "b.band_hash")

    # parse "N unit" horizon for the state TTL (same unit table as range_join)
    qty, _, unit = watermark.partition(" ")
    horizon_ms = int(qty) * {
        "second": 1, "seconds": 1, "minute": 60, "minutes": 60,
        "hour": 3600, "hours": 3600, "day": 86400, "days": 86400,
    }[unit] * 1000

    return banded.groupBy("band_id", "band_hash").applyInPandasWithState(
        _bucket_fn_factory(max_bucket_size, horizon_ms),
        CANDIDATE_SCHEMA,
        _STATE_SCHEMA,
        "append",
        GroupStateTimeout.EventTimeTimeout,
    )
