"""Binary payload chunking: content reconstruction and geometry, plus a
quantization round-trip error-bound property."""

from __future__ import annotations

import hashlib

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

from bigdata_tag_system_spark.operators.multimodal import chunk_payloads


def _chunks_by_id(spark, rows, chunk_bytes):
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    out = chunk_payloads(df, chunk_bytes=chunk_bytes)
    got: dict[int, list] = {}
    for r in out.orderBy("media_id", "chunk_id").collect():
        got.setdefault(r["media_id"], []).append(r)
    return got


class TestChunkPayloads:
    def test_reconstruction_and_sizes(self, spark):
        payload = bytes(range(256)) * 3  # 768 bytes, non-UTF8 content
        got = _chunks_by_id(spark, [(1, payload)], 100)[1]
        assert [r["chunk_id"] for r in got] == list(range(8))
        assert [r["n_bytes"] for r in got] == [100] * 7 + [68]
        joined = b"".join(bytes(r["chunk"]) for r in got)
        assert hashlib.md5(joined).hexdigest() == hashlib.md5(payload).hexdigest()

    def test_empty_payload_single_empty_chunk(self, spark):
        got = _chunks_by_id(spark, [(1, b"")], 100)[1]
        assert len(got) == 1
        assert got[0]["chunk_id"] == 0 and got[0]["n_bytes"] == 0

    def test_null_payload_dropped(self, spark):
        got = _chunks_by_id(spark, [(1, b"abc"), (2, None)], 2)
        assert set(got) == {1}

    @settings(max_examples=8, deadline=None,
              suppress_health_check=[HealthCheck.function_scoped_fixture])
    @given(payload=st.binary(min_size=0, max_size=500),
           chunk_bytes=st.sampled_from([1, 7, 64, 100]))
    def test_property_lossless(self, spark, payload, chunk_bytes):
        got = _chunks_by_id(spark, [(1, payload)], chunk_bytes)[1]
        joined = b"".join(bytes(r["chunk"]) for r in got)
        assert joined == payload
        assert all(r["n_bytes"] <= chunk_bytes for r in got)
        expected_chunks = max(-(-len(payload) // chunk_bytes), 1)
        assert len(got) == expected_chunks


class TestQuantizeProperty:
    @settings(max_examples=8, deadline=None,
              suppress_health_check=[HealthCheck.function_scoped_fixture])
    @given(vecs=st.lists(
        st.lists(st.floats(min_value=-1e6, max_value=1e6,
                           allow_nan=False, allow_infinity=False,
                           width=32),
                 min_size=3, max_size=3),
        min_size=1, max_size=6))
    def test_round_trip_error_bound(self, spark, vecs):
        from bigdata_tag_system_spark.operators.embeddings import (
            dim_scales,
            quantize_embeddings,
        )

        df = spark.createDataFrame(
            [(i, v) for i, v in enumerate(vecs)],
            "vec_id long, embedding array<double>")
        scales = dim_scales(df).collect()[0]["scales"]
        got = {r["vec_id"]: r["qvec"] for r in quantize_embeddings(df).collect()}
        for i, v in enumerate(vecs):
            for d, x in enumerate(v):
                q, s = got[i][d], scales[d]
                assert -127 <= q <= 127
                if s > 0:
                    # floor(+0.5) round-half-up: dequantized value within
                    # half a quantization step of the original
                    assert abs(q * s / 127 - x) <= s / 127 * 0.5 + 1e-9 * s
                else:
                    assert q == 0 and x == 0.0
