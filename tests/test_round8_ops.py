"""Round-8 operators: real multimodal decoders (binary PGM, WAV PCM16)
and their Spark-side decode pipeline."""
from __future__ import annotations

import struct

import pyspark.sql.functions as F
import pytest

from bigdata_tag_system_spark.operators.multimodal import (
    decode_pgm,
    decode_wav_pcm16,
)


def _pgm(width, height, pixels, maxval=255, comment=False):
    head = b"P5\n"
    if comment:
        head += b"# a comment line\n"
    head += f"{width} {height}\n{maxval}\n".encode()
    return head + bytes(pixels)


def _wav(frames, n_ch=2, rate=8000):
    """frames: list of per-frame tuples (one int16 per channel)."""
    data = b"".join(struct.pack("<h", s) for fr in frames for s in fr)
    hdr = (
        b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVEfmt "
        + struct.pack("<IHHIIHH", 16, 1, n_ch, rate,
                      rate * n_ch * 2, n_ch * 2, 16)
        + b"data" + struct.pack("<I", len(data))
    )
    return hdr + data


class TestDecodePgm:
    def test_decodes_known_raster(self):
        px = [0, 255, 10, 20, 30, 40]
        f = decode_pgm(_pgm(3, 2, px))
        assert f[:4] == [3.0, 2.0, 255.0, 6.0]
        assert f[4] == float(sum(px))
        assert f[5] == float(sum(v * v for v in px))
        assert (f[6], f[7]) == (0.0, 255.0)

    def test_header_comments_and_whitespace(self):
        f = decode_pgm(_pgm(2, 2, [9, 9, 9, 9], comment=True))
        assert f[:2] == [2.0, 2.0] and f[4] == 36.0

    def test_raster_may_contain_whitespace_bytes(self):
        # pixel values 10/32 are \n/space — the raster parse must be
        # positional, not token-based
        f = decode_pgm(_pgm(2, 1, [10, 32]))
        assert f[4] == 42.0

    def test_rejects_bad_magic_and_truncation(self):
        with pytest.raises(ValueError, match="P5"):
            decode_pgm(b"P6\n1 1\n255\nx")
        with pytest.raises(ValueError, match="truncated"):
            decode_pgm(b"P5\n4 4\n255\nab")
        with pytest.raises(ValueError, match="maxval"):
            decode_pgm(b"P5\n1 1\n65535\n\x00\x00")


class TestDecodeWavPcm16:
    def test_decodes_stereo_stats(self):
        frames = [(100, -50), (-100, 50), (7, 0)]
        f = decode_wav_pcm16(_wav(frames))
        assert f[:3] == [2.0, 8000.0, 3.0]
        # ch0: 100,-100,7   ch1: -50,50,0
        assert f[3:6] == [7.0, float(100**2 + 100**2 + 49), 100.0]
        assert f[6:9] == [0.0, float(50**2 + 50**2), 50.0]

    def test_mono_and_extreme_amplitudes(self):
        f = decode_wav_pcm16(_wav([(-32768,), (32767,)], n_ch=1,
                                  rate=44100))
        assert f[:3] == [1.0, 44100.0, 2.0]
        assert f[5] == 32768.0  # peak uses abs of the most negative

    def test_chunk_walk_skips_unknown_chunks(self):
        w = _wav([(5, 6)])
        # splice an odd-sized LIST chunk (forces word-align padding)
        # between the header and fmt/data
        extra = b"LIST" + struct.pack("<I", 3) + b"abc\x00"
        spliced = w[:12] + extra + w[12:]
        f = decode_wav_pcm16(spliced)
        assert f[2] == 1.0 and f[3] == 5.0 and f[6] == 6.0

    def test_rejects_non_wav_and_non_pcm16(self):
        with pytest.raises(ValueError, match="RIFF"):
            decode_wav_pcm16(b"OggS" + b"\x00" * 40)
        bad = _wav([(1, 1)])
        # rewrite bits-per-sample 16 -> 8 in the fmt chunk
        bad = bad[:34] + struct.pack("<H", 8) + bad[36:]
        with pytest.raises(ValueError, match="PCM16"):
            decode_wav_pcm16(bad)


class TestDecodePipeline:
    def test_registry_decode_roundtrip_in_spark(self, spark):
        # end-to-end: payloads built by Spark expressions, decoded by
        # the REGISTERED parser (not the stub) inside mapInPandas
        from bigdata_tag_system_spark.operators.multimodal import (
            extract_features, register_decoder)

        register_decoder("pgm", decode_pgm)
        media = spark.createDataFrame(
            [(1, "pgm", _pgm(3, 2, [1, 2, 3, 4, 5, 6]), "image/pgm",
              3, 2, None)],
            "media_id long, modality string, payload binary, "
            "mime_type string, width int, height int, duration_ms int")
        row = extract_features(media).first()
        feats = [float(x) for x in row["feature"]]
        assert feats[:4] == [3.0, 2.0, 255.0, 6.0]
        assert feats[4] == 21.0 and feats[5] == 91.0

    def test_catalog_generators_match_python_decoders(self, spark):
        # the closed-form DuckDB oracle is only honest if the planted
        # Spark payloads ARE valid PGM/WAV: cross-check one decoded
        # row of each catalog query against a pure-Python replay
        import __spark_entry__ as e

        sf = "/root/testdata/sf0.001"
        img = e.queries()["mm_decode_features"](spark, sf).first()
        m = img["media_id"]
        w, h = 8 + m % 5, 6 + m % 4
        px = [(m * 31 + i * 7) % 256 for i in range(w * h)]
        assert (img["width"], img["height"]) == (w, h)
        assert img["px_sum"] == sum(px)
        assert img["px_sumsq"] == sum(v * v for v in px)

        au = e.queries()["mm_decode_audio"](spark, sf).first()
        m = au["media_id"]
        nf = 40 + m % 23
        sm = [((m * 7 + i * 13) % 512) - 256 for i in range(2 * nf)]
        assert au["n_frames"] == nf
        assert au["ch0_sum"] == sum(sm[0::2])
        assert au["ch1_sumsq"] == sum(v * v for v in sm[1::2])
        assert au["ch1_peak"] == max(abs(v) for v in sm[1::2])
