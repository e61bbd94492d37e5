"""Text-analysis + multimodal plumbing + sources/sinks + streaming parity."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from ai_knowledge_graph_spark.operators.multimodal import (
    extract_media_metadata,
    sample_frames,
)
from ai_knowledge_graph_spark.operators.textstats import (
    fingerprints,
    language_id,
    quality_scores,
    token_counts,
)


@pytest.fixture(scope="module")
def text_docs(spark):
    rows = [
        (0, "the cat is on the mat and the dog is in the house", "en"),
        (1, "der hund ist gross und die katze ist klein zu haus", "de"),
        (2, "le chat est petit et la maison est grande les deux", "fr"),
        (3, "", "en"),
        (4, "word " * 150, "en"),
    ]
    return spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "text", "lang"]))


def test_language_id(spark, text_docs):
    got = {r["doc_id"]: r["pred_lang"] for r in language_id(text_docs).collect()}
    assert got[0] == "en" and got[1] == "de" and got[2] == "fr"
    assert got[3] == "en"  # empty -> default


def test_token_counts(spark, text_docs):
    got = {r["doc_id"]: (r["ws_tokens"], r["bpe_tokens"]) for r in token_counts(text_docs).collect()}
    assert got[0][0] == 13
    assert got[3] == (0, 0)
    assert got[4][0] == 150


def test_quality_scores_bounds(spark, text_docs):
    for r in quality_scores(text_docs).collect():
        assert 0.0 <= r["quality"] <= 1.0
        assert 0.0 <= r["stopword_ratio"] <= 1.0
    full = {r["doc_id"]: r for r in quality_scores(text_docs).collect()}
    assert full[4]["quality"] == 1.0  # 150 clean words
    assert full[3]["quality"] == 0.0


def test_fingerprints_stable_and_ws_insensitive(spark):
    rows = [(0, "a b  c d e"), (1, "a b c d e"), (2, "different words here again now")]
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "text"]))
    got = {r["doc_id"]: r for r in fingerprints(df).collect()}
    assert got[0]["content_sha256"] == got[1]["content_sha256"]
    assert got[0]["position_sketch"] == got[1]["position_sketch"]
    assert got[0]["content_sha256"] != got[2]["content_sha256"]


def test_media_metadata_deterministic(spark):
    rows = [
        ("m1", b"\x01\x02\x03\x04", "image"),
        ("m2", b"\x05\x06\x07\x08" * 100, "video"),
        ("m3", None, "image"),
    ]
    df = spark.createDataFrame(rows, "url string, payload binary, media_type string")
    out1 = {r["url"]: r for r in extract_media_metadata(df).collect()}
    out2 = {r["url"]: r for r in extract_media_metadata(df).collect()}
    assert out1.keys() == out2.keys() == {"m1", "m2", "m3"}
    for u in out1:
        assert out1[u]["sha256"] == out2[u]["sha256"]
        assert out1[u]["feature"] == out2[u]["feature"]
        assert len(out1[u]["feature"]) == 8
    assert out1["m2"]["media_type"] == "video" and out1["m2"]["n_frames"] >= 1
    assert out1["m1"]["n_frames"] == 1
    assert out1["m3"]["n_bytes"] == 0


def test_multimodal_stdlib_decoders_round_trip(spark):
    """Real decode, not the stub: BMP/PPM/PGM/WAV payloads built by the
    encoders come back with exactly the encoded parameters."""
    from ai_knowledge_graph_spark.operators.multimodal import (
        make_bmp,
        make_ppm,
        make_wav,
    )

    rows = [
        ("bmp1", make_bmp(17, 9, seed=3), "image"),
        ("ppm1", make_ppm(12, 7, seed=4), "image"),
        ("pgm1", make_ppm(5, 6, seed=5, gray=True), "image"),
        ("wav1", make_wav(16000, 1234, channels=2, seed=6), "audio"),
    ]
    df = spark.createDataFrame(rows, "url string, payload binary, media_type string")
    out = {r["url"]: r for r in extract_media_metadata(df).collect()}
    b = out["bmp1"]
    assert (b["codec"], b["width"], b["height"], b["n_channels"]) == ("bmp", 17, 9, 3)
    p = out["ppm1"]
    assert (p["codec"], p["width"], p["height"], p["n_channels"]) == ("ppm", 12, 7, 3)
    g = out["pgm1"]
    assert (g["codec"], g["width"], g["height"], g["n_channels"]) == ("ppm", 5, 6, 1)
    w = out["wav1"]
    assert (w["codec"], w["sample_rate"], w["n_channels"]) == ("wav", 16000, 2)
    assert w["n_frames"] == 1234
    assert w["duration_ms"] == 1234 * 1000 // 16000
    assert w["width"] is None and w["height"] is None


def test_multimodal_golden_bytes_no_spark():
    """Pin the header offsets independently of the encoders: hand-assembled
    bytes with known field values decode correctly (catches a symmetric
    encoder/decoder offset bug that a round-trip alone would miss)."""
    from ai_knowledge_graph_spark.operators.multimodal import _decode_payload

    # BMP: width=2 (0x02 LE at 18), height=-3 top-down (abs -> 3), bpp=32
    bmp = bytearray(54)
    bmp[0:2] = b"BM"
    bmp[18:22] = (2).to_bytes(4, "little", signed=True)
    bmp[22:26] = (-3).to_bytes(4, "little", signed=True)
    bmp[28:30] = (32).to_bytes(2, "little")
    m = _decode_payload(bytes(bmp), "image")
    assert (m["codec"], m["width"], m["height"], m["n_channels"]) == ("bmp", 2, 3, 4)

    # PPM with comment lines and odd whitespace in the header
    ppm = b"P6 # comment\n# another 99 88\n 21\t22 \n255\n" + b"\x00" * (3 * 21 * 22)
    m = _decode_payload(ppm, "image")
    assert (m["width"], m["height"], m["n_channels"]) == (21, 22, 3)

    # WAV with a LIST chunk BEFORE fmt/data (chunk walk, not fixed offsets);
    # 8-bit mono -> block align 1, 500 data bytes at 1000 Hz = 500 ms
    fmt = (
        (1).to_bytes(2, "little") + (1).to_bytes(2, "little")
        + (1000).to_bytes(4, "little") + (1000).to_bytes(4, "little")
        + (1).to_bytes(2, "little") + (8).to_bytes(2, "little")
    )
    wav = (
        b"RIFF" + (0).to_bytes(4, "little") + b"WAVE"
        + b"LIST" + (4).to_bytes(4, "little") + b"INFO"
        + b"fmt " + (16).to_bytes(4, "little") + fmt
        + b"data" + (500).to_bytes(4, "little") + b"\x00" * 500
    )
    m = _decode_payload(wav, "audio")
    assert (m["codec"], m["sample_rate"], m["n_channels"]) == ("wav", 1000, 1)
    assert m["n_frames"] == 500 and m["duration_ms"] == 500


def test_sample_frames(spark):
    df = spark.createDataFrame(
        [("v1", b"\x09" * 64)], "url string, payload binary"
    )
    frames = sample_frames(df, every_n=30).collect()
    assert len(frames) >= 1
    assert all(f["frame_idx"] % 30 == 0 for f in frames)
    # deterministic frame hashes
    again = sample_frames(df, every_n=30).collect()
    assert sorted(f["frame_sha256"] for f in frames) == sorted(f["frame_sha256"] for f in again)


def test_triples_json_round_trip(spark, tmp_path):
    from ai_knowledge_graph_spark.sources.triples_io import (
        read_triples_json,
        write_triples_json,
    )

    path = str(tmp_path / "triples.json")
    with open(path, "w") as f:
        f.write(
            """[
  {"subject": "a", "predicate": "p", "object": "b", "chunk": 1},
  {"subject": "a", "predicate": "p", "object": "none"},
  {"subject": "a", "predicate": "p", "object": "  "},
  {"subject": null, "predicate": "p", "object": "b"},
  {"subject": "x", "predicate": "q", "object": "y", "inferred": true}
]"""
        )
    df = read_triples_json(spark, path)
    rows = sorted((r["subject"], r["object"], r["chunk"], r["inferred"]) for r in df.collect())
    assert rows == [("a", "b", 1, False), ("x", "y", 0, True)]

    out = str(tmp_path / "out")
    write_triples_json(df, out)
    back = spark.read.json(out)
    assert back.count() == 2


def test_forcegraph_scan(spark, tmp_path):
    from ai_knowledge_graph_spark.sources.triples_io import read_forcegraph_json

    path = str(tmp_path / "fg.json")
    with open(path, "w") as f:
        f.write(
            '{"nodes": [{"id": "a", "type": "model", "definition": "d"}, {"id": "b"}],'
            ' "links": [{"source": "a", "target": "b", "relation": "uses"},'
            ' {"source": "b", "target": "a"}]}'
        )
    nodes, edges = read_forcegraph_json(spark, path)
    assert {r["entity"] for r in nodes.collect()} == {"a", "b"}
    got = sorted((r["src"], r["dst"], r["relation"]) for r in edges.collect())
    assert got == [("a", "b", "uses"), ("b", "a", "related")]


def test_neo4j_csv_export(spark, tmp_path):
    from ai_knowledge_graph_spark.graph.materialize import materialize_graph
    from ai_knowledge_graph_spark.sources.triples_io import export_neo4j_csv

    df = spark.createDataFrame(
        [{"subject": "a", "predicate": "p", "object": "b", "inferred": False,
          "url": None, "chunk": 1}],
        schema="subject string, predicate string, object string, inferred boolean, url string, chunk int",
    )
    nodes, edges = materialize_graph(df)
    out = str(tmp_path / "neo4j")
    export_neo4j_csv(nodes, edges, out)
    ncsv = spark.read.option("header", True).csv(f"{out}/nodes")
    ecsv = spark.read.option("header", True).csv(f"{out}/edges")
    assert ncsv.count() == 2 and ecsv.count() == 1
    assert ":START_ID" in ecsv.columns


def test_streaming_matches_batch(spark, tmp_path):
    from ai_knowledge_graph_spark.streaming.ingest import (
        windowed_event_counts_batch,
        windowed_event_counts_stream,
    )

    events_path = "/root/testdata/sf0.001/events.parquet"
    batch = windowed_event_counts_batch(spark, events_path)
    stream = windowed_event_counts_stream(spark, events_path)
    b = sorted(map(tuple, batch.collect()))
    s = sorted(map(tuple, stream.collect()))
    assert b == s and len(b) > 0


def test_streaming_extract_matches_batch(spark, tmp_path, pages_pdf):
    from ai_knowledge_graph_spark.operators.extraction import pages_to_raw_triples
    from ai_knowledge_graph_spark.streaming.ingest import stream_extract_pages

    pages_dir = str(tmp_path / "pages")
    out_dir = str(tmp_path / "stream_out")
    ckpt = str(tmp_path / "stream_ckpt")
    spark.createDataFrame(pages_pdf.head(20)).write.parquet(pages_dir)

    stream_extract_pages(spark, pages_dir, out_dir, ckpt, chunk_size=100, overlap=20)
    streamed = spark.read.parquet(out_dir)
    batch = pages_to_raw_triples(
        spark.read.parquet(pages_dir), 100, 20, stage_partitions=None
    )
    key = lambda df: sorted(  # noqa: E731
        (r["subject"], r["predicate"], r["object"], r["url"], r["chunk"], r["t_idx"])
        for r in df.collect()
    )
    assert key(streamed) == key(batch)


def test_classifier_score_exact_and_custom_weights(spark):
    from ai_knowledge_graph_spark.operators.textstats import classifier_score

    docs = spark.createDataFrame(
        [(0, "alpha beta alpha"), (1, "beta"), (2, "")],
        "doc_id long, text string",
    )
    # custom weights: hash buckets of 'alpha'/'beta' under dim=16
    import hashlib

    def bucket(tok):
        return int(hashlib.md5(tok.encode()).hexdigest()[:8], 16) % 16

    w = spark.createDataFrame(
        [(bucket("alpha"), 7), (bucket("beta"), -3)], "bucket long, weight long"
    )
    out = {
        r["doc_id"]: r
        for r in classifier_score(docs, weights=w, dim=16, bias=5).collect()
    }
    assert out[0]["raw_score"] == 5 + 7 + 7 - 3 and out[0]["n_tokens"] == 3
    assert out[1]["raw_score"] == 5 - 3
    # zero-token doc still scores (bias only)
    assert out[2]["raw_score"] == 5 and out[2]["n_tokens"] == 0
    # sigmoid of raw/1000
    import math

    for r in out.values():
        assert abs(r["score"] - 1 / (1 + math.exp(-r["raw_score"] / 1000))) < 1e-12


def test_classifier_score_default_weights_deterministic(spark):
    from ai_knowledge_graph_spark.operators.textstats import classifier_score

    docs = spark.createDataFrame(
        [(i, f"tok{i} tok{i+1} shared") for i in range(20)],
        "doc_id long, text string",
    )
    a = sorted(map(tuple, classifier_score(docs).collect()))
    b = sorted(map(tuple, classifier_score(docs).collect()))
    assert a == b and len(a) == 20


def test_multimodal_png_jpeg_round_trip(spark):
    """PNG (IHDR fixed offsets) and JPEG (SOFn marker scan) decode for
    real — parameters round-trip exactly, including grayscale channel
    counts, and the PNG byte size matches the level-0-deflate arithmetic
    the oracle uses."""
    from ai_knowledge_graph_spark.operators.multimodal import (
        extract_media_metadata,
        make_jpeg,
        make_png,
    )

    rows = [
        ("png1", make_png(33, 21, seed=3), "image"),
        ("png2", make_png(9, 5, seed=4, gray=True), "image"),
        ("jpg1", make_jpeg(640, 480, seed=5), "image"),
        ("jpg2", make_jpeg(31, 17, seed=6, gray=True, n_entropy=19), "image"),
    ]
    assert len(rows[0][1]) == 68 + 21 * (1 + 3 * 33)
    assert len(rows[3][1]) == 40 + 5 * 1 + 19
    df = spark.createDataFrame(rows, "url string, payload binary, media_type string")
    out = {r["url"]: r for r in extract_media_metadata(df).collect()}
    p = out["png1"]
    assert (p["codec"], p["width"], p["height"], p["n_channels"]) == ("png", 33, 21, 3)
    g = out["png2"]
    assert (g["codec"], g["width"], g["height"], g["n_channels"]) == ("png", 9, 5, 1)
    j = out["jpg1"]
    assert (j["codec"], j["width"], j["height"], j["n_channels"]) == ("jpeg", 640, 480, 3)
    k = out["jpg2"]
    assert (k["codec"], k["width"], k["height"], k["n_channels"]) == ("jpeg", 31, 17, 1)
    for r in (p, g, j, k):
        assert r["n_frames"] == 1 and r["sample_rate"] is None


def test_multimodal_png_jpeg_golden_bytes_no_spark():
    """Header-offset pins independent of the encoders: a real-world-shaped
    JPEG whose SOF0 sits behind APP0+DQT+DHT segments and restart/fill
    bytes, and a PNG IHDR assembled by hand."""
    from ai_knowledge_graph_spark.operators.multimodal import _decode_payload

    png = bytearray(b"\x89PNG\r\n\x1a\n")
    png += (13).to_bytes(4, "big") + b"IHDR"
    png += (777).to_bytes(4, "big") + (55).to_bytes(4, "big")
    png += bytes([8, 6, 0, 0, 0]) + b"\x00" * 4  # RGBA, bogus CRC is fine
    m = _decode_payload(bytes(png), "image")
    assert (m["codec"], m["width"], m["height"], m["n_channels"]) == ("png", 777, 55, 4)

    jpg = bytearray(b"\xff\xd8")
    jpg += b"\xff\xe0" + (16).to_bytes(2, "big") + b"JFIF\x00" + b"\x00" * 9  # APP0
    jpg += b"\xff\xdb" + (67).to_bytes(2, "big") + b"\x00" * 65  # DQT
    jpg += b"\xff\xc4" + (21).to_bytes(2, "big") + b"\x00" * 19  # DHT (skip: not SOF)
    jpg += b"\xff\xff"  # fill byte before marker
    jpg += b"\xff\xc2" + (11).to_bytes(2, "big")  # SOF2 (progressive)
    jpg += bytes([8]) + (1080).to_bytes(2, "big") + (1920).to_bytes(2, "big")
    jpg += bytes([3]) + b"\x01\x11\x00"
    m = _decode_payload(bytes(jpg), "image")
    assert (m["codec"], m["width"], m["height"], m["n_channels"]) == (
        "jpeg", 1920, 1080, 3,
    )

    # JPEG with no SOF anywhere (SOI+EOI only) -> documented stub path
    m = _decode_payload(b"\xff\xd8\xff\xd9", "image")
    assert m["codec"] == "stub"
