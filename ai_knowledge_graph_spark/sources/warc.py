"""WARC (Web ARChive, ISO 28500) source — the Common Crawl container.

A WARC file is a concatenation of records, each:

    WARC/1.0\\r\\n
    <Name>: <value>\\r\\n ...          (headers, incl. Content-Length)
    \\r\\n
    <Content-Length bytes of block>\\r\\n\\r\\n

Common Crawl ships three record types per capture (request / response /
metadata) plus a leading warcinfo. The reference repo reads loose text
files (main.py:283-284); a web-scale ingest starts from WARC, so this
source exists per the brief's webtext mandate.

Scale shape: WARC is not line-splittable — the unit of parallelism is the
FILE, which is exactly how Common Crawl shards its corpus (~1 GB gzipped
segments, ~80k files per crawl; at 1000 executors each task parses a
handful of files). ``spark.read.format("binaryFile")`` gives one row per
file; parsing runs in an Arrow-batched ``mapInPandas`` with pure-stdlib
byte arithmetic (no warcio dependency — the record grammar above is 30
lines), and the emitted rows carry only headers + the response payload,
never the raw file twice. Gzip members (.warc.gz) are handled per-file
via zlib when the magic bytes say so.
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql import DataFrame, SparkSession

WARC_SCHEMA = (
    "file string, record_idx int, warc_type string, record_id string, "
    "target_uri string, warc_date string, content_type string, "
    "content_length long, body binary"
)


def parse_warc_bytes(data: bytes) -> list[dict]:
    """Pure-stdlib WARC record parser (version line, headers,
    Content-Length-delimited block). Tolerates \\n-only line endings and
    trailing garbage; raises ValueError on a record with no
    Content-Length (the format makes it mandatory)."""
    if data[:2] == b"\x1f\x8b":  # gzipped (possibly multi-member)
        import zlib

        out = bytearray()
        d = zlib.decompressobj(wbits=31)
        buf = data
        while buf:
            out += d.decompress(buf)
            buf = d.unused_data
            if buf:
                d = zlib.decompressobj(wbits=31)
            elif not d.eof:
                break
        data = bytes(out)
    records = []
    pos = 0
    n = len(data)
    while True:
        pos = data.find(b"WARC/", pos)
        if pos < 0 or pos >= n:
            break
        hdr_end = data.find(b"\r\n\r\n", pos)
        sep_len = 4
        if hdr_end < 0:
            hdr_end = data.find(b"\n\n", pos)
            sep_len = 2
        if hdr_end < 0:
            break
        headers: dict[str, str] = {}
        lines = data[pos:hdr_end].replace(b"\r\n", b"\n").split(b"\n")
        for ln in lines[1:]:
            k, _, v = ln.partition(b":")
            if _:
                headers[k.strip().decode("ascii", "replace").lower()] = (
                    v.strip().decode("utf-8", "replace")
                )
        if "content-length" not in headers:
            raise ValueError("WARC record without Content-Length")
        clen = int(headers["content-length"])
        body_start = hdr_end + sep_len
        records.append(
            {
                "warc_type": headers.get("warc-type", ""),
                "record_id": headers.get("warc-record-id", ""),
                "target_uri": headers.get("warc-target-uri", ""),
                "warc_date": headers.get("warc-date", ""),
                "content_type": headers.get("content-type", ""),
                "content_length": clen,
                "body": data[body_start : body_start + clen],
            }
        )
        pos = body_start + clen
    return records


def read_warc(spark: SparkSession, path: str) -> DataFrame:
    """One row per WARC record under ``path`` (glob ok; .warc / .warc.gz).

    Columns: (file, record_idx, warc_type, record_id, target_uri,
    warc_date, content_type, content_length, body).
    """
    import pandas as pd

    files = spark.read.format("binaryFile").load(path).select("path", "content")

    def parse(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            rows = []
            for fname, blob in zip(pdf["path"], pdf["content"]):
                for i, rec in enumerate(parse_warc_bytes(bytes(blob))):
                    rows.append({"file": fname, "record_idx": i, **rec})
            yield pd.DataFrame(
                rows,
                columns=[
                    "file",
                    "record_idx",
                    "warc_type",
                    "record_id",
                    "target_uri",
                    "warc_date",
                    "content_type",
                    "content_length",
                    "body",
                ],
            )

    return files.mapInPandas(parse, schema=WARC_SCHEMA)


def warc_responses_to_pages(records: DataFrame) -> DataFrame:
    """(url, text) pages from response records: strip the HTTP header
    block from each body (bytes up to the first blank line) and decode
    the payload as UTF-8 (replace errors) — the hand-off shape for
    chunk_pages / html_extract. JVM-side split, no second Python pass."""
    from pyspark.sql import functions as F

    resp = records.filter(F.col("warc_type") == "response")
    body_str = F.decode(F.col("body"), "UTF-8")
    payload = F.when(
        F.instr(body_str, "\r\n\r\n") > 0,
        F.expr("substring(decode(body, 'UTF-8'), instr(decode(body, 'UTF-8'), '\\r\\n\\r\\n') + 4)"),
    ).otherwise(body_str)
    return resp.select(
        F.col("target_uri").alias("url"), payload.alias("text")
    )
