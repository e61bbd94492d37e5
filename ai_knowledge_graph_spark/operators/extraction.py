"""Phase-1 extraction (P2/P3): chunks -> raw triples, batched per partition.

The reference loops chunks sequentially through a blocking LLM HTTP call
(main.py:142-160, llm.py:6-61) — latency-bound, single-threaded. Here the
whole phase is one ``mapInPandas`` over chunk partitions: each Arrow batch is
scored by the deterministic extractor (functions/extract.py), then the same
validation (main.py:61-66), predicate truncation (main.py:76-77) and chunk
tagging (main.py:154-155) are applied inline. An LLM-response-shaped ingest
path (``triples_from_llm_responses``) covers the JSON-repair surface
(llm.py:63-163) for inputs that carry raw model output instead of text.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.extract import extract_triples
from ..functions.jsonrepair import extract_json_from_text
from ..functions.text import limit_predicate_length

# Raw triples keep (url, chunk, t_idx) as the stable stand-in for the
# reference's list position — every downstream "last wins" rule orders on it.
RAW_TRIPLES_SCHEMA = (
    "subject string, predicate string, object string, "
    "url string, chunk int, t_idx int, inferred boolean"
)


def _rows_from_parsed(parsed, url: str, chunk_id: int) -> list[dict]:
    """Validate + truncate + tag one chunk's parsed triples (main.py:61-77,154)."""
    rows: list[dict] = []
    if not isinstance(parsed, list):
        return rows
    t_idx = 0
    for item in parsed:
        if not (
            isinstance(item, dict)
            and "subject" in item
            and "predicate" in item
            and "object" in item
        ):
            continue  # invalid-triple filter, main.py:61-66
        rows.append(
            {
                "subject": item["subject"],
                "predicate": limit_predicate_length(str(item["predicate"])),
                "object": item["object"],
                "url": url,
                "chunk": chunk_id,
                "t_idx": t_idx,
                "inferred": False,
            }
        )
        t_idx += 1
    return rows


def extract_from_chunks(chunks: DataFrame) -> DataFrame:
    """(url, chunk_id, chunk_text) -> raw triples via batched extraction."""

    def batch_extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = ["subject", "predicate", "object", "url", "chunk", "t_idx", "inferred"]
        for pdf in batches:
            rows: list[dict] = []
            for url, cid, text in zip(pdf["url"], pdf["chunk_id"], pdf["chunk_text"]):
                rows.extend(_rows_from_parsed(extract_triples(text or ""), url, int(cid)))
            yield pd.DataFrame(rows, columns=cols)

    return chunks.select("url", "chunk_id", "chunk_text").mapInPandas(
        batch_extract, schema=RAW_TRIPLES_SCHEMA
    )


def triples_from_llm_responses(responses: DataFrame) -> DataFrame:
    """(url, chunk_id, response) raw LLM output strings -> raw triples.

    Runs the JSON extraction/repair ladder (llm.py:63-163) per response
    inside the same batched operator, then the identical validation path.
    Objects that parse as lists are flattened one row per element
    (scripts/clean_graph.py:104-115 semantics).
    """

    def batch_parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = ["subject", "predicate", "object", "url", "chunk", "t_idx", "inferred"]
        for pdf in batches:
            rows: list[dict] = []
            for url, cid, resp in zip(pdf["url"], pdf["chunk_id"], pdf["response"]):
                parsed = extract_json_from_text(resp or "")
                flattened = []
                if isinstance(parsed, list):
                    for item in parsed:
                        if isinstance(item, dict) and isinstance(item.get("object"), list):
                            for obj in item["object"]:
                                flattened.append(
                                    dict(item, object="" if obj is None else str(obj))
                                )
                        else:
                            flattened.append(item)
                rows.extend(_rows_from_parsed(flattened, url, int(cid)))
            yield pd.DataFrame(rows, columns=cols)

    return responses.select("url", "chunk_id", "response").mapInPandas(
        batch_parse, schema=RAW_TRIPLES_SCHEMA
    )


def pages_to_raw_triples(
    pages: DataFrame,
    chunk_size: int = 500,
    overlap: int = 50,
    lang_filter: str | None = "en",
    stage_partitions: int | None = None,
) -> DataFrame:
    """Full Phase 1: pages -> chunks -> raw triples.

    ``lang_filter`` keeps only pages of one language (the reference is
    monolingual; non-matching rows pass through unprocessed). The filter and
    the (url, text) projection both push down into the parquet scan. The
    explicit repartition before extraction is the extract-stage boundary
    (north_rule): it spreads documents evenly across executors so the
    Python-UDF work — the pipeline's hot loop — is balanced regardless of
    input file layout.

    Chunking + extraction run FUSED in one ``mapInPandas`` pass: one Python
    stage, one Arrow round-trip — chunk text never crosses the language
    boundary twice. (``chunk_pages`` + ``extract_from_chunks`` compose to the
    same result when the intermediate chunk table is wanted.)
    """
    from .chunking import chunk_rows  # local import to avoid cycle

    if lang_filter is not None:
        pages = pages.filter(F.col("lang") == lang_filter)
    projected = pages.select("url", "text")
    if stage_partitions:
        projected = projected.repartition(stage_partitions, "url")

    def batch_chunk_extract(batches):
        cols = ["subject", "predicate", "object", "url", "chunk", "t_idx", "inferred"]
        for pdf in batches:
            rows: list[dict] = []
            for url, text in zip(pdf["url"], pdf["text"]):
                for ch in chunk_rows(url, text, chunk_size, overlap):
                    rows.extend(
                        _rows_from_parsed(
                            extract_triples(ch["chunk_text"]), url, ch["chunk_id"]
                        )
                    )
            yield pd.DataFrame(rows, columns=cols)

    return projected.mapInPandas(batch_chunk_extract, schema=RAW_TRIPLES_SCHEMA)
