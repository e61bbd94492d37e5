"""Chunking operator (P1): pages -> one row per (url, chunk_id).

Reference semantics: text_utils.py:5-46 driven by main.py:104-113. The word
windowing runs as ONE Arrow-batched ``mapInPandas`` pass that also fans out
chunks to rows python-side — measured here to beat ``posexplode`` over a
pandas-UDF array column by >5x (the generate-over-PythonUDF plan forces an
extra Python round-trip per row batch), and it keeps the whole operator a
single Python stage (worker spin-up is the dominant cost for small inputs).
Column pruning still reaches the scan: only (url, text) are read.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

from ..functions.text import chunk_text
from ..session import spread

CHUNKS_SCHEMA = "url string, chunk_id int, chunk_text string, n_words int"


def chunk_rows(url: str, text: str, chunk_size: int, overlap: int) -> list[dict]:
    """Chunk one document into row dicts; chunk_id is 1-based (main.py:154)."""
    return [
        {
            "url": url,
            "chunk_id": i + 1,
            "chunk_text": c,
            "n_words": len(c.split()),
        }
        for i, c in enumerate(chunk_text(text or "", chunk_size, overlap))
    ]


def chunk_pages(
    pages: DataFrame,
    chunk_size: int = 500,
    overlap: int = 50,
    url_col: str = "url",
    text_col: str = "text",
) -> DataFrame:
    """(url, text) -> (url, chunk_id, chunk_text, n_words)."""

    def batch_chunk(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = ["url", "chunk_id", "chunk_text", "n_words"]
        for pdf in batches:
            rows: list[dict] = []
            for url, text in zip(pdf["url"], pdf["text"]):
                rows.extend(chunk_rows(url, text, chunk_size, overlap))
            yield pd.DataFrame(rows, columns=cols)

    projected = spread(
        pages.select(pages[url_col].alias("url"), pages[text_col].alias("text"))
    )
    return projected.mapInPandas(batch_chunk, schema=CHUNKS_SCHEMA)
