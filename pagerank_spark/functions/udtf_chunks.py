"""Python UDTF surface (Spark 4 ``pyspark.sql.functions.udtf``).

The engine's position on UDTFs mirrors its UDF position: the pure
Catalyst form wins whenever it exists (``text.chunk_documents`` is the
production chunker — ``sequence``+``slice``, zero shuffle, codegen).
But Spark 4's user-defined TABLE functions are part of the API surface
a reference user expects, and the right demonstration is one whose
semantics are already pinned by a Catalyst operator — so the UDTF can
be tested EQUAL to the declarative plan, the same twin-engine pattern
as ``groupwise_zscore``'s window/pandas pair.

``ChunkTextUDTF`` re-implements sliding-window chunking row-at-a-time
(eval() yields one row per chunk — the LATERAL-join shape:
``SELECT ... FROM docs, LATERAL chunk_text(doc_id, text, 64, 8)``).
Registered under the name ``chunk_text``.
"""

from __future__ import annotations

import re

from pyspark.sql.functions import udtf

_TOKEN_SPLIT = re.compile(r"\s+")


@udtf(returnType="chunk_id INT, n_chunk_toks INT, chunk_text STRING")
class ChunkTextUDTF:
    """Yield (chunk_id, n_chunk_toks, chunk_text) windows over a
    document's whitespace tokens — chunk_tokens-sized windows with
    overlap_tokens shared context, matching ``text.chunk_documents``
    (documents with no tokens yield nothing; the final window may be
    short; one window when the document fits)."""

    def eval(self, text: str, chunk_tokens: int, overlap_tokens: int):
        if overlap_tokens >= chunk_tokens:
            raise ValueError("overlap_tokens must be < chunk_tokens")
        toks = [t for t in _TOKEN_SPLIT.split(text or "") if t]
        n = len(toks)
        if n == 0:
            return
        step = chunk_tokens - overlap_tokens
        n_chunks = max(1, -(-(n - overlap_tokens) // step))
        for i in range(n_chunks):
            window = toks[i * step : i * step + chunk_tokens]
            yield i, len(window), " ".join(window)


def register(spark) -> None:
    """Register the UDTF as ``chunk_text`` for SQL LATERAL use."""
    spark.udtf.register("chunk_text", ChunkTextUDTF)
