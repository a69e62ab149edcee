"""Python UDTF coverage: a table function that chunks a document into
fixed-size token windows (the standard LLM-context chunking primitive).

UDTFs are row-at-a-time Python — the slow path. The JVM-side equivalent
(transform/slice over split(), as used by `functions.word_shingles`) is
what the hot path should use; this exists because chunk-explosion as a
*table function* is part of the engine's API surface, and some chunkers
genuinely need imperative Python (sentence models, tokenizers).
"""

from __future__ import annotations

from pyspark.sql.functions import udtf


@udtf(returnType="chunk_idx int, chunk string, n_tokens int")
class ChunkText:
    """Split a text into consecutive windows of `size` whitespace tokens."""

    def eval(self, text: str, size: int = 20):
        if size <= 0:
            raise ValueError(f"chunk_text: size must be positive, got {size}")
        if text is None:
            return
        toks = text.split(" ")
        for start in range(0, len(toks), size):
            window = toks[start : start + size]
            yield (start // size, " ".join(window), len(window))


def register_udtfs(spark) -> None:
    spark.udtf.register("chunk_text", ChunkText)
