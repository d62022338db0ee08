"""Document chunking — fixed token-window splitting with overlap, the
context-window preparation step of a pretraining / RAG pipeline (pair of
``packing.py``, which concatenates small docs; this splits large ones).

Not in the reference (no text ops in its 15 files); north-star extension
per SURVEY §2-C (training-data pipeline operators).

Scale: map-only — the chunk starts are a ``sequence()`` and the windows
are ``slice()``/``concat_ws`` inside whole-stage codegen, exploded
per-row.  No shuffle, no UDF, no driver state; output size is
``ceil(tokens/stride)`` rows per doc regardless of cluster width, so a
100 TB corpus chunks at scan speed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def chunk_documents(df: DataFrame, id_col: str, text_col: str,
                    chunk_size: int = 64, overlap: int = 0,
                    out_col: str = "chunk_text") -> DataFrame:
    """Split each document into whitespace-token windows of
    ``chunk_size`` tokens, consecutive windows sharing ``overlap``
    tokens.  Case is preserved (chunks feed a tokenizer, not a hash).

    Returns the input row (minus ``text_col``) plus ``chunk_idx``
    (0-based), ``out_col`` (the chunk text) and ``chunk_tokens``.
    Documents with no tokens produce no chunks.
    """
    if not 0 <= overlap < chunk_size:
        raise ValueError("need 0 <= overlap < chunk_size")
    stride = chunk_size - overlap
    words = F.filter(F.split(F.col(text_col), r"\s+"), lambda t: t != "")
    starts = F.sequence(F.lit(0),
                        F.greatest(F.size(words) - 1, F.lit(0)),
                        F.lit(stride))
    chunked = (df.withColumn("__ws", words)
                 .select("*", F.posexplode(starts).alias("chunk_idx", "__s"))
                 .withColumn("__chunk",
                             F.slice("__ws", F.col("__s") + 1, chunk_size))
                 .filter(F.size("__chunk") > 0)
                 .withColumn(out_col, F.concat_ws(" ", "__chunk"))
                 .withColumn("chunk_tokens", F.size("__chunk"))
                 .drop("__ws", "__s", "__chunk", text_col))
    return chunked
