"""Training-data preparation primitives: word-aligned chunking with
overlap and deterministic hash-based splitting (north-star extension —
no reference implementation; SURVEY §2B last rows).

Both are pure column expressions (sequence/explode/slice, md5 hex
arithmetic): no UDF, no RNG, no shuffle beyond what the caller adds —
the properties that make the prepared data reproducible across runs,
engines, and cluster sizes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def chunk_documents(
    docs: DataFrame,
    chunk: int = 20,
    stride: int = 15,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Word-aligned chunks of `chunk` words every `stride` words
    (overlap = chunk - stride). One Generate over pre-split word
    arrays: rows multiply by ~len/stride, bytes stay ~1x + overlap."""
    ws = F.filter(F.split(F.col(text_col), " "), lambda x: x != "")
    # start bound: len - overlap — a start past that yields a chunk fully
    # contained in its predecessor (every word already covered), so a
    # 20-word doc gets exactly one 20-word chunk, a 21-word doc two
    overlap = chunk - stride
    return (
        docs.select(id_col, ws.alias("ws"))
        .select(
            id_col,
            "ws",
            F.posexplode(
                F.sequence(
                    F.lit(1),
                    F.greatest(F.size("ws") - F.lit(overlap), F.lit(1)),
                    F.lit(stride),
                )
            ).alias("idx", "start"),
        )
        .select(
            id_col,
            F.col("idx").cast("int").alias("chunk_idx"),
            F.slice(
                F.col("ws"),
                F.col("start"),
                F.least(F.lit(chunk), F.size("ws") - F.col("start") + 1),
            ).alias("chunk_words"),
        )
        .filter(F.size("chunk_words") > 0)
        .select(
            id_col,
            "chunk_idx",
            F.size("chunk_words").cast("int").alias("n_words"),
            F.array_join("chunk_words", " ").alias("chunk_text"),
        )
    )


def hash_split(
    docs: DataFrame, train_buckets: int = 205, id_col: str = "doc_id"
) -> "F.Column":
    """Split assignment as a pure function of the id: first md5 byte <
    train_buckets/256 -> 'train' (default ~80/20). Returns the column
    expression so callers can attach it without a join."""
    h = F.md5(F.col(id_col).cast("string"))

    def hexpos(p: int) -> "F.Column":
        return F.instr(F.lit("0123456789abcdef"), F.substring(h, p, 1)) - 1

    bucket = hexpos(1) * 16 + hexpos(2)
    return F.when(bucket < train_buckets, "train").otherwise("test")
