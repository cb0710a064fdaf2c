"""The composed corpus-cleaning pipeline — the funnel a training-data
job actually runs, chaining the individually-oracle-gated stages:

    C4 page cleaning  ->  corpus paragraph dedup  ->  quality gate

Each stage is the SAME operator the driver gates one-by-one
(functions/text_analysis.c4_clean, operators/dedup.paragraph_dedup,
functions/text_analysis.quality_filter), so this module adds exactly
one thing: the composition contract — which column feeds which stage,
which rows drop where, and a funnel accounting that costs one job.

Scale shape: c4_clean and quality_filter are map-only (fuse into the
scan); paragraph_dedup contributes the pipeline's only shuffles. The
funnel stats run as ONE aggregate over the final frame (per-stage
booleans are carried as columns, not separate passes), so accounting
does not re-scan the corpus per stage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def clean_corpus(
    df: DataFrame,
    key: str,
    content: str,
    min_words: int = 3,
    min_lines: int = 3,
    quality: bool = True,
    pos_bits: int = 20,
) -> DataFrame:
    """Run the full cleaning funnel. Returns ONE ROW PER INPUT
    DOCUMENT (dropped documents stay visible with their drop stage)
    with:

      key, c4_kept, n_paragraphs_clean, n_paragraphs_final,
      quality_kept, final_kept, text_final

    - c4_kept: survived C4 page cleaning (its text is the C4-cleaned
      lines).
    - n_paragraphs_clean / n_paragraphs_final: paragraph counts into /
      out of corpus-level paragraph dedup (C4-dropped pages never
      enter the dedup — their boilerplate must not claim
      first-occurrence slots from surviving pages).
    - quality_kept: the Gopher-style quality_filter verdict on the
      DEDUPED text (NULL-safe false when the doc never reached it).
    - final_kept: the conjunction; text_final is '' unless final_kept.

    Keeping dropped rows makes the funnel auditable downstream
    (`GROUP BY c4_kept, quality_kept` is the funnel report) and keeps
    this a map-join-only composition.

    The paragraph granularity is deliberately C4's LINE granularity
    ('\\n' — c4_clean rejoins kept lines with it, so no other
    separator can survive into the dedup stage; a configurable sep
    here would silently degrade dedup to whole-document granularity).
    `key` must be integral and non-negative (paragraph_dedup's packed
    first-occurrence law; pre-map string keys — URLs — to BIGINT);
    `pos_bits` forwards to it for very long documents.

    Plan-shape warning (inherited from quality_filter): a Filter placed
    DIRECTLY above this frame on final_kept is rewritten through the
    quality ladder by PushDownPredicates, re-expanding the tokenize
    subtree per rule. Consume via aggregates (funnel_stats), write the
    frame before filtering, or filter on a materialized copy."""
    from pyspark.sql.types import IntegralType

    from spider_engine_spark.functions.text_analysis import (
        c4_clean,
        quality_filter,
    )
    from spider_engine_spark.operators.dedup import paragraph_dedup

    key_type = df.schema[key].dataType
    if not isinstance(key_type, IntegralType):
        raise TypeError(
            f"clean_corpus needs a numeric key (the paragraph-dedup "
            f"stage orders occurrences by a packed (key,pos) BIGINT); "
            f"{key!r} is {key_type.simpleString()} — pre-map string "
            f"keys to BIGINT (e.g. xxhash64 of the URL)"
        )
    c4 = c4_clean(
        df, key, content, min_words=min_words, min_lines=min_lines
    ).select(
        key,
        F.col("page_kept").alias("c4_kept"),
        F.col("cleaned"),
    )
    survivors = c4.filter(F.col("c4_kept")).select(key, "cleaned")
    deduped = paragraph_dedup(
        survivors, key, "cleaned", sep="\n", pos_bits=pos_bits
    )
    out = c4.join(deduped, key, "left").select(
        F.col(key),
        F.col("c4_kept"),
        F.coalesce(F.col("n_lines"), F.lit(0)).alias(
            "n_paragraphs_clean"
        ),
        F.coalesce(F.col("n_kept"), F.lit(0).cast("long")).alias(
            "n_paragraphs_final"
        ),
        F.coalesce(F.col("text_deduped"), F.lit("")).alias("_pipe_text"),
    )
    if quality:
        out = quality_filter(out, "_pipe_text")
        quality_kept = F.coalesce(
            F.col("quality_keep") & (F.col("n_paragraphs_final") > 0),
            F.lit(False),
        )
    else:
        quality_kept = F.col("n_paragraphs_final") > 0
    final_kept = F.col("c4_kept") & quality_kept
    return out.select(
        F.col(key),
        "c4_kept",
        "n_paragraphs_clean",
        "n_paragraphs_final",
        quality_kept.alias("quality_kept"),
        final_kept.alias("final_kept"),
        F.when(final_kept, F.col("_pipe_text"))
        .otherwise(F.lit(""))
        .alias("text_final"),
    )


def funnel_stats(cleaned: DataFrame) -> DataFrame:
    """One-row funnel accounting over a clean_corpus frame — a single
    aggregate (conditional sums over the carried stage booleans), so
    the report costs one job however large the corpus:

      n_docs, n_c4_kept, n_final_kept, paragraphs_in, paragraphs_out
    """
    zero = F.lit(0).cast("long")
    # sum() over zero rows is NULL — an empty corpus must report 0s,
    # not Nones that poison downstream funnel arithmetic
    return cleaned.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.coalesce(
            F.sum(F.col("c4_kept").cast("long")), zero
        ).alias("n_c4_kept"),
        F.coalesce(
            F.sum(F.col("final_kept").cast("long")), zero
        ).alias("n_final_kept"),
        F.coalesce(F.sum("n_paragraphs_clean"), zero).alias(
            "paragraphs_in"
        ),
        F.coalesce(
            F.sum(
                F.when(
                    F.col("final_kept"), F.col("n_paragraphs_final")
                ).otherwise(F.lit(0))
            ),
            zero,
        ).alias("paragraphs_out"),
    )
