"""Deterministic sequence packing for training-data pipelines.

LLM pre-training consumes fixed-length token blocks, not documents:
documents are concatenated into a stream (separator-aware) and the
stream is cut into `block`-token chunks (GPT-style packing; a document
may span a chunk boundary). At 100 TB the stream cannot be a single
global order — a genuinely serial first-fit pack would funnel the
corpus through one task. This operator shards the corpus into
`buckets` independent streams by a stable key hash, so each bucket is
one window partition: the only shuffle is the bucket exchange, each
bucket packs independently, and the layout is exactly reproducible
across runs, partitionings and cluster sizes (everything derives from
(key, token-count) — no RNG, no task order).

Sizing at scale: buckets should be >> executor count (e.g. 10k-100k at
100 TB) so each window partition fits an executor comfortably; the
per-bucket stream position is a cumulative sum window — Spark computes
it in one pass over each sorted bucket.

The whole law is integer arithmetic over a window cumsum, so a DuckDB
oracle reproduces it bit-for-bit (driver query `sequence_packing`).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from spider_engine_spark.functions.hashes import md5_h60_col
from spider_engine_spark.functions.text_analysis import bpe_ish_token_count


def pack_sequences(
    df: DataFrame,
    key: str,
    content: str,
    block: int = 512,
    buckets: int = 32,
    sep_tokens: int = 1,
    counter=None,
) -> DataFrame:
    """Assign every document a position in its bucket's token stream.

    Returns one row per input row with ONLY the key + layout columns
    (join back on `key` to materialize the packed blocks from content):
    n_tok (document token count + sep_tokens separator), bucket
    (md5-law shard of `key` — the SQL-reproducible hash so the layout
    itself is oracle-checkable), stream_start / stream_end (cumulative
    positions within the bucket, ordered by `key`), chunk_first /
    chunk_last (the block indices the document's tokens land in; a doc
    spans chunks when chunk_last > chunk_first).

    counter defaults to the BPE-ish pre-tokenizer count
    (functions/text_analysis.bpe_ish_token_count); pass any Column
    function for a different token law. Zero-token documents still
    consume their separator, so every doc has a well-defined position
    (which is why sep_tokens must be >= 1: with 0 a zero-token doc
    would get an empty span and chunk_last < chunk_first).

    Duplicate `key` values each receive their OWN non-overlapping span:
    the cumsum runs over a ROWS frame ordered by (key, n_tok), so tied
    keys never share a stream_end (a RANGE frame would assign
    overlapping token positions to both rows — silent pack corruption);
    rows identical in (key, n_tok) are interchangeable, so the layout
    is still deterministic as a multiset.
    """
    if block <= 0:
        raise ValueError(f"block must be positive, got {block}")
    if buckets < 1:
        raise ValueError(f"buckets must be >= 1, got {buckets}")
    if sep_tokens < 1:
        raise ValueError(
            f"sep_tokens must be >= 1 (zero-token docs need the "
            f"separator for a well-defined span), got {sep_tokens}"
        )
    count_fn = counter or bpe_ish_token_count
    d = df.select(
        F.col(key),
        # coalesce: NULL text counts as 0 tokens (still pays its
        # separator) so every doc has a defined stream position and the
        # bucket cumsum never goes NULL
        (
            F.coalesce(count_fn(F.col(content)).cast("long"), F.lit(0))
            + F.lit(sep_tokens)
        ).alias("n_tok"),
        F.pmod(md5_h60_col(F.col(key).cast("string")), F.lit(buckets))
        .cast("int")
        .alias("bucket"),
    )
    w = (
        Window.partitionBy("bucket")
        .orderBy(key, "n_tok")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    d = d.withColumn("stream_end", F.sum("n_tok").over(w))
    d = d.withColumn("stream_start", F.col("stream_end") - F.col("n_tok"))
    block = int(block)
    # integer DIV, not double /: positions are longs and the law claims
    # bit-exactness at any scale (double division is exact only < 2^53)
    return d.select(
        key,
        "bucket",
        "n_tok",
        "stream_start",
        "stream_end",
        F.expr(f"CAST(stream_start DIV {block} AS LONG)").alias(
            "chunk_first"
        ),
        F.expr(f"CAST((stream_end - 1) DIV {block} AS LONG)").alias(
            "chunk_last"
        ),
    )


def materialize_blocks(
    df: DataFrame,
    packed: DataFrame,
    key: str,
    content: str,
    block: int,
    sep_token: str = "<|sep|>",
    sep_tokens: int = 1,
    tokenizer=None,
) -> DataFrame:
    """Emit the artifact a trainer actually consumes: one row per
    (bucket, chunk_id) holding exactly `block` tokens (the last chunk
    of each bucket ragged), assembled from the `packed` layout
    (pack_sequences output) joined back to the content.

    tokenizer (Column -> array<string>) must be the array form of the
    `counter` used at pack time — default bpe_ish_tokens matches
    pack_sequences' default bpe_ish_token_count; `block`/`sep_tokens`
    likewise must repeat the pack call's values (the layout does not
    embed them). `key` must be unique in df: the layout attributes
    token spans by key, and duplicate keys cannot be re-attributed to
    their content (pack them with a synthesized unique key instead).

    Plan shape at 100 TB: one equi-join of corpus and layout on `key`
    (co-partitioned if both sides are bucketed by key), a cheap
    sequence-explode (a doc emits one row per SPANNED chunk — ~n_tok/
    block + 1, so total explode output is ~corpus tokens / block), and
    ONE groupBy (bucket, chunk_id) whose per-group payload is bounded
    by `block` tokens regardless of corpus size. Chunk assembly is
    order-exact: pieces carry their stream_start and are array_sort'ed
    inside the group (stream positions are unique within a bucket), so
    the result is reproducible across partitionings and cluster sizes,
    like the layout itself.
    """
    from spider_engine_spark.functions.text_analysis import bpe_ish_tokens

    if sep_tokens < 1:
        raise ValueError(f"sep_tokens must be >= 1, got {sep_tokens}")
    tok_fn = tokenizer or bpe_ish_tokens
    toks = F.concat(
        F.coalesce(
            tok_fn(F.col(content)), F.array().cast("array<string>")
        ),
        F.array_repeat(F.lit(sep_token), sep_tokens),
    )
    d = (
        df.select(F.col(key), toks.alias("_toks"))
        .join(
            packed.select(
                key, "bucket", "stream_start", "stream_end",
                "chunk_first", "chunk_last",
            ),
            key,
        )
        .withColumn(
            "chunk_id", F.explode(F.sequence("chunk_first", "chunk_last"))
        )
    )
    c0 = F.col("chunk_id") * block
    ps = F.greatest(c0 - F.col("stream_start"), F.lit(0))
    pe = F.least(c0 + block, F.col("stream_end")) - F.col("stream_start")
    piece = F.slice(F.col("_toks"), (ps + 1).cast("int"), (pe - ps).cast("int"))
    return (
        d.select(
            "bucket",
            "chunk_id",
            F.struct(F.col("stream_start"), piece.alias("piece")).alias("_p"),
        )
        .groupBy("bucket", "chunk_id")
        .agg(
            F.flatten(
                F.transform(
                    F.array_sort(F.collect_list("_p")), lambda s: s["piece"]
                )
            ).alias("tokens")
        )
        .withColumn("n_tokens", F.size("tokens").cast("long"))
    )


def packing_summary(packed: DataFrame) -> DataFrame:
    """Per-bucket packing report: docs, tokens and chunk count — the
    waste metric a mix designer tunes `block`/`buckets` against.
    n_chunks derives from the layout itself (streams start at 0, so it
    is max(chunk_last)+1); no `block` parameter to pass that could
    silently disagree with the one used at pack time."""
    return packed.groupBy("bucket").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("n_tok").cast("long").alias("n_tokens"),
        (F.max("chunk_last") + 1).cast("long").alias("n_chunks"),
    )


def interleaved_token_cost(
    spans: Column,
    media_tokens: dict[str, int],
    text_kind: str = "text",
    counter=None,
) -> Column:
    """Token cost of an interleaved span sequence (the input_hint's
    array<struct<kind,text,media_ref,offset>> shape): text spans cost
    their token count (BPE-ish law by default, `counter` overrides),
    media spans a fixed per-kind budget — the placeholder/patch-token
    cost a multimodal trainer reserves per image/link/frame. Unknown
    kinds raise PER ROW (fail loud: a silently-free span kind would
    corrupt every downstream block boundary); a NULL spans array yields
    NULL (pack_sequences coalesces it to 0, same as NULL text).

    One aggregate over the span array — per-row JVM algebra, no
    explode, no shuffle."""
    count_fn = counter or bpe_ish_token_count

    def span_cost(s):
        cost = F.when(
            s["kind"] == F.lit(text_kind),
            F.coalesce(
                count_fn(s["text"]).cast("long"), F.lit(0).cast("long")
            ),
        )
        for k, v in sorted(media_tokens.items()):
            if int(v) < 0:
                raise ValueError(
                    f"media token budget for {k!r} must be >= 0, got {v}"
                )
            cost = cost.when(
                s["kind"] == F.lit(k), F.lit(int(v)).cast("long")
            )
        return cost.otherwise(
            F.raise_error(
                F.concat(
                    F.lit("interleaved_token_cost: unknown span kind "),
                    F.coalesce(s["kind"], F.lit("NULL")),
                )
            ).cast("long")
        )

    return F.aggregate(
        spans,
        F.lit(0).cast("long"),
        lambda acc, s: acc + span_cost(s),
    )


def pack_interleaved(
    df: DataFrame,
    key: str,
    spans: str = "spans",
    block: int = 512,
    buckets: int = 32,
    media_tokens: dict[str, int] | None = None,
    sep_tokens: int = 1,
) -> DataFrame:
    """Sequence packing for interleaved text+media documents: identical
    bucket/cumsum/chunk law to pack_sequences — documents stay atomic —
    with the interleaved cost law as the counter (per-span text token
    counts + fixed media budgets; default {'image': 64, 'link': 1}).
    Returns the same layout columns; join back on `key` to materialize.
    """
    mt = (
        {"image": 64, "link": 1}
        if media_tokens is None
        else dict(media_tokens)
    )
    return pack_sequences(
        df,
        key,
        spans,
        block=block,
        buckets=buckets,
        sep_tokens=sep_tokens,
        counter=lambda c: interleaved_token_cost(c, mt),
    )
