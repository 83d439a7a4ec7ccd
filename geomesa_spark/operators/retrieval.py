"""BM25 full-text scoring / top-k retrieval over a document table.

The text-retrieval member of the LLM-pipeline operator family (quality
scoring and dedup live in ``functions/text.py`` / ``operators/dedup.py``):
given a bag-of-words query, score every document with Okapi BM25
(Robertson & Zaragoza 2009, "The Probabilistic Relevance Framework") and
return the top-k. Used in practice to mine domain-relevant training
documents from a crawled corpus.

Spark-first shape — every stage is native SQL under whole-stage codegen,
and the corpus text is scanned exactly ONCE:

- one projection tokenizes each document (``split(lower(text))``) and, in
  the same codegen stage, derives the doc length (``size``) and the
  per-query-term frequency (``size(filter(toks, x -> x == term))`` — the
  query is a small literal bag, so tf is a map-side expression, never a
  (doc, term) shuffle). The resulting frame is (id, dl, tf[|Q|]) — a few
  dozen bytes per document, no text — and is persisted so the two
  consumers below cost one text scan total, not one each;
- corpus stats (N, avgdl over tokenized docs) are a single-row aggregate
  broadcast-joined in (a BroadcastNestedLoopJoin of exactly one row);
- per-term document frequencies aggregate the exploded matching terms
  (at most |Q| rows per matching document reach this shuffle: at 100 TB
  the shuffled volume is ~(matching docs x |Q| longs), not (all tokens));
- top-k is ``ORDER BY score LIMIT k`` = Spark's TakeOrderedAndProject
  (per-partition heap + driver merge of k rows, no global sort).

Ordering is made engine-deterministic by ranking on the ROUNDED score
(6 dp — the driver gate's float tolerance) with doc id as tie-break.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

TOKEN_SPLIT = "[^a-z0-9]+"


def tokens(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """-> (id, tok): lowercase alnum-run tokens, empties dropped."""
    return (
        df.select(
            F.col(id_col),
            F.explode(F.split(F.lower(F.col(text_col)), TOKEN_SPLIT)).alias("tok"),
        )
        .filter(F.col("tok") != "")
    )


def bm25_topk(
    df: DataFrame,
    query_terms: list[str],
    k: int = 20,
    text_col: str = "text",
    id_col: str = "doc_id",
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """-> (doc_id, score) top-k by BM25; score rounded to 6 dp.

    idf(t) = ln(1 + (N - df + 0.5)/(df + 0.5)); tf component
    tf*(k1+1)/(tf + k1*(1 - b + b*dl/avgdl)). Documents matching no query
    term never appear (score floor is > 0 for any match since idf > 0).
    N/avgdl count documents with at least one token (a zero-token document
    contributes nothing to the corpus statistics, matching the tokenize->
    aggregate definition). Duplicate query terms are deduplicated (order
    preserved) so a repeated term scores once, like the explode/isin form.
    """
    query_terms = list(dict.fromkeys(query_terms))
    toks_arr = F.filter(
        F.split(F.lower(F.col(text_col)), TOKEN_SPLIT), lambda x: x != ""
    )

    def _tf(term: str):
        # single-parameter lambda: a 2-arg lambda would make F.filter bind
        # the second name to the ELEMENT INDEX, not the closed-over term
        return F.size(F.filter(toks_arr, lambda x: x == F.lit(term)))

    # ONE pass over the text column: dl and every per-term tf come out of the
    # same projection. |Q| is a small literal bag, so this is |Q| codegen
    # array scans per row — still one IO scan and zero tokenize shuffles.
    # localCheckpoint (eager) instead of persist: the frame is referenced
    # twice (corpus stats + matched explode) so it must materialize once,
    # but a bare persist leaks cached blocks for the session lifetime —
    # checkpointed blocks are freed by the ContextCleaner when the result
    # frames are garbage collected (same hygiene as knn.py:166,210).
    base = df.select(
        F.col(id_col),
        F.size(toks_arr).alias("dl"),
        F.array(
            *[
                F.struct(
                    F.lit(t).alias("tok"),
                    _tf(t).cast("long").alias("tf"),
                )
                for t in query_terms
            ]
        ).alias("tfs"),
    ).localCheckpoint(eager=True)

    # single-row corpus stats over tokenized docs (dl > 0)
    stats = base.filter(F.col("dl") > 0).agg(
        F.count("*").cast("double").alias("n_docs"),
        F.avg("dl").alias("avgdl"),
    )
    # (id, dl, tok, tf) for matching terms only — <= |Q| rows per doc
    matched = base.select(
        id_col,
        "dl",
        F.explode(F.filter(F.col("tfs"), lambda s: s["tf"] > 0)).alias("s"),
    ).select(id_col, "dl", F.col("s.tok").alias("tok"), F.col("s.tf").alias("tf"))
    # tf > 0 is per-doc by construction, so df(t) = count(*), no distinct
    dfreq = matched.groupBy("tok").agg(F.count("*").cast("double").alias("df"))
    scored = (
        matched.join(F.broadcast(dfreq), "tok")
        .crossJoin(F.broadcast(stats))
        .withColumn(
            "idf",
            F.log(F.lit(1.0) + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)),
        )
        .withColumn(
            "w",
            F.col("idf")
            * (F.col("tf") * (k1 + 1))
            / (F.col("tf") + k1 * (1 - b + b * F.col("dl") / F.col("avgdl"))),
        )
        .groupBy(id_col)
        .agg(F.round(F.sum("w"), 6).alias("score"))
    )
    return scored.orderBy(F.col("score").desc(), F.col(id_col)).limit(k)
