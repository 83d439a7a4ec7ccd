"""BM25 full-text scoring / top-k retrieval over a document table.

The text-retrieval member of the LLM-pipeline operator family (quality
scoring and dedup live in ``functions/text.py`` / ``operators/dedup.py``):
given a bag-of-words query, score every document with Okapi BM25
(Robertson & Zaragoza 2009, "The Probabilistic Relevance Framework") and
return the top-k. Used in practice to mine domain-relevant training
documents from a crawled corpus.

Spark-first shape — every stage is native SQL under whole-stage codegen:

- tokenize = ``split(lower(text))`` + ``explode`` (one pass, no UDF);
- doc lengths / term frequencies / document frequencies are partial+final
  aggregates on (doc) and (doc, term) keys;
- corpus stats (N, avgdl) are a single-row aggregate broadcast-joined in
  (a BroadcastNestedLoopJoin of exactly one row — no driver action);
- query terms prune the exploded token stream EARLY (``isin`` filter
  before the tf aggregate), so only matching-term rows shuffle: at 100 TB
  the shuffled volume is ~(matching tokens), not (all tokens);
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
    """
    toks = tokens(df, text_col, id_col)
    dl = toks.groupBy(id_col).agg(F.count("*").alias("dl"))
    stats = dl.agg(
        F.count("*").cast("double").alias("n_docs"),
        F.avg("dl").alias("avgdl"),
    )
    tf = (
        toks.filter(F.col("tok").isin(list(query_terms)))
        .groupBy(id_col, "tok")
        .agg(F.count("*").alias("tf"))
    )
    dfreq = tf.groupBy("tok").agg(F.countDistinct(id_col).cast("double").alias("df"))
    scored = (
        tf.join(F.broadcast(dfreq), "tok")
        # dl is doc-cardinality: shuffle join on the doc key, which the
        # final groupBy(id) reuses — one Exchange serves both
        .join(dl, id_col)
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
