"""Lexical retrieval over document corpora: BM25 scoring — the classic
keyword-search primitive a training-data pipeline needs for targeted
corpus slicing (pull all docs about X) and quality filtering by topic.

Scale design: the token explode is filtered to the query terms BEFORE any
shuffle (predicate on the exploded value), so the tf frame holds only
|terms| × matching-docs rows, never the full posting table; corpus-level
statistics (N, avgdl) and per-term document frequencies are tiny
aggregates broadcast back — no driver round-trip, one plan end-to-end.
At 100 TB the same shape holds: the only big shuffle is the per-(doc,
term) count on filtered postings.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sustainable_building_energy_benchmarking_pipeline_spark.functions.text import ws_tokens


def bm25_scores(
    docs: DataFrame,
    query_terms: list[str],
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Okapi BM25 score of each document against a bag of query terms.

    score(D,Q) = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1−b+b·|D|/avgdl)),
    with the standard smoothed idf(t) = ln(1 + (N−df+0.5)/(df+0.5)).
    Documents matching no term are absent (score 0). Output:
    (doc_id, bm25 double), unordered — callers top-k as needed.

    |D| and avgdl count ALL tokens (not just query terms), per the
    canonical formula; N is the full corpus size.
    """
    base = docs.select(
        F.col(id_col).alias("doc_id"),
        ws_tokens(F.lower(F.col(text_col))).alias("_toks"),
    )
    lens = base.select("doc_id", F.size("_toks").cast("double").alias("dl"))
    stats = lens.agg(
        F.count(F.lit(1)).cast("double").alias("n_docs"),
        F.avg("dl").alias("avgdl"),
    )
    tf = (
        base.select("doc_id", F.explode("_toks").alias("t"))
        .filter(F.col("t").isin(list(query_terms)))
        .groupBy("doc_id", "t")
        .agg(F.count(F.lit(1)).cast("double").alias("tf"))
    )
    dfreq = tf.groupBy("t").agg(F.count(F.lit(1)).cast("double").alias("df"))
    idf = F.log(
        F.lit(1.0)
        + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
    )
    denom = F.col("tf") + k1 * (1.0 - b + b * F.col("dl") / F.col("avgdl"))
    term_score = idf * F.col("tf") * (k1 + 1.0) / denom
    return (
        tf.join(F.broadcast(dfreq), "t")
        .join(lens, "doc_id")
        .crossJoin(F.broadcast(stats))
        .select("doc_id", term_score.alias("_s"))
        .groupBy("doc_id")
        .agg(F.sum("_s").alias("bm25"))
    )
