"""Lexical retrieval over a document corpus: BM25 inverted index,
top-k search, and hybrid lexical+vector rank fusion.

The training-data use: retrieval is the other half of the similarity
family (`operators/similarity.py` covers the embedding side). A corpus
engine needs lexical search for (a) targeted quality audits ("show me
the documents about X that survived filtering"), (b) seed expansion for
DSIR-style importance sampling, and (c) the lexical leg of hybrid
retrieval, which at corpus scale routinely beats either leg alone
(reciprocal-rank fusion; Cormack et al., SIGIR 2009). The reference's
Solr sink (`src/RecordManager/Base/Solr/SolrUpdater.php` — behavioral
spec, not code) delegates this to an external Lucene cluster; here the
index and the scoring are native DataFrame plans over the same parquet
the rest of the engine reads.

Scale shape (the inverted index is a corpus-scale table; queries are
small by contract):

- **Postings build** is ONE corpus scan: explode normalized tokens,
  map-side-combinable groupBy on (doc, term). Document length rides
  along as ``max(dl)`` (constant per doc) — no second scan.
- **Query-vocabulary pruning happens before any corpus shuffle**: the
  postings stream broadcast-joins the (tiny) distinct query-term set,
  so only postings for query terms ever reach an exchange. Per-term
  document frequency is computed AFTER that prune — it is still the
  exact global df, because the postings table holds every document
  containing the term.
- **Corpus statistics (N, avgdl)** are a 1-row aggregate joined back
  as a broadcast nested loop (the diagnostics/keywords pattern): the
  plan stays lazy, nothing collects on the driver.
- **Top-k is two-stage and bounded**: candidates first reduce to a
  per-(query, salt-bucket) top-k (sorted-array slice, state <= k per
  bucket), then the <= n_partial*k survivors per query rank with an
  ordinary window. A single window over all candidates would buffer
  every matching document of a hot query on one task — the same
  unbounded-state shape the dedup family bans.

Persisting the index: ``build_postings`` output is exactly what
``sources/bucketed.write_bucketed(postings, tbl, "term", n)`` expects —
bucket by ``term`` and every probe's broadcast join against the query
vocabulary reads only matching buckets' files, with zero index-side
exchange (the incremental-dedup fingerprint-index pattern).

Determinism: scores round to 6 decimals BEFORE ranking; ties break on
ascending document id — the DuckDB oracle reproduces rows exactly.

BM25 formula (Robertson-Sparck Jones, the Lucene variant): idf =
ln(1 + (N - df + 0.5)/(df + 0.5)) (always positive), tf-saturation
tf*(k1+1)/(tf + k1*(1 - b + b*dl/avgdl)), weighted by the query-side
term frequency.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.text import normalize_for_fingerprint, tokenize

__all__ = ["build_corpus_stats", "build_postings", "bm25_topk", "rrf_fuse"]


def build_corpus_stats(
    df: DataFrame, text_col: str = "text"
) -> DataFrame:
    """The 1-row (N, avgdl) BM25 statistics table — persist it next to
    the postings index at ingest so probes never touch the corpus."""
    return df.select(
        F.count(F.lit(1)).alias("__N"),
        F.avg(F.size(tokenize(normalize_for_fingerprint(text_col)))).alias(
            "__avgdl"
        ),
    )


def _doc_token_stream(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(doc_id, dl, term) — one exploded token per row, with the
    document length duplicated per token. Shared by ``build_postings``
    and ``bm25_topk``'s inline prune path so their tokenization can
    never diverge (r12 ADVICE): a posting-index probe and an inline
    scoring pass must agree on what a term is."""
    base = df.select(
        F.col(id_col).alias("doc_id"),
        tokenize(normalize_for_fingerprint(text_col)).alias("__toks"),
    )
    return base.select(
        "doc_id",
        F.size("__toks").alias("dl"),
        F.explode("__toks").alias("term"),
    )


def build_postings(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Inverted-index postings: (term, doc_id, tf, dl) in one scan.

    ``dl`` (the document's token count) is duplicated per posting so
    probe-time scoring never joins back to the corpus. Bucket the
    result by ``term`` (``write_bucketed``) to make every probe
    index-side-shuffle-free.
    """
    return _doc_token_stream(df, id_col, text_col).groupBy(
        "term", "doc_id"
    ).agg(F.count(F.lit(1)).alias("tf"), F.max("dl").alias("dl"))


def bm25_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    query_id_col: str = "query_id",
    query_text_col: str = "query_text",
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    n_partial: int = 32,
    postings: DataFrame | None = None,
    stats: DataFrame | None = None,
) -> DataFrame:
    """Top-k BM25 matches per query: (query_id, doc_id, score, rank).

    ``queries`` is small by contract (it broadcasts twice: the distinct
    term vocabulary into the postings prune, the per-term query weights
    into scoring). Pass ``postings`` to probe a prebuilt/persisted
    index instead of re-deriving it from ``corpus``, and ``stats``
    (``build_corpus_stats`` output, persisted at ingest) to skip the
    1-row (N, avgdl) census scan too — with both, a probe touches the
    corpus ZERO times (pinned in tests/test_retrieval.py), which is
    the 100 TB serving shape.
    """
    if k < 1 or n_partial < 1:
        raise ValueError(f"k={k} and n_partial={n_partial} must be >= 1")

    q_toks = queries.select(
        F.col(query_id_col).alias("query_id"),
        F.explode(
            tokenize(normalize_for_fingerprint(query_text_col))
        ).alias("term"),
    )
    qtf = q_toks.groupBy("query_id", "term").agg(
        F.count(F.lit(1)).alias("qtf")
    )
    q_vocab = qtf.select("term").distinct()

    # Prune to the query vocabulary BEFORE anything shuffles. For a
    # persisted index that is the broadcast join against the bucketed
    # postings table (reads only matching buckets). For the inline
    # build, joining AFTER build_postings put the full corpus-sized
    # (term, doc) aggregation below the join — Catalyst cannot push a
    # join under an aggregation, so every posting shuffled despite the
    # docstring's claim (opt r12, caught in the captured plan). The
    # prune now joins the exploded TOKEN stream, so only query-term
    # tokens reach the (term, doc) exchange; tf/df/dl computed after
    # the prune are unchanged — the prune is term-complete.
    if postings is None:
        toks = _doc_token_stream(corpus, id_col, text_col)
        hits = (
            toks.join(F.broadcast(q_vocab), "term")
            .groupBy("term", "doc_id")
            .agg(F.count(F.lit(1)).alias("tf"), F.max("dl").alias("dl"))
        )
    else:
        hits = postings.join(F.broadcast(q_vocab), "term")
    dfreq = hits.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    # df joins back CO-PARTITIONED (the census join-back shape): the
    # pruned-hits exchange on term is shared by the census aggregation
    # and the join stream (ReusedExchange), so the postings build runs
    # ONCE — a broadcast(dfreq) here executes the whole postings subtree
    # a second time just to build the broadcast, a full extra corpus
    # scan at 100 TB (measured: 3 corpus scans -> 2 at sf0.1).

    if stats is None:
        stats = build_corpus_stats(corpus, text_col)
    # 1 row -> broadcast nested loop; keeps the plan lazy

    scored_terms = (
        hits.join(dfreq, "term")
        .join(F.broadcast(qtf), "term")
        .crossJoin(F.broadcast(stats))
        .select(
            "query_id",
            "doc_id",
            (
                F.col("qtf")
                * F.log(
                    F.lit(1.0)
                    + (F.col("__N") - F.col("df") + F.lit(0.5))
                    / (F.col("df") + F.lit(0.5))
                )
                * (F.col("tf") * (k1 + 1.0))
                / (
                    F.col("tf")
                    + F.lit(k1)
                    * (
                        F.lit(1.0 - b)
                        + F.lit(b) * F.col("dl") / F.col("__avgdl")
                    )
                )
            ).alias("__contrib"),
        )
    )
    agg = scored_terms.groupBy("query_id", "doc_id").agg(
        F.round(F.sum("__contrib"), 6).alias("score")
    )

    # Two-stage bounded top-k: per-(query, salt) sorted-array slice
    # first (state <= k), then an ordinary window over <= n_partial*k
    # survivors. A hot query matching millions of documents never
    # buffers them on one task.
    part = agg.groupBy(
        "query_id",
        F.pmod(F.xxhash64(F.col("doc_id")), F.lit(n_partial)).alias("__salt"),
    ).agg(
        F.slice(
            F.array_sort(
                F.collect_list(
                    F.struct(
                        (-F.col("score")).alias("ns"),
                        F.col("doc_id").alias("doc_id"),
                        F.col("score").alias("score"),
                    )
                )
            ),
            1,
            k,
        ).alias("__top")
    )
    cand = part.select(
        "query_id", F.explode("__top").alias("c")
    ).select("query_id", F.col("c.doc_id").alias("doc_id"), F.col("c.score").alias("score"))
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("doc_id").asc()
    )
    return cand.withColumn("rank", F.row_number().over(w)).where(
        F.col("rank") <= k
    )


def rrf_fuse(
    rankings: list[DataFrame],
    k: int = 10,
    c: int = 60,
) -> DataFrame:
    """Reciprocal-rank fusion of N ranked lists into one.

    Each input has (query_id, doc_id, rank); output is
    (query_id, doc_id, rrf, rank) with rrf = round(sum 1/(c+rank_i), 6)
    over the lists the document appears in (Cormack-Clarke-Buettcher,
    SIGIR 2009; c=60 is the paper's constant).

    Shape: union + groupBy — no outer-join ladder, so fusing N legs is
    one exchange regardless of N, and the group state is bounded by N
    (a document appears at most once per leg). Inputs are top-k lists
    (small per query by construction), so the whole fusion is tiny
    next to the legs that produced it.
    """
    if not rankings:
        raise ValueError("rrf_fuse needs at least one ranked list")
    unioned = None
    for r in rankings:
        leg = r.select(
            "query_id",
            "doc_id",
            (F.lit(1.0) / (F.lit(float(c)) + F.col("rank"))).alias("__w"),
        )
        unioned = leg if unioned is None else unioned.unionByName(leg)
    fused = unioned.groupBy("query_id", "doc_id").agg(
        F.round(F.sum("__w"), 6).alias("rrf")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("rrf").desc(), F.col("doc_id").asc()
    )
    return fused.withColumn("rank", F.row_number().over(w)).where(
        F.col("rank") <= k
    )
