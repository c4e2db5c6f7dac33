"""Entity-resolution deduplication: blocking join + pairwise verification +
connected components + one-per-source invariant.

Reference: Deduplication/DedupHandler.php — the crown operator.
- Key generation :313-370 (title_keys / isbn_keys / id_keys, 200-char cap)
- Blocking search :413-545 (key ∈ candidates from *other* sources, caps
  101 fetch / 1000 verify to bound hot keys)
- Pairwise verification matchRecords :742-985
- Group maintenance :1089-1242 (≤1 record per source per group)

Spark-first re-expression: the reference probes a DB index per record
(sequential, the one phase it can't parallelize). Here the whole phase is
ONE exploded-key self-join + an iterative small-diameter connected
components, which is the standard distributed-ER shape and parallelizes
to any cluster size:

  records --explode keys--> (key, id, source)   [scan stage]
       self-join on key, source_a != source_b, id_a < id_b   [1 shuffle]
       per-key candidate cap via row_number (hot-key bound = skew bound)
       pairwise verify as a Column expression (levenshtein is built-in)
       connected components over surviving edges  [O(log n) small joins]
       one-per-source enforcement (keep earliest per source per component)

Divergence note (SURVEY §7.4): the reference assigns groups greedily in
arrival order; batch CC yields the transitive closure, compared as a set
partition in tests.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from recordmanager_spark.sparkcompat import try_element_at

from ..functions.keys import (
    author_match_expr,
    create_title_key,
    normalize_isbn,
    normalize_key,
)

# ---------------------------------------------------------------------------
# Key generation (DedupHandler.php:313-370)
# ---------------------------------------------------------------------------


def _local_string_df(spark, rows, cols: list[str]) -> DataFrame:
    """Driver rows -> DataFrame via Arrow (one bulk conversion).

    ``createDataFrame(list_of_tuples)`` parallelizes the rows and re-runs
    the Python-side row conversion in workers on EVERY downstream job
    (~4s per action for a 28k-row assignment); the pandas/Arrow path
    converts once and lands a JVM-side relation, so later counts/joins
    never touch Python again.
    """
    import pandas as pd

    schema = ", ".join(f"{c} string" for c in cols)
    if not rows:
        return spark.createDataFrame([], schema)
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=cols), schema=schema
    )


def with_dedup_keys(
    df: DataFrame,
    title_col: str = "title",
    author_col: str = "author",
    isbn_col: str | None = "isbn",
    ignore_keys: list[str] | None = None,
    key_fold=None,
) -> DataFrame:
    """Add title_keys / isbn_keys columns. title key = createTitleKey(title)
    + normalizeKey(author), capped at 200 chars; poison keys from the
    configurable ignore list are dropped (DedupHandler.php:1036-1079).

    ``key_fold`` overrides the author-key folding function (e.g.
    ``keys.normalize_key_icu`` for ICU Any-Latin including Han/Kana);
    default is the JVM-side ``normalize_key``.

    With the default fold, the key expressions compile through the
    SQL-text twin (one ``F.expr`` parse instead of hundreds of py4j
    Column-constructor round trips — see PERFORMANCE.md construction
    census); a custom ``key_fold`` keeps the Column path since it may
    wrap a UDF.
    """
    if key_fold is None:
        from .. import sqlalg as SA
        from .. import sqltwin

        ktw = sqltwin.keys_twin()
        tk = F.expr(
            str(
                SA.substring(
                    SA.concat(
                        ktw.create_title_key(SA.col(title_col)),
                        ktw.normalize_key(SA.col(author_col)),
                    ),
                    1,
                    200,
                )
            )
        )
        isbn_keys = (
            F.expr(
                str(
                    SA.array_distinct(
                        SA.filter(
                            SA.transform(
                                SA.col(isbn_col), ktw.normalize_isbn
                            ),
                            lambda x: x != "",
                        )
                    )
                )
            )
            if isbn_col is not None
            else None
        )
    else:
        tk = F.substring(
            F.concat(
                create_title_key(F.col(title_col)), key_fold(F.col(author_col))
            ),
            1,
            200,
        )
        isbn_keys = (
            F.array_distinct(
                F.filter(
                    F.transform(F.col(isbn_col), normalize_isbn),
                    lambda x: x != "",
                )
            )
            if isbn_col is not None
            else None
        )
    out = df.withColumn("title_keys", F.array(tk))
    if isbn_keys is not None:
        out = out.withColumn("isbn_keys", isbn_keys)
    if ignore_keys:
        bad = F.array(*[F.lit(k) for k in ignore_keys])
        for c in ("title_keys", "isbn_keys"):
            if c in out.columns:
                out = out.withColumn(
                    c, F.filter(F.col(c), lambda x: ~F.array_contains(bad, x))
                )
    return out


# ---------------------------------------------------------------------------
# Blocking join
# ---------------------------------------------------------------------------


def _capped_key_groups(
    keys: DataFrame, member: Column, member_id: str, cap: int
) -> DataFrame:
    """(key, __c) with __c = the key's sorted candidate array, truncated
    to ``cap`` members with BOUNDED aggregation state.

    Keys within the cap collect exactly; over-cap keys contribute the
    min member per md5 salt slot of the member id — <= cap
    representatives picked with O(1) state per (key, slot) group, so no
    final-aggregation buffer ever holds a poison key's full membership
    (collect_list partials CONCATENATE — the r6 ADVICE buffer hazard —
    so slice-after-collect is not a bound).

    Census join-back route (the operators/bucket_pairs.py shape, folded
    here in r9 — the r7 anti/semi prefilter pair re-scanned the corpus
    and re-ran the key-generation expressions once per branch): the
    size census is a map-side-combinable count on its own pruned
    exchange; it joins back CO-PARTITIONED on the key (shuffle_hash —
    never broadcast: one census row per key is corpus-sized at 100 TB),
    the small/big branches are plain ``__n`` filters on the joined
    rows, and both branch aggregations inherit the key partitioning
    exchange-free. The member payload (two normalize_key trees per
    record) is computed and shuffled exactly once. The small-branch
    collect_list buffer stays <= cap because over-cap rows are routed
    away BEFORE the aggregation, not sliced after it.

    struct comparison orders by field position — callers put the id
    first so array_sort / min keep the reference's smallest-id
    determinism."""
    from .bucket_pairs import salt_slot

    m = keys.select("key", member.alias("m"))
    sizes = m.groupBy("key").agg(F.count(F.lit(1)).alias("__n"))
    routed = m.join(sizes.hint("shuffle_hash"), "key")
    small_g = (
        routed.where(F.col("__n") <= cap)
        .groupBy("key")
        .agg(F.array_sort(F.collect_list("m")).alias("__c"))
    )
    # min_by on the member id equals the old min-over-struct pick (ids
    # are unique and lead the struct) but plans as a HashAggregate
    # instead of Sort + SortAggregate.
    reps = (
        routed.where(F.col("__n") > cap)
        .groupBy("key", salt_slot(f"m.{member_id}", cap).alias("__slot"))
        .agg(F.min_by("m", F.col(f"m.{member_id}")).alias("m"))
    )
    big_g = reps.groupBy("key").agg(
        F.array_sort(F.collect_list("m")).alias("__c")
    )
    return small_g.unionByName(big_g)


def blocking_pairs(
    df: DataFrame,
    key_cols: list[str],
    id_col: str = "_id",
    source_col: str = "source_id",
    candidates_per_key: int = 101,
) -> DataFrame:
    """Candidate pairs: records from different sources sharing any blocking
    key. Returns (key, id_a, id_b) with id_a < id_b, deduped across keys.

    Skew control: keys shared by more than ``candidates_per_key`` records
    are truncated per the reference's fetch cap (DedupHandler.php:466-467) —
    the row_number bound keeps a poison key ("annual report") from turning
    into an O(n²) partition on one executor.
    """
    allkeys = F.concat(
        *[
            F.coalesce(F.col(k), F.array().cast("array<string>"))
            for k in key_cols
            if k in df.columns
        ]
    )
    keys = df.select(
        F.col(id_col).alias("id"),
        F.col(source_col).alias("source"),
        F.explode(allkeys).alias("key"),
    ).where(F.col("key") != "")
    # Group each key's (sorted, capped) candidate list and generate the
    # cross pairs in-partition with array expressions; the former shape
    # (window row_number + self-join on key) shuffled the exploded keys
    # three times. The cap itself is BOUNDED-STATE (r7): collect_list's
    # partial aggregates concatenate, so slicing AFTER a collect still
    # ships a poison key's full membership into one final-agg buffer —
    # instead over-cap keys are prefiltered (tiny big-key census) and
    # their ~cap candidates picked as the min member per md5 salt slot
    # (O(1) agg state). Candidate SEMANTICS stay the reference's
    # truncation (DedupHandler.php:466-467 bounds work on poison keys —
    # these are weak keys, so completeness has no recall value, unlike
    # the LSH buckets in operators/bucket_pairs.py): <= cap members
    # considered, <= cap²/2 pairs per key; only WHICH members survive an
    # over-cap key changes (salted-min instead of 101-smallest — the
    # reference's own pick is DB-order-dependent).
    grouped = _capped_key_groups(
        keys, F.struct("id", "source"), "id", candidates_per_key
    )
    # sorted list + (i, j>i) generation keeps id_a < id_b without a filter
    pair_arrays = F.filter(
        F.flatten(
            F.transform(
                F.col("__c"),
                lambda x, i: F.transform(
                    F.slice(F.col("__c"), i + 2, candidates_per_key),
                    lambda y: F.when(
                        x["source"] != y["source"],
                        F.struct(x["id"].alias("id_a"), y["id"].alias("id_b")),
                    ),
                ),
            )
        ),
        lambda p: p.isNotNull(),
    )
    return (
        grouped.select(F.explode(pair_arrays).alias("__p"))
        .select(F.col("__p.id_a"), F.col("__p.id_b"))
        .distinct()
    )


# ---------------------------------------------------------------------------
# Pairwise verification (matchRecords, DedupHandler.php:742-985)
# ---------------------------------------------------------------------------


def _match_condition_from(ca, cb, pre_normalized: bool = False) -> Column:
    """matchRecords as a boolean Column, generic over field access.

    ``ca``/``cb`` map a field name to a Column for each side — either
    joined-alias access (``F.col("a.title")``) or struct-lambda access
    (``x["title"]``), so the same decision logic serves the join-based
    verifier and the in-partition fused verifier. With ``pre_normalized``
    the title/author comparison keys are read from ``__nk_title`` /
    ``__nk_author`` (computed once per record instead of once per pair).
    """
    # hard filters (:752-808)
    fmt_ok = ca("format").eqNullSafe(cb("format"))
    access_ok = ca("access_restrictions").eqNullSafe(cb("access_restrictions"))

    inter = lambda f: F.size(F.array_intersect(ca(f), cb(f))) > 0  # noqa: E731
    isbn_accept = inter("isbn")
    id_accept = inter("unique_ids")

    both_issn = (F.size(ca("issn")) > 0) & (F.size(cb("issn")) > 0)
    issn_reject = both_issn & ~inter("issn")

    year_reject = (
        ca("publish_year").isNotNull()
        & cb("publish_year").isNotNull()
        & (ca("publish_year") != cb("publish_year"))
    )
    pages_reject = (
        ca("page_count").isNotNull()
        & cb("page_count").isNotNull()
        & (F.abs(ca("page_count") - cb("page_count")) > 10)
    )
    series_reject = (
        ca("series_issn").isNotNull()
        & cb("series_issn").isNotNull()
        & (ca("series_issn") != cb("series_issn"))
    ) | (
        ca("series_numbering").isNotNull()
        & cb("series_numbering").isNotNull()
        & (ca("series_numbering") != cb("series_numbering"))
    )

    # title similarity: normalized keys within 10% levenshtein (:902-927)
    if pre_normalized:
        ta, tb = ca("__nk_title"), cb("__nk_title")
        aa, ab = ca("__nk_author"), cb("__nk_author")
    else:
        ta, tb = normalize_key(ca("title")), normalize_key(cb("title"))
        aa, ab = normalize_key(ca("author")), normalize_key(cb("author"))
    # Levenshtein is the hot cost of verification (every surviving pair pays
    # it on both title and author). Two cuts, same accept set:
    # 1. length-band reject — |len(x)-len(y)| is a lower bound on edit
    #    distance, so a pair outside the budget can never match; Spark's And
    #    short-circuits, so rejected pairs never run levenshtein at all.
    # 2. threshold (banded) levenshtein — the 3-arg form computes only a
    #    2k+1 diagonal band, O(n*k) instead of O(n^2), returning -1 past the
    #    budget. The budget is per-row (10%/20% of the shorter key), which
    #    the SQL function accepts even though the Python wrapper does not.
    tlen = F.least(F.length(ta), F.length(tb))
    tbudget = tlen * 0.1
    lev_t = F.call_function(
        "levenshtein", ta, tb, F.ceil(tbudget).cast("int")
    )
    title_ok = (
        (F.length(ta) > 0)
        & (F.abs(F.length(ta) - F.length(tb)).cast("double") < tbudget)
        & (lev_t != -1)
        & (lev_t < tbudget)
    )

    # author: exact, authorMatch, or levenshtein <= 20% (:929-962)
    alen = F.least(F.length(aa), F.length(ab))
    abudget = F.floor(alen * 0.2).cast("int")
    lev_a = F.call_function("levenshtein", aa, ab, abudget)
    author_ok = author_match_expr(aa, ab) | (
        (F.length(aa) > 0)
        & (F.abs(F.length(aa) - F.length(ab)) <= abudget)
        & (lev_a != -1)
    )

    accept_fast = isbn_accept | id_accept
    accept_slow = ~issn_reject & ~year_reject & ~pages_reject & ~series_reject & title_ok & author_ok
    return fmt_ok & access_ok & (accept_fast | accept_slow)


def match_condition(a: str = "a", b: str = "b") -> Column:
    """The matchRecords decision as one boolean Column over a joined pair
    of record structs aliased ``a`` and ``b``.

    Expected columns per side: format, access_restrictions, isbn (array),
    unique_ids (array), issn (array), publish_year, page_count,
    series_issn, series_numbering, title, author.
    """
    return _match_condition_expr(a, b)


_MATCH_SQL_CACHE: dict = {}


def _match_condition_expr(
    a: str = "a", b: str = "b", pre_normalized: bool = False
) -> Column:
    """matchRecords compiled through the SQL-text twin: the same
    decision tree as :func:`_match_condition_from`, rendered to SQL once
    (pure Python) and parsed with ONE ``F.expr`` call instead of ~1.2k
    py4j round trips of Column construction per dedup build (guide
    §4/§5 — the r12 renormalize/fieldspec technique applied to the
    verify tree; parity pinned by tests/test_dedup.py). The SQL text is
    cached per (a, b, pre_normalized) — it is a function of nothing
    else."""
    key = (a, b, pre_normalized)
    sql = _MATCH_SQL_CACHE.get(key)
    if sql is None:
        from .. import sqlalg as SA
        from .. import sqltwin

        tw = sqltwin.dedup_twin()
        sql = str(
            tw._match_condition_from(
                lambda n: SA.col(f"{a}.{n}"),
                lambda n: SA.col(f"{b}.{n}"),
                pre_normalized=pre_normalized,
            )
        )
        _MATCH_SQL_CACHE[key] = sql
    return F.expr(sql)


_VERIFY_FIELDS = [
    "format",
    "access_restrictions",
    "isbn",
    "unique_ids",
    "issn",
    "publish_year",
    "page_count",
    "series_issn",
    "series_numbering",
    "title",
    "author",
]


def blocking_verified_edges(
    records: DataFrame,
    key_cols: list[str],
    id_col: str = "_id",
    source_col: str = "source_id",
    candidates_per_key: int = 101,
    verify_fields: list[str] | None = None,
    key_fold=None,
    distinct: bool = True,
) -> DataFrame:
    """Blocking + pairwise verification fused into ONE key shuffle.

    ``distinct=False`` skips the final edge-set dedup exchange: a pair
    sharing several blocking keys is emitted once per key. Every
    component resolver downstream is idempotent under duplicate edges
    (driver/task union-find, min-label propagation), so
    :func:`deduplicate` opts out and saves one corpus-pair shuffle +
    one sequential AQE stage; keep the default when the edge SET itself
    is the product.

    The verification payload rides inside the per-key candidate structs,
    so pair generation runs in-partition on the grouped array. Compared to
    blocking_pairs -> verified_edges (pair distinct + two record joins =
    three more corpus-sized exchanges), the corpus is shuffled once, by
    key. Title/author normalization keys are computed once per record
    before the explode, not once per generated pair.

    matchRecords itself is deliberately NOT evaluated inside the
    pair-generation lambda: higher-order-function lambdas are interpreted
    (CodegenFallback), so the levenshtein-heavy predicate would walk an
    expression tree per candidate pair. Instead the lambda only pairs up
    cross-source candidates (cheap), the pairs are exploded to rows, and
    the full predicate runs as a top-level Filter inside whole-stage
    codegen — the shape that stays fast when a hot key emits its capped
    ~5000 pairs per group at 100 TB.
    """
    fields = verify_fields or _VERIFY_FIELDS
    if key_fold is None:
        # default fold: compile the normalize_key trees through the
        # SQL-text twin (one parse each instead of per-node py4j chatter)
        from .. import sqlalg as SA
        from .. import sqltwin

        ktw = sqltwin.keys_twin()
        nk_title = F.expr(str(ktw.normalize_key(SA.col("title"))))
        nk_author = F.expr(str(ktw.normalize_key(SA.col("author"))))
    else:
        nk_title = key_fold(F.col("title"))
        nk_author = key_fold(F.col("author"))
    member = F.struct(
        F.col(id_col).alias("id"),
        F.col(source_col).alias("source"),
        *[F.col(f) for f in fields if f not in ("title", "author")],
        nk_title.alias("__nk_title"),
        nk_author.alias("__nk_author"),
    )
    # one corpus scan: concatenate the key arrays before the explode (a
    # union of per-column explodes re-scans the records — and re-runs the
    # key-gen expressions — once per key column). Semantics are identical:
    # the per-column branches shared one "key" namespace anyway.
    allkeys = F.concat(
        *[
            F.coalesce(F.col(k), F.array().cast("array<string>"))
            for k in key_cols
            if k in records.columns
        ]
    )
    # the member struct is computed in its OWN projection, then the keys
    # explode in a parent one: Spark's analyzer drops CreateStruct field
    # aliases when a generator and a lambda-bearing struct child share a
    # projection list (the kana fold inside normalize_key is a transform
    # lambda), which silently renames the verify payload fields
    prepared = records.select(member.alias("m"), allkeys.alias("__blk_keys"))
    keys = prepared.select(
        F.explode("__blk_keys").alias("key"), F.col("m")
    ).where(F.col("key") != "")
    # struct comparison orders by field position: id first, so array_sort
    # keeps the reference's created-order determinism (id_a < id_b).
    # Bounded-state cap (r7): over-cap poison keys contribute salted-min
    # representatives instead of slicing an unbounded collect buffer —
    # see _capped_key_groups; work stays <= cap²/2 pairs per key (the
    # reference's truncation bound, DedupHandler.php:466-467).
    grouped = _capped_key_groups(keys, F.col("m"), "id", candidates_per_key)
    # Pair generation emits (i, j) INDEX pairs, not payload-struct pairs:
    # a capped hot key yields up to ~5050 pairs, and materializing two full
    # verify payloads (key arrays + normalized title/author strings) per
    # pair before the explode costs tens of MB of transient row memory on
    # poison keys. Index pairs are 8 bytes each; the payload structs are
    # projected from __c AFTER the explode, one row at a time.
    n = F.size(F.col("__c"))
    empty_idx = F.array().cast("array<int>")
    idx_pairs = F.filter(
        F.flatten(
            F.transform(
                F.sequence(F.lit(1), n),
                # sequence(a, b) DESCENDS when a > b, so the inner range
                # needs an explicit empty guard for the last index
                lambda i: F.transform(
                    F.when(i < n, F.sequence(i + 1, n)).otherwise(empty_idx),
                    lambda j: F.when(
                        try_element_at(F.col("__c"), i)["source"]
                        != try_element_at(F.col("__c"), j)["source"],
                        F.struct(i.alias("i"), j.alias("j")),
                    ),
                ),
            )
        ),
        lambda p: p.isNotNull(),
    )
    pairs = grouped.select(
        F.col("__c"), F.explode(idx_pairs).alias("__p")
    ).select(
        try_element_at(F.col("__c"), F.col("__p.i")).alias("a"),
        try_element_at(F.col("__c"), F.col("__p.j")).alias("b"),
    )
    match = _match_condition_expr("a", "b", pre_normalized=True)
    # sources ride along (functionally dependent on the ids, so the
    # distinct is unchanged) — they let ``deduplicate`` enforce the
    # one-per-source invariant driver-side without a second record pass.
    out = pairs.where(match).select(
        F.col("a.id").alias("id_a"),
        F.col("b.id").alias("id_b"),
        F.col("a.source").alias("src_a"),
        F.col("b.source").alias("src_b"),
    )
    return out.distinct() if distinct else out


def verified_edges(
    records: DataFrame,
    pairs: DataFrame,
    id_col: str = "_id",
    fields: list[str] | None = None,
) -> DataFrame:
    """Join candidate pairs back to their payloads and keep matches.

    The pair table is tiny relative to the corpus — join it twice against
    the (pruned) record projection; Catalyst prunes the record scan to the
    verification columns only.
    """
    fields = fields or [
        "format",
        "access_restrictions",
        "isbn",
        "unique_ids",
        "issn",
        "publish_year",
        "page_count",
        "series_issn",
        "series_numbering",
        "title",
        "author",
    ]
    proj = records.select(F.col(id_col).alias("id"), *fields)
    a = proj.alias("a")
    b = proj.alias("b")
    joined = (
        pairs.join(a, pairs.id_a == F.col("a.id"))
        .join(b, pairs.id_b == F.col("b.id"))
    )
    keep = ["id_a", "id_b"] + [c for c in ("src_a", "src_b") if c in pairs.columns]
    return joined.where(match_condition("a", "b")).select(*keep)


# ---------------------------------------------------------------------------
# Connected components (small-diameter label propagation)
# ---------------------------------------------------------------------------


def connected_components(
    edges: DataFrame,
    max_iterations: int = 20,
    driver_threshold: int = 2_000_000,
    report: dict | None = None,
) -> DataFrame:
    """Min-label propagation over undirected edges (id_a, id_b).

    Returns (id, component) where component = min id reachable.

    Adaptive strategy: the verified-match edge set is tiny relative to the
    corpus (even 10^9 records rarely verify more than 10^7-10^8 pairs), so
    when it fits ``driver_threshold`` rows the components come from a
    driver-side union-find — one collect, zero iterative jobs. Beyond the
    threshold, distributed min-label propagation: dedup graphs have tiny
    diameter (groups of 2-10 records), so it converges in 2-4 iterations;
    each iteration is one join + one groupBy on the current labels, with
    ``localCheckpoint`` truncating lineage.

    Memory math for the default threshold: 2M edges = 4M Python string
    refs; at ~100 bytes per realistic record id (object header + text)
    the collected rows plus the union-find dict peak around 1-2 GB of
    driver heap — comfortably inside the default driver memory, with the
    distributed path taking over exactly where that stops being true.
    """
    # optimistic single action: take(threshold+1) both sizes the edge set
    # and fetches it when it fits the driver — the common case (verified
    # match edges are tiny relative to the corpus) runs ONE job with no
    # checkpoint write. Only the distributed fallback materializes.
    edges = edges.select("id_a", "id_b")
    pairs = _take_all_partitions(edges, driver_threshold + 1)
    if not pairs:
        spark = edges.sparkSession
        return spark.createDataFrame([], "id string, component string")
    if len(pairs) <= driver_threshold:
        if report is not None:
            report.update(path="driver", edges=len(pairs))
        parent = _union_find(pairs)
        members = set()
        for r in pairs:
            members.add(r.id_a)
            members.add(r.id_b)
        rows = [(m, _uf_find(parent, m)) for m in members]
        return _local_string_df(edges.sparkSession, rows, ["id", "component"])
    # distributed fallback: materialize the edge set once — the iterative
    # propagation reads it every round and must not re-run verification.
    # localCheckpoint blocks are non-resilient (executor loss fails the
    # job rather than recomputing) — acceptable for within-job iteration
    # state; re-run the job on preemptible-executor loss (ADVICE r12).
    if report is not None:
        report.update(path="distributed")
    return _cc_distributed(
        edges.localCheckpoint(eager=True), max_iterations, report=report
    )


def _take_all_partitions(df: DataFrame, n: int) -> list:
    """``df.take(n)`` with the limit scan starting on EVERY partition.

    Spark's take/CollectLimit probes partitions incrementally (1, then
    4x more per retry — ``spark.sql.limit.initialNumPartitions`` = 1,
    ``spark.sql.limit.scaleUpFactor`` = 4). For the adaptive-CC sizing
    take the threshold (2M edges) almost always exceeds the edge count,
    so the final-stage probe would always walk the full retry ladder;
    pinning initialNumPartitions for the one action removes it,
    semantics identical. Honest measurement note: under AQE (the
    session default) the construction wall-clock is dominated by the
    SEQUENTIAL materialization of the pipeline's query stages (one job
    per shuffle stage, ~2 s executor CPU vs ~4 s wall at sf0.1), which
    this conf does not and cannot collapse — the win here is bounded
    to the post-stage limit probe and to non-AQE deployments.

    Concurrency scope (r9, was an r8 ADVICE item): the pin lives in a
    ``newSession()`` clone — isolated SQLConf, shared SparkContext /
    catalog / shuffle state — and the ALREADY-ANALYZED plan is rebound
    to the clone via ``Dataset.ofRows``, so queries submitted
    concurrently on the parent session never observe the conf (re-using
    the analyzed plan also means no re-analysis under the clone's
    defaults — Cast eval modes etc. stay exactly as the parent resolved
    them). If the JVM internals ever move, the fallback is a plain
    ``take`` on the parent session with NO conf mutation (the retry
    ladder costs ~0.4 s at sf0.1; correctness identical)."""
    spark = df.sparkSession
    key = "spark.sql.limit.initialNumPartitions"
    try:
        sub = spark.newSession()
        # a large constant, NOT df.rdd.getNumPartitions(): accessing
        # .rdd on an AQE plan materializes its query stages (a whole
        # extra execution); the limit executor clamps to the actual
        # partition count
        sub.conf.set(key, "1000000")
        jvm = spark._jvm
        try:
            ds_cls = jvm.org.apache.spark.sql.classic.Dataset
        except Exception:  # pragma: no cover - Spark < 4 layout
            ds_cls = jvm.org.apache.spark.sql.Dataset
        jdf = ds_cls.ofRows(
            sub._jsparkSession, df._jdf.queryExecution().analyzed()
        )
        return DataFrame(jdf, sub).take(n)
    except Exception:
        # never mutate the shared session conf; eat the retry ladder
        return df.take(n)


def _union_find(pairs) -> dict:
    """Union-find over edge rows; min id becomes each root so the
    component label = smallest member id (the reference's group id pick,
    DedupHandler.php:559-627 smallest-id tie-break, made deterministic)."""
    parent: dict = {}
    for r in pairs:
        ra, rb = _uf_find(parent, r.id_a), _uf_find(parent, r.id_b)
        if ra != rb:
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo
    return parent


def _uf_find(parent: dict, x):
    root = x
    while parent.get(root, root) != root:
        root = parent[root]
    while parent.get(x, x) != x:
        parent[x], x = root, parent[x]
    return root


def _assignment_core(quads) -> list[tuple[str, str | None]]:
    """Components + one-per-source + min-group-size-2 over an iterable of
    (id_a, id_b, src_a, src_b) tuples — the shared core of the driver-side
    and task-side assignment paths.

    Within a component, the smallest id per source is kept (the batch form
    of the reference's greedy one-per-source insert, addToDedupRecord
    :1221-1242, ordered by id); extras get a null component, and groups
    left with < 2 members dissolve (removeFromDedupRecord :672-741)."""
    parent: dict = {}
    srcs: dict = {}
    for id_a, id_b, src_a, src_b in quads:
        ra, rb = _uf_find(parent, id_a), _uf_find(parent, id_b)
        if ra != rb:
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo
        srcs[id_a] = src_a
        srcs[id_b] = src_b
    groups: dict = {}
    for m in srcs:
        groups.setdefault(_uf_find(parent, m), []).append(m)
    out: list[tuple[str, str | None]] = []
    for root, members in groups.items():
        best: dict = {}
        for m in members:
            s = srcs[m]
            if s not in best or m < best[s]:
                best[s] = m
        kept = set(best.values())
        comp = root if len(kept) >= 2 else None
        for m in members:
            out.append((m, comp if m in kept else None))
    return out


def _driver_assignment(pairs) -> list[tuple[str, str | None]]:
    """Driver-side assignment over collected edge Rows."""
    return _assignment_core(
        (r.id_a, r.id_b, r.src_a, r.src_b) for r in pairs
    )


def _assign_components_task(
    edges: DataFrame, task_threshold: int = 2_000_000
) -> DataFrame:
    """LAZY single-task assignment: the union-find + invariants run inside
    an Arrow task over the (small) verified-edge set instead of on the
    driver at CONSTRUCTION time.

    Why: the driver-side take() is an eager action — registering or
    submitting a dedup query paid the full blocking+verify pipeline
    before the job even started (the round-5/6 construction census showed
    dedup_er ~6 s of pure build time), and every noop-bench run conflated
    that construction with execution. This shape defers everything to
    materialization: ``repartition(1)`` (an explicit exchange carrying
    ONLY edge rows, so the upstream verify stage keeps its parallelism —
    ``coalesce(1)`` would collapse it) feeds one Arrow task that streams
    the edge batches through the same union-find core.

    Memory contract: state is O(nodes) (the parent/source dicts), bounded
    by ``task_threshold`` edges — the same 2M default as the driver path,
    same ~1-2 GB peak, now in an executor instead of the driver. Past the
    threshold the task raises a LOUD error naming the fix
    (``cc_strategy='distributed'``) rather than silently degrading."""
    import pandas as pd

    def assign(batches):
        total = 0

        def quads():
            nonlocal total
            for b in batches:
                total += len(b)
                if total > task_threshold:
                    raise RuntimeError(
                        f"verified-edge set exceeds {task_threshold} rows — "
                        "the single-task union-find would hold O(nodes) "
                        "state past its memory contract; re-run with "
                        "cc_strategy='distributed' (label propagation + "
                        "windowed invariant enforcement)"
                    )
                yield from zip(
                    b["id_a"], b["id_b"], b["src_a"], b["src_b"]
                )

        out = _assignment_core(quads())
        yield pd.DataFrame(out or None, columns=["id", "component"])

    return edges.select("id_a", "id_b", "src_a", "src_b").repartition(
        1
    ).mapInPandas(assign, "id string, component string")


def _assign_components(
    edges: DataFrame,
    records: DataFrame,
    id_col: str = "_id",
    source_col: str = "source_id",
    driver_threshold: int = 2_000_000,
    strategy: str = "task",
) -> DataFrame:
    """(id_a, id_b, src_a, src_b) edges -> (id, component) with the group
    invariants enforced.

    ``strategy``:
    - ``"adaptive"`` (alias ``"driver"``, the default reached through
      :func:`deduplicate`): one take() both sizes the edge set and
      fetches it when it fits (components resolve driver-side at
      CONSTRUCTION time), automatically falling back to the distributed
      path past the threshold — never fails at materialization.
    - ``"task"``: fully LAZY — the union-find + invariants run in one
      Arrow task over the edge set at materialization time
      (:func:`_assign_components_task`). Registering/submitting the query
      costs zero Spark jobs; the edge-count memory contract raises loudly
      past ``driver_threshold``. Opt-in where submission latency matters
      and the edge count is known to fit.
    - ``"distributed"``: label propagation + windowed invariant
      enforcement — the unbounded-edge-set path.
    """
    if strategy == "task":
        return _assign_components_task(edges, driver_threshold)
    if strategy == "adaptive":
        strategy = "driver"
    if strategy == "driver":
        rows = _take_all_partitions(edges, driver_threshold + 1)
        spark = edges.sparkSession
        if not rows:
            return spark.createDataFrame([], "id string, component string")
        if len(rows) <= driver_threshold:
            return _local_string_df(
                spark, _driver_assignment(rows), ["id", "component"]
            )
        strategy = "distributed"
    if strategy != "distributed":
        raise ValueError(
            f"strategy must be 'adaptive', 'task', 'driver', or 'distributed': {strategy!r}"
        )
    # distributed: materialize the edge set once (the iterative
    # propagation reads it every round and must not re-run verification),
    # then enforce invariants with the windowed pass over the records.
    comps = _cc_distributed(edges.select("id_a", "id_b").localCheckpoint(eager=True))
    return enforce_one_per_source(comps, records, id_col, source_col)


def _cc_distributed(
    edges: DataFrame, max_iterations: int = 20, report: dict | None = None
) -> DataFrame:
    """Distributed min-label propagation with pointer jumping.

    Each iteration does (a) one-hop propagation — every node offers its
    label to its neighbors — and (b) a shortcut step mapping each node's
    label through that label's OWN label (labels are node ids of the
    same component, so the composition is sound and monotone
    decreasing). The shortcut gives O(log diameter) convergence — a
    chain of length L resolves in ~log2(L) rounds, not L — so
    ``max_iterations=20`` covers diameters past 10^6. Converged = a
    fixpoint round with no label change; running out of iterations
    raises (better a loud error than silently-split dedup groups).
    """
    sym = edges.select(
        F.col("id_a").alias("src"), F.col("id_b").alias("dst")
    ).unionByName(
        edges.select(F.col("id_b").alias("src"), F.col("id_a").alias("dst"))
    )
    # initial label = min neighbor (including self)
    labels = (
        sym.groupBy("src")
        .agg(F.least(F.min("dst"), F.min("src")).alias("component"))
        .withColumnRenamed("src", "id")
        .localCheckpoint(eager=True)
    )
    for it in range(max_iterations):
        # neighbor labels: for each edge, candidate label of dst =
        # label(src); folded in via LEFT JOIN + least, NOT a union with
        # labels — a Union whose child mixes join-derived constraints
        # with the labels relation trips Spark's constraint rewrite
        # (UnionBase.rewriteConstraints "key not found" on non-nullable
        # inputs, e.g. edges built from range()); the join formulation
        # is semantically identical (least() skips the null for nodes
        # with no incoming offer) and constraint-safe.
        neigh_min = (
            sym.join(labels, sym.src == labels.id)
            .groupBy(F.col("dst").alias("id"))
            .agg(F.min("component").alias("__n_comp"))
        )
        hop = labels.join(neigh_min, "id", "left").select(
            "id",
            F.least(F.col("component"), F.col("__n_comp")).alias(
                "component"
            ),
        )
        # pointer jumping: component(id) -> min(component(id),
        # component(component(id))) — least() skips the (impossible)
        # null from the left join, every label is itself a labeled node
        new_labels = (
            hop.alias("l1")
            .join(
                hop.alias("l2"),
                F.col("l1.component") == F.col("l2.id"),
                "left",
            )
            .select(
                F.col("l1.id").alias("id"),
                F.least(
                    F.col("l1.component"), F.col("l2.component")
                ).alias("component"),
            )
            .localCheckpoint(eager=True)
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "id")
            .where(F.col("n.component") != F.col("o.component"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            if report is not None:
                # iterations = propagation rounds RUN (the fixpoint
                # round that detected convergence included)
                report["iterations"] = it + 1
            return labels
    raise RuntimeError(
        f"connected components did not converge in {max_iterations} "
        "label-propagation iterations — raise max_iterations (diameter "
        "past ~2^max_iterations) or inspect the edge set"
    )


def enforce_one_per_source(
    components: DataFrame,
    records: DataFrame,
    id_col: str = "_id",
    source_col: str = "source_id",
    order_col: str | None = None,
) -> DataFrame:
    """≤1 record per source per group (DedupHandler.php:1221-1242).

    Batch variant of the reference's greedy insert: within a component,
    keep the first record per source (by ``order_col`` or id); extras
    leave the group (component -> null). Groups shrinking below 2 members
    dissolve (reference removeFromDedupRecord :672-741)."""
    j = components.join(
        records.select(F.col(id_col).alias("id"), F.col(source_col).alias("source")),
        "id",
    )
    w = Window.partitionBy("component", "source").orderBy(
        F.col(order_col or "id").asc()
    )
    kept = j.withColumn("__rn", F.row_number().over(w))
    kept = kept.withColumn(
        "component", F.when(F.col("__rn") == 1, F.col("component"))
    ).drop("__rn", "source")
    sizes = (
        kept.where(F.col("component").isNotNull())
        .groupBy("component")
        .agg(F.count(F.lit(1)).alias("__n"))
    )
    out = kept.join(F.broadcast(sizes), "component", "left").withColumn(
        "component",
        F.when(F.col("__n") >= 2, F.col("component")),
    ).drop("__n")
    return out.select("id", "component")


def deduplicate(
    records: DataFrame,
    id_col: str = "_id",
    source_col: str = "source_id",
    key_cols: list[str] | None = None,
    verify_fields: list[str] | None = None,
    candidates_per_key: int = 101,
    key_fold=None,
    cc_strategy: str = "adaptive",
) -> DataFrame:
    """End-to-end dedup: records (with key columns) -> (id, dedup_id).

    dedup_id is the smallest member id of the group; null for singletons.

    One corpus pass: the fused blocking+verify shuffle emits
    (id_a, id_b, src_a, src_b) edges; ``cc_strategy`` picks how
    components + group invariants resolve:

    - ``"adaptive"`` (default): one take() both sizes the edge set and
      fetches it when it fits (driver union-find), automatically falling
      back to distributed label propagation past 2M edges — NEVER fails
      at materialization, whatever the edge count turns out to be. The
      sizing take() is an eager action at construction (the census
      prices it ~2-3 s at sf0.01). This was re-pinned as the default per
      the round-6 ADVICE: at 100 TB edge counts are unpredictable, and a
      default that can turn a formerly-working job into a RuntimeError
      is the wrong trade for construction latency.
    - ``"task"``: FULLY LAZY — components + invariants resolve inside
      one Arrow task at materialization; building the query runs zero
      Spark jobs. Opt in where submission latency matters AND the
      verified-edge set is known to fit the 2M-edge task contract
      (past it the task raises a loud error naming the fix rather than
      silently degrading).
    - ``"distributed"``: forced label propagation + windowed invariant
      enforcement — the unbounded-edge-set path.

    No persist — the pruned projection is scanned once (column-pruned
    parquet read).
    """
    proj_cols = {id_col, source_col}
    proj_cols.update(key_cols or ["isbn_keys", "id_keys", "title_keys"])
    proj_cols.update(verify_fields or _VERIFY_FIELDS)
    records = records.select(*[c for c in records.columns if c in proj_cols])
    edges = blocking_verified_edges(
        records,
        key_cols or ["isbn_keys", "id_keys", "title_keys"],
        id_col,
        source_col,
        candidates_per_key,
        verify_fields,
        key_fold,
        # every CC strategy below is idempotent under duplicate edges —
        # skipping the edge-set distinct saves one shuffle + one
        # sequential AQE stage; the adaptive sizing threshold then
        # counts raw pair emissions (strictly conservative: it can only
        # switch to the distributed path EARLIER)
        distinct=False,
    )
    comps = _assign_components(edges, records, id_col, source_col,
                               strategy=cc_strategy)
    return comps.withColumnRenamed("component", "dedup_id")


# ---------------------------------------------------------------------------
# Component-part dedup (DedupHandler.php:1255-1372)
# ---------------------------------------------------------------------------


def component_part_edges(
    hosts: DataFrame,
    components: DataFrame,
    host_id_col: str = "_id",
    comp_id_col: str = "_id",
    comp_host_col: str = "host_id",
    source_col: str = "source_id",
    dedup_col: str = "dedup_id",
    verify_fields: list[str] | None = None,
) -> DataFrame:
    """Match edges between component parts of duplicate hosts.

    Reference semantics: for two hosts in the same dedup group (different
    sources), sort each host's components by id sort key; if the lists have
    equal length AND every aligned pair passes matchRecords, each aligned
    pair becomes a duplicate pair. Batch shape: position-align components
    with a window, join on (host pair, position), verify pairwise, then
    keep only host pairs where matched == len1 == len2.
    """
    from ..functions.keys import create_id_sort_key

    h = hosts.where(F.col(dedup_col).isNotNull()).select(
        F.col(host_id_col).alias("hid"),
        F.col(source_col).alias("hsrc"),
        F.col(dedup_col).alias("hdedup"),
    )
    host_pairs = (
        h.alias("h1")
        .join(
            h.alias("h2"),
            (F.col("h1.hdedup") == F.col("h2.hdedup"))
            & (F.col("h1.hsrc") != F.col("h2.hsrc"))
            & (F.col("h1.hid") < F.col("h2.hid")),
        )
        .select(F.col("h1.hid").alias("host_a"), F.col("h2.hid").alias("host_b"))
    )

    w = Window.partitionBy(comp_host_col).orderBy(
        create_id_sort_key(F.col(comp_id_col)), F.col(comp_id_col)
    )
    comp = components.withColumn("__pos", F.row_number().over(w))
    counts = comp.groupBy(F.col(comp_host_col).alias("__h")).agg(
        F.count(F.lit(1)).alias("__n")
    )

    fields = verify_fields or [
        "format", "access_restrictions", "isbn", "unique_ids", "issn",
        "publish_year", "page_count", "series_issn", "series_numbering",
        "title", "author",
    ]
    proj = comp.select(
        F.col(comp_id_col).alias("id"),
        F.col(comp_host_col).alias("host"),
        F.col(source_col).alias("src"),
        F.col("__pos"),
        *[f for f in fields if f in comp.columns],
    )
    a, b = proj.alias("a"), proj.alias("b")
    aligned = (
        host_pairs.join(a, F.col("a.host") == F.col("host_a"))
        .join(
            b,
            (F.col("b.host") == F.col("host_b"))
            & (F.col("a.__pos") == F.col("b.__pos")),
        )
    )
    verified = aligned.withColumn("__ok", match_condition("a", "b"))
    per_pair = (
        verified.groupBy("host_a", "host_b")
        .agg(F.count(F.lit(1)).alias("__aligned"), F.sum(F.col("__ok").cast("int")).alias("__okn"))
        .join(counts.withColumnRenamed("__h", "host_a").withColumnRenamed("__n", "__na"), "host_a")
        .join(counts.withColumnRenamed("__h", "host_b").withColumnRenamed("__n", "__nb"), "host_b")
        .where(
            (F.col("__na") == F.col("__nb"))
            & (F.col("__okn") == F.col("__na"))
            & (F.col("__aligned") == F.col("__na"))
        )
        .select("host_a", "host_b")
    )
    return (
        verified.join(per_pair, ["host_a", "host_b"])
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a.src").alias("src_a"),
            F.col("b.src").alias("src_b"),
        )
    )


def dedup_component_parts(
    hosts: DataFrame,
    components: DataFrame,
    **kwargs,
) -> DataFrame:
    """Component-part dedup: returns (id, dedup_id) for component records.

    dedup_id = smallest member id (consistent with ``deduplicate``);
    components whose host pairs don't fully match stay ungrouped (the
    reference's zero-marked cleanup path)."""
    cc_strategy = kwargs.pop("cc_strategy", "adaptive")
    edges = component_part_edges(hosts, components, **kwargs)
    src_col = kwargs.get("source_col", "source_id")
    id_col = kwargs.get("comp_id_col", "_id")
    comps = _assign_components(edges, components, id_col, src_col,
                               strategy=cc_strategy)
    return comps.withColumnRenamed("component", "dedup_id")


# ---------------------------------------------------------------------------
# Incremental dedup (Command/Records/Deduplicate.php:216-317 semantics)
# ---------------------------------------------------------------------------


def deduplicate_incremental(
    records: DataFrame,
    existing: DataFrame,
    dirty_col: str = "update_needed",
    id_col: str = "_id",
    source_col: str = "source_id",
    key_cols: list[str] | None = None,
    verify_fields: list[str] | None = None,
    candidates_per_key: int = 101,
    cc_strategy: str = "adaptive",
) -> DataFrame:
    """Re-dedup only dirty rows against the full key index.

    ``existing`` is the prior (id, dedup_id) assignment. Semantics match
    the reference's per-record re-evaluation: a dirty record's old links
    are discarded and re-derived from scratch; clean records keep their
    mutual grouping (expressed as star edges to the smallest CLEAN member
    of each prior group, so a dirty ex-member can't transitively hold a
    group together).

    Scale shape: blocking explodes only the dirty rows' keys and probes the
    full key index with a broadcast-able dirty side — the 100 TB corpus is
    scanned once for the index, not self-joined.
    """
    key_cols = key_cols or ["isbn_keys", "id_keys", "title_keys"]
    ids = records.select(
        F.col(id_col).alias("id"),
        F.col(source_col).alias("source"),
        F.col(dirty_col).alias("dirty"),
        *[k for k in key_cols if k in records.columns],
    )
    allkeys = F.concat(
        *[
            F.coalesce(F.col(k), F.array().cast("array<string>"))
            for k in key_cols
            if k in ids.columns
        ]
    )
    keys = ids.select(
        "id", "source", "dirty", F.explode(allkeys).alias("key")
    ).where(F.col("key") != "")
    w = Window.partitionBy("key").orderBy(F.col("id"))
    keys = (
        keys.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= candidates_per_key)
        .drop("__rn")
    )
    dirty_keys = keys.where(F.col("dirty"))
    pairs = (
        dirty_keys.alias("d")
        .join(
            keys.alias("k"),
            (F.col("d.key") == F.col("k.key"))
            & (F.col("d.source") != F.col("k.source"))
            & (F.col("d.id") != F.col("k.id")),
        )
        .select(
            F.least(F.col("d.id"), F.col("k.id")).alias("id_a"),
            F.greatest(F.col("d.id"), F.col("k.id")).alias("id_b"),
            F.when(F.col("d.id") < F.col("k.id"), F.col("d.source"))
            .otherwise(F.col("k.source"))
            .alias("src_a"),
            F.when(F.col("d.id") < F.col("k.id"), F.col("k.source"))
            .otherwise(F.col("d.source"))
            .alias("src_b"),
        )
        .distinct()
    )
    new_edges = verified_edges(records, pairs, id_col, verify_fields)

    # prior groups among CLEAN members only, as star edges to the group's
    # smallest clean member
    clean = ids.where(~F.col("dirty")).select("id", "source")
    prior = (
        existing.withColumnRenamed(id_col, "id")
        if id_col in existing.columns
        else existing
    )
    prior_clean = prior.where(F.col("dedup_id").isNotNull()).join(clean, "id")
    rep = prior_clean.groupBy("dedup_id").agg(
        F.min("id").alias("__rep"), F.min_by("source", "id").alias("__rep_src")
    )
    prior_edges = (
        prior_clean.join(rep, "dedup_id")
        .where(F.col("id") != F.col("__rep"))
        .select(
            F.col("__rep").alias("id_a"),
            F.col("id").alias("id_b"),
            F.col("__rep_src").alias("src_a"),
            F.col("source").alias("src_b"),
        )
    )

    comps = _assign_components(
        new_edges.unionByName(prior_edges), records, id_col, source_col,
        strategy=cc_strategy,
    )
    return comps.withColumnRenamed("component", "dedup_id")


# ---------------------------------------------------------------------------
# Consistency checking (DedupHandler.php:176-303, Command/Records/CheckDedup)
# ---------------------------------------------------------------------------


def check_dedup_consistency(
    assignment: DataFrame,
    records: DataFrame,
    id_col: str = "_id",
    source_col: str = "source_id",
) -> DataFrame:
    """Validate a (id, dedup_id) assignment against the invariants.

    Returns (id, dedup_id, issue) rows for every violation:
    - ``singleton_group``: the group has < 2 members (reference deletes
      such groups, removeFromDedupRecord :672-741)
    - ``same_source_collision``: two members share a source (the ≤1 per
      source invariant, addToDedupRecord :1221-1242); every member of the
      colliding source except the smallest id is flagged
    - ``dangling_record``: the assignment references an id that no longer
      exists in the record store (checkRecordLinks repair path)
    Empty result = consistent. The repair is ``enforce_one_per_source`` /
    re-running ``deduplicate`` on the affected groups.
    """
    a = assignment.select(
        F.col(id_col).alias("id") if id_col in assignment.columns else F.col("id"),
        "dedup_id",
    ).where(F.col("dedup_id").isNotNull())
    recs = records.select(
        F.col(id_col).alias("id"), F.col(source_col).alias("__src")
    )
    j = a.join(recs, "id", "left")

    dangling = j.where(F.col("__src").isNull()).select(
        "id", "dedup_id", F.lit("dangling_record").alias("issue")
    )

    sizes = j.where(F.col("__src").isNotNull()).groupBy("dedup_id").agg(
        F.count(F.lit(1)).alias("__n")
    )
    singleton = (
        j.where(F.col("__src").isNotNull())  # dangling rows are not members
        .join(sizes, "dedup_id")
        .where(F.col("__n") < 2)
        .select("id", "dedup_id", F.lit("singleton_group").alias("issue"))
    )

    w = Window.partitionBy("dedup_id", "__src").orderBy("id")
    collisions = (
        j.where(F.col("__src").isNotNull())
        .withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") > 1)
        .select("id", "dedup_id", F.lit("same_source_collision").alias("issue"))
    )

    return dangling.unionByName(singleton).unionByName(collisions)
