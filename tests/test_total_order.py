"""Total-order guard for every ranked window in the registry.

The bug class this pins (VERDICT r8 task #3) is now 2-for-2 across
rounds: `row_number` (or any other row-ORDER-sensitive window function)
evaluated over a sort key that TIES on the fixture is engine-arbitrary
— the r8 `stats_spearman_rank` red row tied because the fixture's
lineitem (l_orderkey, l_linenumber) is non-unique (see FIXTURES.md),
and an earlier round's range-partition sampling failed the same way.

The guard walks the OPTIMIZED logical plan of every registered batch
query, finds each Window node whose expressions are order-sensitive
(row_number / ntile / lead / lag / nth_value / first / last /
collect_list, or ANY aggregate over a ROWS frame narrower than the
full partition — frame membership then depends on physical row order;
rank / dense_rank / percent_rank / cume_dist and RANGE frames are
tie-safe by value), re-materializes the window's CHILD frame via
Dataset.ofRows, and asserts the (partitionSpec ++ orderSpec) key has
ZERO tie groups on the fixture — i.e. the window is evaluated over a
total order, so its output is engine- and partitioning-independent.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from taps_spark.queries import REGISTRY, _load

_load()

#: Windows whose (partition ++ order) key could not be re-evaluated as
#: selectExpr SQL on the child frame (e.g. exprId-ambiguous names).
#: Every entry needs a justification comment; an UNLISTED unevaluable
#: window fails the gate loudly.
UNEVALUABLE_ALLOWLIST: dict[str, str] = {}

_TIE_SAFE_HEADS = ("rank(", "dense_rank(", "percent_rank(", "cume_dist(")
_ALWAYS_SENSITIVE_HEADS = (
    "row_number(",
    "ntile(",
    "lead(",
    "lag(",
    "nth_value(",
    "first(",
    "last(",
    "collect_list(",
    "array_agg(",
)
_FULL_PARTITION = "unboundedpreceding$(), unboundedfollowing$()"


def _is_order_sensitive(expr_str: str) -> bool:
    head = expr_str.split(" windowspecdefinition", 1)[0].lstrip()
    if head.startswith(_TIE_SAFE_HEADS):
        return False
    if head.startswith(_ALWAYS_SENSITIVE_HEADS):
        return True
    # Any remaining aggregate over a ROWS frame that is not the full
    # partition: which rows fall inside the frame depends on the
    # physical order of sort-key ties.
    return (
        "specifiedwindowframe(RowFrame" in expr_str
        and _FULL_PARTITION not in expr_str
    )


def _window_nodes(df):
    stack = [df._jdf.queryExecution().optimizedPlan()]
    while stack:
        node = stack.pop()
        if node.getClass().getSimpleName() == "Window":
            yield node
        ch = node.children()
        for i in range(ch.size()):
            stack.append(ch.apply(i))


def _seq(jseq):
    return [jseq.apply(i) for i in range(jseq.size())]


def _sensitive_window_keys(df):
    """Yield (key_exprs, child_plan) for every order-sensitive Window
    in df's optimized plan; key_exprs = partition + order-child JVM
    Catalyst expressions."""
    for w in _window_nodes(df):
        if not any(
            _is_order_sensitive(e.toString()) for e in _seq(w.windowExpressions())
        ):
            continue
        parts = _seq(w.partitionSpec())
        orders = [so.child() for so in _seq(w.orderSpec())]
        yield parts + orders, w.child()


def _max_tie_group(spark, child_plan, key_exprs, _cache={}):
    """Largest group size of the key over the window's child frame —
    1 means the sort key is a total order within every partition."""
    cache_key = (child_plan.semanticHash(), tuple(e.sql() for e in key_exprs))
    if cache_key not in _cache:
        jdf = spark._jvm.org.apache.spark.sql.classic.Dataset.ofRows(
            spark._jsparkSession, child_plan
        )
        from pyspark.sql.classic.dataframe import DataFrame as CDF

        cdf = CDF(jdf, spark)
        out = _seq(child_plan.output())
        names = [a.name() for a in out]
        if len(set(names)) == len(names):
            keyed = cdf.select(
                *[F.expr(e.sql()).alias(f"k{i}") for i, e in enumerate(key_exprs)]
            )
        else:
            # Duplicate output names (self-join children): `.sql()` is
            # ambiguous, so resolve each key attribute POSITIONALLY by
            # exprId and select through a fully-renamed frame.
            pos_by_id = {out[i].exprId().id(): i for i in range(len(out))}
            idxs = []
            for e in key_exprs:
                if e.getClass().getSimpleName() != "AttributeReference":
                    raise ValueError(
                        f"non-attribute key {e.sql()} over duplicate-name child"
                    )
                idxs.append(pos_by_id[e.exprId().id()])
            renamed = cdf.toDF(*[f"c{i}" for i in range(len(out))])
            keyed = renamed.select(
                *[F.col(f"c{ix}").alias(f"k{i}") for i, ix in enumerate(idxs)]
            )
        row = (
            keyed.groupBy(*[f"k{i}" for i in range(len(key_exprs))])
            .count()
            .agg(F.max("count"))
            .first()
        )
        _cache[cache_key] = int(row[0]) if row[0] is not None else 1
    return _cache[cache_key]


def test_every_ranked_window_is_a_total_order(spark, sf_dir):
    violations: dict[str, list] = {}
    unevaluable: dict[str, str] = {}
    for name, rq in REGISTRY.items():
        if name.startswith("events_stream"):
            continue  # streaming plans materialize only on query start
        df = rq.fn(spark, sf_dir)
        for keys, child in _sensitive_window_keys(df):
            if not keys:
                violations.setdefault(name, []).append("EMPTY window key")
                continue
            try:
                mx = _max_tie_group(spark, child, keys)
            except Exception as ex:  # noqa: BLE001 — recorded, then gated
                unevaluable[name] = f"{[e.sql() for e in keys]}: {str(ex)[:120]}"
                continue
            if mx > 1:
                violations.setdefault(name, []).append(
                    f"key {[e.sql() for e in keys]} has a tie group of {mx} rows"
                )
    assert not violations, violations
    stray = {k: v for k, v in unevaluable.items() if k not in UNEVALUABLE_ALLOWLIST}
    assert not stray, f"unevaluable window keys need allowlisting: {stray}"


def test_total_order_guard_fires_on_known_bad_key(spark, sf_dir):
    """Red-team case: the exact r8 spearman bug — row_number tiebroken
    by (value, l_orderkey, l_linenumber) on lineitem, which FIXTURES.md
    records as non-unique. The guard must detect the tie groups."""
    from pyspark.sql import Window

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    w = Window.partitionBy("l_returnflag").orderBy(
        "l_quantity", "l_orderkey", "l_linenumber"
    )
    df = li.select("l_returnflag", F.row_number().over(w).alias("rn"))
    found = list(_sensitive_window_keys(df))
    assert found, "guard failed to find the row_number window"
    keys, child = found[0]
    assert _max_tie_group(spark, child, keys) > 1, (
        "fixture regenerated with unique (l_orderkey, l_linenumber)? "
        "Update FIXTURES.md if so."
    )


def test_rank_and_range_frames_are_tie_safe():
    """The sensitivity classifier must not flag tie-safe shapes."""
    assert not _is_order_sensitive(
        "rank(x#1) windowspecdefinition(p#2, x#1 ASC NULLS FIRST, "
        "specifiedwindowframe(RowFrame, unboundedpreceding$(), currentrow$()))"
    )
    assert not _is_order_sensitive(
        "sum(v#3) windowspecdefinition(p#2, x#1 ASC NULLS FIRST, "
        "specifiedwindowframe(RangeFrame, unboundedpreceding$(), currentrow$()))"
    )
    assert not _is_order_sensitive(
        "sum(v#3) windowspecdefinition(p#2, x#1 ASC NULLS FIRST, "
        "specifiedwindowframe(RowFrame, unboundedpreceding$(), unboundedfollowing$()))"
    )
    assert _is_order_sensitive(
        "row_number() windowspecdefinition(p#2, x#1 ASC NULLS FIRST, "
        "specifiedwindowframe(RowFrame, unboundedpreceding$(), currentrow$()))"
    )
    assert _is_order_sensitive(
        "sum(v#3) windowspecdefinition(p#2, x#1 ASC NULLS FIRST, "
        "specifiedwindowframe(RowFrame, unboundedpreceding$(), currentrow$()))"
    )
