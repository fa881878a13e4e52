"""Parallel FP-Growth (frequent itemset mining).

Reference anchors (studied, not copied): Mahout shipped PFPGrowth
(org.apache.mahout.fpm.pfpgrowth, removed from the modern tree; the
examples/ layer still references it, e.g.
examples/.../fpm/pfpgrowth/DeliciousTagsExample.java) implementing
Li et al., "PFP: Parallel FP-Growth for Query Recommendation"
(RecSys 2008) — a public algorithm:

1. one counting pass -> frequent-item list (f-list), ranked by
   descending support;
2. each transaction's frequent items are sorted by rank, and for each
   shard group g present in the transaction the PREFIX ending at the
   last group-g item is shipped to shard g (group-dependent
   transactions);
3. every shard mines a local FP-tree for patterns whose LAST (highest
   rank) item belongs to its group — shards are disjoint by
   construction, so the union needs no dedup;
4. optional top-K per item / aggregation pass.

Spark-first shape: step 1 is an explode + groupBy (map-side combined);
step 2 is a pure column pipeline (array_intersect with the broadcast
f-list, rank sort via transform on a broadcast rank map, one explode
per present group — fan-out bounded by n_groups); step 3 is one
applyInPandas with an in-core FP-tree per shard. The f-list (and its
rank map) is the only broadcast state, exactly the PFP design point:
it is O(frequent items), not O(corpus).

The in-core miner is exhaustive and exact (tests pin it against
brute-force subset counting), supports max_len to bound pattern size.
"""

from __future__ import annotations

from collections import defaultdict

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["fp_growth_incore", "parallel_fp_growth",
           "frequent_items", "frequent_itemsets_sql"]


# ---------------------------------------------------------------------------
# in-core FP-tree miner
# ---------------------------------------------------------------------------

def _mine(transactions, min_support, rank, max_len, suffix, out,
          suffix_allowed):
    """Recursive conditional-tree mining. ``transactions`` hold items

    sorted by rank; patterns grow by prepending lower-rank items to
    ``suffix``. ``suffix_allowed`` gates which single items may START a
    pattern (PFP group restriction applies only to the pattern's
    highest-rank item = the first suffix chosen)."""
    counts = defaultdict(int)
    for items, mult in transactions:
        for it in items:
            counts[it] += mult
    freq = [it for it, c in counts.items() if c >= min_support]
    freq.sort(key=lambda it: rank[it])
    for it in freq:
        if not suffix and suffix_allowed is not None \
                and it not in suffix_allowed:
            continue
        pat = (it,) + suffix
        out[pat] = counts[it]
        if max_len and len(pat) >= max_len:
            continue
        # conditional pattern base of `it`: prefixes strictly before it
        cond = []
        for items, mult in transactions:
            if it in items:
                pre = items[:items.index(it)]
                pre = tuple(p for p in pre if counts[p] >= min_support)
                if pre:
                    cond.append((pre, mult))
        if cond:
            _mine(cond, min_support, rank, max_len, pat, out, None)


def fp_growth_incore(transactions, min_support: int,
                     max_len: int | None = None,
                     items_filter=None) -> dict:
    """{itemset tuple (rank-ordered): support} over a list of item

    iterables. Exact and exhaustive (the pytest brute-force twin)."""
    counts = defaultdict(int)
    for t in transactions:
        for it in set(t):
            counts[it] += 1
    flist = [it for it, c in counts.items() if c >= min_support]
    # canonical f-list rank: support desc, item asc (deterministic)
    flist.sort(key=lambda it: (-counts[it], it))
    rank = {it: i for i, it in enumerate(flist)}
    txns = []
    for t in transactions:
        items = sorted({it for it in t if it in rank},
                       key=lambda it: rank[it])
        if items:
            txns.append((tuple(items), 1))
    out: dict = {}
    _mine(txns, min_support, rank, max_len, (), out, items_filter)
    return out


# ---------------------------------------------------------------------------
# distributed PFP
# ---------------------------------------------------------------------------

def frequent_items(items: DataFrame, min_support: int,
                   item_col: str = "item",
                   txn_col: str = "txn_id") -> DataFrame:
    """(item, support) of frequent items — ONE distinct+groupBy pass."""
    return (items.select(txn_col, item_col).distinct()
            .groupBy(item_col).agg(F.count("*").alias("support"))
            .filter(F.col("support") >= min_support))


def parallel_fp_growth(items: DataFrame, min_support: int,
                       item_col: str = "item", txn_col: str = "txn_id",
                       max_len: int | None = None,
                       n_groups: int = 32) -> DataFrame:
    """(itemset array<string> rank-ordered, support) — PFP over

    (txn_id, item) rows. Counting pass -> broadcast f-list ->
    group-dependent prefix shipping -> per-group in-core FP-growth.
    Shards mine disjoint pattern sets (split by the pattern's highest-
    rank item), so results union without dedup; supports are exact.
    """
    import pandas as pd

    spark = items.sparkSession
    flist = (frequent_items(items, min_support, item_col, txn_col)
             .collect())
    # rank: support desc, item asc — same order as fp_growth_incore
    flist.sort(key=lambda r: (-r["support"], r[item_col]))
    rank = {r[item_col]: i for i, r in enumerate(flist)}
    if not rank:
        return spark.createDataFrame(
            [], "itemset array<string>, support long")
    n_groups = min(n_groups, len(rank))
    group_of = {it: i % n_groups for it, i in
                ((it, rank[it]) for it in rank)}

    rank_items = [it for it, _ in sorted(rank.items(),
                                         key=lambda kv: kv[1])]
    rank_arr = F.array(*[F.lit(it) for it in rank_items])

    # transaction as rank-sorted frequent items: collect_set dedups (no
    # separate distinct shuffle), and intersecting FROM the rank array
    # yields items already in rank order (array_intersect preserves
    # left order)
    txn = (items.groupBy(txn_col)
           .agg(F.collect_set(item_col).alias("__raw"))
           .select(F.array_intersect(rank_arr, F.col("__raw"))
                   .alias("__items"))
           .filter(F.size("__items") > 0))

    # ship prefix to each group present: group id of an item = its
    # f-list rank mod G, via a literal JVM-side lookup map
    lookup = F.map_from_arrays(
        F.array(*[F.lit(it) for it in rank_items]),
        F.array(*[F.lit(r % n_groups) for r in range(len(rank_items))]))
    with_groups = txn.select(
        "__items",
        F.array_distinct(F.transform(
            F.col("__items"),
            lambda it: F.element_at(lookup, it))).alias("__groups"))

    shards = with_groups.select(
        F.explode("__groups").alias("__g"), "__items")

    def mine(pdf: pd.DataFrame) -> pd.DataFrame:
        g = int(pdf["__g"].iloc[0])
        allowed = {it for it, gi in group_of.items() if gi == g}
        # truncate each shipped transaction at the last group-g item
        txns = []
        for arr in pdf["__items"]:
            items_t = list(arr)
            last = max((i for i, it in enumerate(items_t)
                        if it in allowed), default=-1)
            if last >= 0:
                txns.append((tuple(items_t[:last + 1]), 1))
        out = {}
        _mine(txns, min_support, rank, max_len, (), out, allowed)
        rows = [(list(k), v) for k, v in out.items()]
        return pd.DataFrame(rows, columns=["itemset", "support"])

    return (shards.groupBy("__g")
            .applyInPandas(mine,
                           schema="itemset array<string>, support long"))


# ---------------------------------------------------------------------------
# gate oracle: brute-force itemsets up to size 3
# ---------------------------------------------------------------------------

def frequent_itemsets_sql(source_sql: str, min_support: int,
                          max_len: int = 3) -> str:
    """DuckDB twin for max_len <= 3: exact supports by distinct-item

    self-joins; itemsets emitted as sorted-item csv strings (the
    driver-side comparison key). ``source_sql`` yields (txn_id, item).
    """
    assert max_len in (1, 2, 3)
    parts = ["""
SELECT item AS itemset, count(*)::BIGINT AS support
FROM t GROUP BY item HAVING count(*) >= {ms}"""]
    if max_len >= 2:
        parts.append("""
SELECT a.item || ',' || b.item, count(*)
FROM t a JOIN t b ON a.txn_id = b.txn_id AND a.item < b.item
GROUP BY 1 HAVING count(*) >= {ms}""")
    if max_len >= 3:
        parts.append("""
SELECT a.item || ',' || b.item || ',' || c.item, count(*)
FROM t a JOIN t b ON a.txn_id = b.txn_id AND a.item < b.item
         JOIN t c ON a.txn_id = c.txn_id AND b.item < c.item
GROUP BY 1 HAVING count(*) >= {ms}""")
    union = "\nUNION ALL\n".join(p.format(ms=min_support) for p in parts)
    return f"""
WITH src AS ({source_sql}),
t AS (SELECT DISTINCT txn_id, item FROM src)
{union}
"""
