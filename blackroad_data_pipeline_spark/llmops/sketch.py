"""Frequency / cardinality sketch operators — the bounded-memory
summaries a 100 TB profiling pass leans on when exact per-key state
would not fit anywhere: heavy hitters (Misra-Gries candidates + exact
recount) and mergeable HyperLogLog distinct-count sketches.

Design rule shared with the dedup family: the sketch only BOUNDS the
candidate set or the state; whenever the final answer can be made
exact with a semi-join-pruned second pass, it is — approximate
machinery routes work, it never decides results (heavy_hitters'
approx mode returns byte-identical output to exact mode).

The reference has no sketch surface at all; this extends it the same
way dedup/similarity do (SURVEY.md §2.6).
"""

from __future__ import annotations

from collections.abc import Iterator, Mapping

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..operators.registry import register


@register("heavy_hitters")
def op_heavy_hitters(df: DataFrame, config: Mapping, views) -> DataFrame:
    """All values of ``field`` with frequency strictly above ``1/k``
    of the rows (count * k > N) — the frequent-items / top-share
    profile (domains dominating a crawl, users dominating an event
    stream, tokens dominating a corpus).

    - ``mode: "exact"`` (default): groupBy count + a broadcast 1-row
      total — one key shuffle over ALL distinct values. Correct at
      any scale, but the shuffle carries the full key cardinality.
    - ``mode: "approx"``: Misra-Gries candidate generation inside
      each partition (``capacity`` counters, default 8*k — bounded
      memory regardless of key cardinality), then an EXACT recount of
      only the candidate keys (broadcast semi-join prunes the shuffle
      to candidate rows). The MG averaging guarantee (any value with
      global share > 1/capacity survives in at least one partition)
      makes the candidate set a superset of the true heavy hitters
      whenever capacity >= k, so the output is IDENTICAL to exact
      mode — the contract queries share one oracle.

    Output: value, n_occurrences (long), share (double = exact
    long/long division). NULL values are excluded in both modes (a
    NULL key cannot ride the candidate semi-join, so exact mode drops
    it too to keep the modes byte-identical); N counts non-null rows.
    """
    field = config["field"]
    k = int(config.get("k", 100))
    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    mode = config.get("mode", "exact")
    if mode not in ("exact", "approx"):
        raise ValueError(f"heavy_hitters mode must be exact|approx, got {mode!r}")
    vals = (df.select(F.col(field).alias("value"))
            .filter(F.col("value").isNotNull()))

    def finish(counts: DataFrame, total: DataFrame) -> DataFrame:
        return (counts.crossJoin(F.broadcast(total))
                .filter(F.col("n_occurrences") * k > F.col("__total"))
                .select("value", "n_occurrences",
                        (F.col("n_occurrences").cast("double")
                         / F.col("__total")).alias("share")))

    if mode == "exact":
        counts = vals.groupBy("value").agg(
            F.count(F.lit(1)).alias("n_occurrences"))
        # total straight off the value stream: a scan-side 1-row
        # aggregate — summing the counts would re-plan the whole
        # key-shuffle subtree under the total branch
        total = vals.agg(F.count(F.lit(1)).alias("__total"))
        return finish(counts, total)

    capacity = int(config.get("capacity", 8 * k))
    if capacity < k:
        raise ValueError(
            f"capacity ({capacity}) must be >= k ({k}) for the "
            "superset guarantee")
    value_type = vals.schema["value"].dataType
    cand_schema = T.StructType([T.StructField("value", value_type)])

    def mg_candidates(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # Misra-Gries with batch decrement: merge each Arrow batch's
        # value_counts into the counter table; when it overflows
        # ``capacity``, subtract the (capacity+1)-th largest count
        # from everything and drop the non-positives. Total decrement
        # over a partition is <= n_p/capacity per surviving
        # undercount, preserving the survive-somewhere guarantee for
        # global share > 1/capacity.
        counters = pd.Series(dtype="int64")
        for pdf in batches:
            vc = pdf["value"].value_counts()
            counters = counters.add(vc, fill_value=0).astype("int64")
            if len(counters) > capacity:
                delta = counters.nlargest(capacity + 1).iloc[-1]
                counters = counters - delta
                counters = counters[counters > 0]
        # object dtype: an EMPTY index would otherwise surface as
        # int64 and break the Arrow cast for string value columns
        yield pd.DataFrame({"value": list(counters.index)}, dtype=object)

    cands = (vals.mapInPandas(mg_candidates, cand_schema)
             .dropDuplicates(["value"]))
    # exact recount of candidate rows only: the broadcast semi-join
    # keeps non-candidate rows out of the shuffle entirely
    counts = (vals.join(F.broadcast(cands), "value", "left_semi")
              .groupBy("value").agg(F.count(F.lit(1)).alias("n_occurrences")))
    # N counts ALL rows (one scan-side 1-row aggregate, no shuffle of
    # rows) — candidate counts alone would over-state shares
    total = vals.agg(F.count(F.lit(1)).alias("__total"))
    return finish(counts, total)


@register("distinct_sketch")
def op_distinct_sketch(df: DataFrame, config: Mapping, views) -> DataFrame:
    """Mergeable per-group distinct-count sketches — the incremental
    profiling primitive: build HyperLogLog sketches per group today,
    union them with yesterday's without re-reading either corpus.

    ``fields``: the value column(s) sketched; ``group_by``: grouping
    keys (empty = one global row). Output: group keys +
    ``distinct_<field>`` (long estimate) and, with ``keep_sketch:
    true``, ``sketch_<field>`` (binary, reusable via
    ``sketch_merge``). Backed by Spark's native Datasketches HLL
    (hll_sketch_agg / hll_sketch_estimate) — JVM-side, mergeable,
    fixed ~2^lgk registers per sketch (``lgk`` default 12 ~ 1.6 KB,
    rel. err. ~1.04/sqrt(2^lgk) ~ 1.6%).
    """
    fields = list(config.get("fields") or [config["field"]])
    group_by = list(config.get("group_by", []))
    lgk = int(config.get("lgk", 12))
    keep = bool(config.get("keep_sketch", False))
    aggs = []
    for f in fields:
        sk = F.hll_sketch_agg(F.col(f), lgk)
        aggs.append(F.hll_sketch_estimate(sk).alias(f"distinct_{f}"))
        if keep:
            aggs.append(sk.alias(f"sketch_{f}"))
    if group_by:
        return df.groupBy(*group_by).agg(*aggs)
    return df.agg(*aggs)


@register("sketch_merge")
def op_sketch_merge(df: DataFrame, config: Mapping, views) -> DataFrame:
    """Union previously-built HLL sketches (``sketch_field`` binary
    column from distinct_sketch ``keep_sketch``) across rows, per
    ``group_by`` — merging a season of daily sketch rows into one
    estimate without touching the raw data. Output: group keys +
    ``distinct_merged`` (+ ``sketch_merged`` with ``keep_sketch``)."""
    sk_field = config.get("sketch_field", "sketch")
    group_by = list(config.get("group_by", []))
    merged = F.hll_union_agg(F.col(sk_field))
    aggs = [F.hll_sketch_estimate(merged).alias("distinct_merged")]
    if config.get("keep_sketch"):
        aggs.append(merged.alias("sketch_merged"))
    if group_by:
        return df.groupBy(*group_by).agg(*aggs)
    return df.agg(*aggs)


@register("quantile_sketch")
def op_quantile_sketch(df: DataFrame, config: Mapping, views) -> DataFrame:
    """Mergeable bottom-k (KMV-style) quantile sketch per group: the
    ``k`` rows with the SMALLEST ``md5(id || salt)`` hashes form a
    deterministic uniform sample of each group — the quantile
    counterpart of the HLL distinct sketch ("yesterday's length
    distribution per domain, merged with today's, without re-reading
    either corpus"). Hash-rank sampling is what makes the sketch
    MERGEABLE AND EXACT-REPLAYABLE: bottom-k of a union equals
    bottom-k of the unioned bottom-k's (a theorem, property-tested),
    and any SQL engine recomputes the identical sample — so unlike
    classic GK/KLL, the oracle can value-check the whole pipeline,
    not just a tolerance gate. Quantile error from a k-sample is the
    standard order-statistic bound ~O(1/sqrt(k)).

    Grouped: one rank window per group (single key shuffle). Global
    (empty ``group_by``): distributed bottom-k via orderBy+limit —
    Spark's TakeOrdered takes per-partition bottom-k then merges k·P
    rows, so the corpus NEVER sorts in one task (the previous
    ``Window.partitionBy(lit(1))`` did exactly that); the rank window
    then runs over only the ≤k surviving rows, which is bounded by
    construction. Output: group keys + ``id_field`` + ``field`` value
    + ``sample_hash`` (carried so merges never need the salt) +
    ``sample_rank``.
    """
    field = config["field"]
    id_field = config.get("id_field", "doc_id")
    k = int(config.get("k", 256))
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    group_by = list(config.get("group_by", []))
    salt = str(config.get("salt", "qsk"))
    from pyspark.sql import Window
    h = F.md5(F.concat(F.col(id_field).cast("string"),
                       F.lit("\x1f"), F.lit(salt)))
    sel = (df.filter(F.col(field).isNotNull())
           .select(*group_by, id_field, field, h.alias("sample_hash")))
    if group_by:
        part = Window.partitionBy(*group_by)
        return (sel.withColumn("sample_rank", F.row_number().over(
                    part.orderBy(F.col("sample_hash"), F.col(id_field))))
                .filter(F.col("sample_rank") <= k))
    topk = sel.orderBy(F.col("sample_hash"), F.col(id_field)).limit(k)
    return topk.withColumn("sample_rank", F.row_number().over(
        Window.partitionBy(F.lit(1)).orderBy(F.col("sample_hash"),
                                             F.col(id_field))))


@register("quantile_sketch_merge")
def op_quantile_sketch_merge(df: DataFrame, config: Mapping, views) -> DataFrame:
    """Merge quantile sketches: union sketch-row tables (the
    quantile_sketch output schema), drop duplicate ids per group
    (overlapping corpora), re-take the bottom ``k`` by the carried
    ``sample_hash`` — exactly bottom-k of the union, so
    merge(sketch(A), sketch(B)) == sketch(A ∪ B) row-for-row.
    ``others``: list of additional sketch frames/views to union in."""
    id_field = config.get("id_field", "doc_id")
    k = int(config.get("k", 256))
    group_by = list(config.get("group_by", []))
    from pyspark.sql import Window
    out = df
    for o in config.get("others", []):
        other = views[o] if isinstance(o, str) else o
        out = out.unionByName(other)
    deduped = out.dropDuplicates([*group_by, id_field])
    if group_by:
        part = Window.partitionBy(*group_by)
        return (deduped.withColumn("sample_rank", F.row_number().over(
                    part.orderBy(F.col("sample_hash"), F.col(id_field))))
                .filter(F.col("sample_rank") <= k))
    # global: bottom-k via TakeOrdered (input is ≤ k·n_frames rows by
    # construction, but keep the no-single-partition-corpus-window
    # invariant uniform with quantile_sketch)
    topk = deduped.orderBy(F.col("sample_hash"), F.col(id_field)).limit(k)
    return topk.withColumn("sample_rank", F.row_number().over(
        Window.partitionBy(F.lit(1)).orderBy(F.col("sample_hash"),
                                             F.col(id_field))))


@register("quantile_estimate")
def op_quantile_estimate(df: DataFrame, config: Mapping, views) -> DataFrame:
    """Estimate quantiles from a quantile_sketch: the pinned discrete
    percentile (value at rank max(ceil(q·n), 1), same definition as
    winsorize/mad_outlier) over each group's sampled values. Output:
    group keys + one ``q<percent>`` column per requested quantile
    (q50, q90, ... — quantiles finer than 1% need explicit
    ``aliases``). Deterministic sample + pinned rank = any engine
    replays the estimates bit-for-bit.

    Shapes: grouped = one rank window per group (single key shuffle).
    Global (empty ``group_by``) = the distributed prefix-sum rank
    over range partitions (winsorize precedent) — the op ALSO
    accepts raw corpora (the exact-vs-sketch comparisons do), so the
    global mode must not sort its input in one task the way a
    ``partitionBy(lit(1))`` window would; the requested ranks are
    computed driver-side from the exact total and filtered, never
    materializing a global sort.

    ``mode: "cont"`` (default "disc") switches to the PINNED
    continuous (interpolated) percentile — the ANSI percentile_cont
    semantics, with the rank arithmetic written out so any engine
    replays it (engine-native percentile_cont is banned from oracle
    pairs like every native quantile): h = (n−1)·q in exact ppb
    integers, lo = h div ppb, frac = (h mod ppb)/1e9 (a correctly-
    rounded double both engines agree on), result =
    v[lo+1] + (v[lo+2] − v[lo+1])·frac — the identical IEEE op
    sequence everywhere; frac = 0 returns v[lo+1] exactly (no float
    round-trip). Same shapes: the cont mode reads at most two ranks
    per quantile instead of one."""
    field = config["field"]
    group_by = list(config.get("group_by", []))
    qs = [float(q) for q in config.get("quantiles", [0.5])]
    aliases = config.get("aliases") or [
        f"q{int(round(q * 100))}" for q in qs]
    if len(aliases) != len(qs):
        raise ValueError("aliases must match quantiles length")
    if len(set(aliases)) != len(aliases):
        raise ValueError(f"duplicate output columns {aliases} — pass "
                         "explicit aliases for sub-1% quantiles")
    mode = config.get("mode", "disc")
    if mode not in ("disc", "cont"):
        raise ValueError(f"mode must be disc|cont, got {mode!r}")
    ppb = 1_000_000_000
    from pyspark.sql import Window
    v = F.col(field).cast("double")
    nn = df.filter(v.isNotNull()).select(*group_by, v.alias("__v"))
    if group_by:
        part = Window.partitionBy(*group_by)
        ranked = (nn.withColumn("__rn", F.row_number().over(
                      part.orderBy(F.col("__v"))))
                  .withColumn("__n", F.count(F.lit(1)).over(part)))
        if mode == "cont":
            aggs, finals = [], []
            for q, alias in zip(qs, aliases):
                q_ppb = int(round(q * ppb))
                lo1 = F.expr(
                    f"(({q_ppb} * (__n - 1)) div {ppb}) + 1")
                frac = (F.expr(f"({q_ppb} * (__n - 1)) % {ppb}")
                        .cast("double") / F.lit(1e9))
                aggs += [
                    F.min(F.when(F.col("__rn") == lo1, F.col("__v")))
                    .alias(f"__lo_{alias}"),
                    F.min(F.when(F.col("__rn") == lo1 + 1,
                                 F.col("__v")))
                    .alias(f"__hi_{alias}"),
                    F.min(frac).alias(f"__f_{alias}"),
                ]
                lo_c, hi_c, f_c = (F.col(f"__lo_{alias}"),
                                   F.col(f"__hi_{alias}"),
                                   F.col(f"__f_{alias}"))
                finals.append(
                    F.when(f_c == 0.0, lo_c)
                    .otherwise(lo_c + (hi_c - lo_c) * f_c)
                    .alias(alias))
            return (ranked.groupBy(*group_by).agg(*aggs)
                    .select(*group_by, *finals))
        aggs = []
        for q, alias in zip(qs, aliases):
            q_ppb = int(round(q * ppb))
            kx = F.expr(
                f"greatest(({q_ppb} * __n + {ppb - 1}) div {ppb}, 1)")
            aggs.append(F.min(F.when(F.col("__rn") == kx, F.col("__v")))
                        .alias(alias))
        return ranked.groupBy(*group_by).agg(*aggs)
    # global: distributed prefix-sum rank, requested ranks computed
    # from the exact driver-side total — never a one-task sort
    from ..operators.relational import _distributed_prefix_sum
    n_parts = int(config.get("n_partitions", 0)) or \
        df.sparkSession.sparkContext.defaultParallelism
    ranged, running, total = _distributed_prefix_sum(
        nn.select("__v"), F.lit(1), [F.col("__v")], n_parts)
    if mode == "cont":
        aggs, finals, ranks = [], [], set()
        for q, alias in zip(qs, aliases):
            q_ppb = int(round(q * ppb))
            h = q_ppb * (total - 1) if total else 0
            lo1 = h // ppb + 1
            frac = (h % ppb) / 1e9
            ranks.update({lo1, lo1 + 1} if frac > 0 else {lo1})
            aggs += [
                F.min(F.when(F.col("__rn") == int(lo1), F.col("__v")))
                .alias(f"__lo_{alias}"),
                F.min(F.when(F.col("__rn") == int(lo1 + 1),
                             F.col("__v")))
                .alias(f"__hi_{alias}"),
            ]
            lo_c, hi_c = F.col(f"__lo_{alias}"), F.col(f"__hi_{alias}")
            finals.append(
                (lo_c if frac == 0.0
                 else lo_c + (hi_c - lo_c) * F.lit(frac)).alias(alias))
        return (ranged.withColumn("__rn", running)
                .filter(F.col("__rn").isin([int(r) for r in ranks])
                        if ranks and total else F.lit(False))
                .groupBy().agg(*aggs).select(*finals))
    aggs = []
    for q, alias in zip(qs, aliases):
        q_ppb = int(round(q * ppb))
        k = max((q_ppb * total + ppb - 1) // ppb, 1) if total else 0
        aggs.append(F.min(F.when(F.col("__rn") == int(k), F.col("__v")))
                    .alias(alias))
    ranks = {max((int(round(q * ppb)) * total + ppb - 1) // ppb, 1)
             for q in qs} if total else set()
    return (ranged.withColumn("__rn", running)
            .filter(F.col("__rn").isin([int(r) for r in ranks])
                    if ranks else F.lit(False))
            .groupBy().agg(*aggs))
