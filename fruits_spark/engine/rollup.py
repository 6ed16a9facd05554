"""Tiered continuous aggregates: raw -> 1k-token -> 100k-token rollups.

A *tier* groups documents into ``(source, bucket)`` cells; the bucket of
a doc is ``hash_bucket(doc_id, tier.n_buckets)`` so cells are stable,
deterministic and independent of row order.  Tier aggregates are plain
JVM hash aggregations (partial + final, map-side combine comes free from
Catalyst) over the wide per-doc feature columns produced by
:func:`fruits_spark.engine.executor.extract_features` — the only shuffle
in the pipeline is this groupBy, shuffling one already-reduced row per
document, never token data.

Scale design notes (100 TB / 10^12 sequences):
  * the feature-extraction map carries no shuffle; its output is ~1e12
    rows x (few keys + k doubles) — the rollup shuffle volume is
    O(docs x features x 8B), shrunk further by partial aggregation to
    O(cells) per map task.
  * Zipf-skewed ``source`` keys are salted (``salt_rollup``): a two-phase
    aggregate that shards hot groups before the final combine, keeping
    the max/median partition ratio bounded.
  * gap-fill builds the full (source x bucket) spine with ``sequence()``
    + ``explode`` (a few thousand rows — broadcastable) and left-joins
    facts onto it.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, functions as F


@dataclass(frozen=True)
class Tier:
    """A retention tier: ``tokens_per_bucket`` controls downsampling
    granularity; ``retention_runs`` how many runs are kept before
    partition drop."""

    name: str
    tokens_per_bucket: int  # target token volume per rollup cell
    retention_runs: int = -1  # -1 = keep forever


DEFAULT_TIERS = (
    Tier("raw", 0),            # per-document (no rollup)
    Tier("t1k", 1_000),
    Tier("t100k", 100_000),
)


def bucket_col(n_buckets: int, doc_col: str = "doc_id"):
    """Deterministic doc -> bucket assignment (xxhash64, JVM-side)."""
    return F.pmod(F.xxhash64(F.col(doc_col)), F.lit(n_buckets)).cast("int")


def n_buckets_for(tier: Tier, total_tokens: int, min_buckets: int = 4) -> int:
    if tier.tokens_per_bucket <= 0:
        raise ValueError("raw tier is per-document; no bucket count")
    return max(min_buckets, int(total_tokens // tier.tokens_per_bucket) or 1)


def rollup_tier(
    features: DataFrame,
    tier: Tier,
    n_buckets: int,
    feature_cols: list[str],
    bucket_expr=None,
) -> DataFrame:
    """Aggregate per-doc features into tier cells.

    Emits per (source, bucket): doc count, token sum, and sum/max per
    feature column — the continuous-aggregate payload.  Aggregates are
    algebraic (sum/max/count) so tiers can also be re-rolled from finer
    tiers without revisiting raw data.
    """
    # one SQL string instead of hundreds of Column objects: a wide
    # feature set otherwise costs seconds of driver-side py4j round-trips
    b = bucket_expr if bucket_expr is not None else bucket_col(n_buckets)
    df = features.withColumn("bucket", b)
    aggs = ["count(1) AS n_docs", "sum(n_tok) AS sum_tok"]
    for c in feature_cols:
        aggs.append(f"sum({c}) AS sum_{c}")
        aggs.append(f"max({c}) AS max_{c}")
    return _sql_agg(df, ["source", "bucket"], aggs)


def reagg_exprs(feature_cols: list[str]) -> list[str]:
    """The algebraic re-aggregation of tier cells (sums of sums, max of
    maxes) — single source of truth for every coarser-tier rollup,
    stream compaction, and warmup path."""
    aggs = ["sum(n_docs) AS n_docs", "sum(sum_tok) AS sum_tok"]
    for c in feature_cols:
        aggs.append(f"sum(sum_{c}) AS sum_{c}")
        aggs.append(f"max(max_{c}) AS max_{c}")
    return aggs


import itertools

# deterministic AND thread-safe name source: itertools.count() is atomic
# under the GIL, so a streaming foreachBatch thread and the driver thread
# can run rollups concurrently without colliding on a view name (a plain
# global counter has a read-modify-write race; hash() varies with
# PYTHONHASHSEED across sessions)
_VIEW_SEQ = itertools.count(1)


def _sql_agg(df: DataFrame, keys: list[str], aggs: list[str]) -> DataFrame:
    name = f"_rollup_in_{next(_VIEW_SEQ)}"
    df.createOrReplaceTempView(name)
    out = df.sparkSession.sql(
        f"SELECT {', '.join(keys)}, {', '.join(aggs)} FROM {name} "
        f"GROUP BY {', '.join(keys)}"
    )
    # materialize the analyzed plan, then drop the view so repeated
    # rollups don't accumulate catalog entries
    out.schema
    df.sparkSession.catalog.dropTempView(name)
    return out


def reagg_tier(
    tier_cells: DataFrame,
    feature_cols: list[str],
    bucket_expr,
) -> DataFrame:
    """Coarser tier from finer tier cells: regroup on (source, coarse
    bucket) with the algebraic :func:`reagg_exprs` — never touches raw
    data, so a t100k refresh costs O(t1k cells), not O(docs)."""
    df = tier_cells.withColumn("bucket", bucket_expr)
    return _sql_agg(df, ["source", "bucket"], reagg_exprs(feature_cols))


def rollup_tier_salted(
    features: DataFrame,
    tier: Tier,
    n_buckets: int,
    feature_cols: list[str],
    n_salts: int = 16,
    bucket_expr=None,
) -> DataFrame:
    """Skew-safe two-phase rollup: pre-aggregate on (source, bucket, salt)
    so a hot source fans out over ``n_salts`` reducers, then combine.
    Identical results to :func:`rollup_tier`; use when one source holds a
    large share of documents (FIXTURES.md T2)."""
    partial = ["count(1) AS n_docs", "sum(n_tok) AS sum_tok"]
    final = ["sum(n_docs) AS n_docs", "sum(sum_tok) AS sum_tok"]
    for c in feature_cols:
        partial.append(f"sum({c}) AS sum_{c}")
        partial.append(f"max({c}) AS max_{c}")
        final.append(f"sum(sum_{c}) AS sum_{c}")
        final.append(f"max(max_{c}) AS max_{c}")
    b = bucket_expr if bucket_expr is not None else bucket_col(n_buckets)
    salted_in = features.withColumn("bucket", b).withColumn(
        "_salt", F.pmod(F.xxhash64(F.col("doc_id"), F.lit(1)), F.lit(n_salts))
    )
    salted = _sql_agg(salted_in, ["source", "bucket", "_salt"], partial)
    return _sql_agg(salted, ["source", "bucket"], final).drop("_salt")


def bucket_spine(
    facts_or_sources: DataFrame, n_buckets: int, source_col: str = "source"
) -> DataFrame:
    """Full (source x bucket) grid: distinct sources cross-joined with
    ``sequence(0, n_buckets-1)`` exploded.  Tiny — broadcast side of the
    gap-fill join."""
    sources = facts_or_sources.select(source_col).distinct()
    return sources.withColumn(
        "bucket", F.explode(F.sequence(F.lit(0), F.lit(n_buckets - 1)))
    ).withColumn("bucket", F.col("bucket").cast("int"))


def gap_fill(
    rolled: DataFrame,
    spine: DataFrame,
    fill_cols: dict[str, object] | None = None,
    carry_cols: list[str] | None = None,
) -> DataFrame:
    """Left-join tier cells onto the spine; missing cells get
    ``fill_cols`` constants (default 0 for counts) and, optionally,
    last-observation-carried-forward per source for ``carry_cols``
    (``last(ignorenulls).over(source window ordered by bucket)``).
    Adds a ``filled`` flag."""
    from pyspark.sql.window import Window

    out = spine.join(rolled, ["source", "bucket"], "left")
    out = out.withColumn("filled", F.col("n_docs").isNull())
    fills = {"n_docs": 0, "sum_tok": 0}
    if fill_cols:
        fills.update(fill_cols)
    out = out.fillna(fills)
    if carry_cols:
        w = (
            Window.partitionBy("source")
            .orderBy("bucket")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        for c in carry_cols:
            out = out.withColumn(
                c, F.last(F.col(c), ignorenulls=True).over(w)
            )
    return out


def _cell_payload(cells: DataFrame, feature_cols: list[str]) -> DataFrame:
    """The algebraic payload columns shared by every tier (source +
    counts + sum/max per feature) — the common schema cells of different
    granularities are unioned on."""
    cols = ["source", "n_docs", "sum_tok"]
    for c in feature_cols:
        cols.append(f"sum_{c}")
        cols.append(f"max_{c}")
    return cells.select(*cols)


def route_range(
    fine_cells: DataFrame,
    coarse_cells: DataFrame,
    factor: int,
    lo: int,
    hi: int,
    feature_cols: list[str],
) -> DataFrame:
    """Answer per-source totals over the fine-bucket range ``[lo, hi)``
    from the FEWEST cells (continuous-aggregate query routing, the read
    side of the tier hierarchy): whole coarse cells for the aligned
    interior, fine cells only for the two unaligned edges.

    ``coarse_cells`` must be the ``reagg_tier`` of ``fine_cells`` with
    ``bucket_expr = floor(bucket / factor)`` — coarse bucket ``b``
    covers fine buckets ``[b*factor, (b+1)*factor)``.  The routed
    answer is EXACT (all aggregates are the algebraic
    :func:`reagg_exprs`), and reads ``O(range/factor) + 2*factor``
    cells instead of ``O(range)``: over a 10^12-sequence table a range
    spanning 10^7 fine buckets touches ~10^5 t100k cells plus at most
    2*factor fine edge cells, with partition pruning on ``bucket``
    doing the skipping when tiers are range-partitioned on it.  A
    range that starts and ends inside one coarse cell degenerates to
    the pure fine-cell path."""
    if factor <= 0:
        raise ValueError(f"factor must be positive, got {factor}")
    if not 0 <= lo < hi:
        raise ValueError(f"need 0 <= lo < hi, got [{lo}, {hi})")
    ilo = -(-lo // factor)  # first fully-covered coarse bucket
    ihi = hi // factor      # one past the last fully-covered coarse bucket
    if ilo < ihi:
        interior = coarse_cells.where(
            (F.col("bucket") >= ilo) & (F.col("bucket") < ihi)
        )
        edges = fine_cells.where(
            ((F.col("bucket") >= lo) & (F.col("bucket") < ilo * factor))
            | ((F.col("bucket") >= ihi * factor) & (F.col("bucket") < hi))
        )
        cells = _cell_payload(interior, feature_cols).unionByName(
            _cell_payload(edges, feature_cols)
        )
    else:
        cells = _cell_payload(
            fine_cells.where(
                (F.col("bucket") >= lo) & (F.col("bucket") < hi)
            ),
            feature_cols,
        )
    return _sql_agg(cells, ["source"], reagg_exprs(feature_cols))


def _route_parts(
    levels: list[tuple[DataFrame, int]], lo: int, hi: int,
    feature_cols: list[str],
) -> list[DataFrame]:
    """Greedy coarsest-first split of ``[lo, hi)`` (in finest-bucket
    units) into whole-cell slices: the coarsest level contributes its
    aligned interior, the unaligned edges recurse into the next finer
    level.  Each level contributes at most ``2 * (its bucket span /
    next finer span)`` edge cells, so total cells read is
    ``O(range/coarsest_factor + sum of factor ratios)``."""
    cells, f = levels[-1]
    ilo = -(-lo // f)
    ihi = hi // f
    if len(levels) == 1:
        # the recursion bottoms out at the factor-1 level (enforced by
        # route_range_multi), where every range is exactly representable
        return [
            _cell_payload(
                cells.where((F.col("bucket") >= lo) & (F.col("bucket") < hi)),
                feature_cols,
            )
        ]
    out = []
    if ilo < ihi:
        out.append(
            _cell_payload(
                cells.where(
                    (F.col("bucket") >= ilo) & (F.col("bucket") < ihi)
                ),
                feature_cols,
            )
        )
        if lo < ilo * f:
            out.extend(_route_parts(levels[:-1], lo, ilo * f, feature_cols))
        if ihi * f < hi:
            out.extend(_route_parts(levels[:-1], ihi * f, hi, feature_cols))
    else:
        out.extend(_route_parts(levels[:-1], lo, hi, feature_cols))
    return out


def route_range_multi(
    levels: list[tuple[DataFrame, int]],
    lo: int,
    hi: int,
    feature_cols: list[str],
) -> DataFrame:
    """N-level generalization of :func:`route_range`: answer per-source
    totals over finest-bucket range ``[lo, hi)`` through a whole tier
    hierarchy (e.g. ``[(t1k_cells, 1), (t100k_cells, 100),
    (t10m_cells, 10_000)]`` — factors in finest-bucket units, finest
    first with factor 1, each a multiple of the previous).  The
    coarsest tier serves the aligned interior; every unaligned edge
    cascades one level finer, so a range spanning 10^7 fine buckets
    reads ~10^3 coarsest cells plus a few hundred edge cells instead
    of 10^7 — and the raw table never appears in the plan."""
    if not levels or levels[0][1] != 1:
        raise ValueError("levels must be finest-first with factor 1")
    for (_, a), (_, b) in zip(levels, levels[1:]):
        if b <= a or b % a:
            raise ValueError(
                f"factors must be increasing multiples, got {a} then {b}"
            )
    if not 0 <= lo < hi:
        raise ValueError(f"need 0 <= lo < hi, got [{lo}, {hi})")
    parts = _route_parts(levels, lo, hi, feature_cols)
    cells = parts[0]
    for p in parts[1:]:
        cells = cells.unionByName(p)
    return _sql_agg(cells, ["source"], reagg_exprs(feature_cols))


def source_watermarks(cells: DataFrame) -> DataFrame:
    """Per-source high-water mark (max materialized bucket with actual
    data) — one row per source, always broadcastable no matter how many
    cells exist.  Gap-filled spine cells (``n_docs = 0``, which the
    batch job commits for EVERY bucket) must not advance the watermark:
    a spine-saturated hwm would make the real-time tail permanently
    empty and silently drop new documents.  With a spine-committed
    tier, a bucket past the data watermark can therefore appear twice
    in :func:`realtime_tier`'s output — its committed zero row plus its
    fresh row — which stays aggregate-exact because the zero row is
    additive identity for every payload column."""
    return (
        cells.where(F.col("n_docs") > 0)
        .groupBy("source")
        .agg(F.max("bucket").alias("hwm"))
    )


def realtime_tier(
    materialized: DataFrame,
    features: DataFrame,
    tier: Tier,
    n_buckets: int,
    feature_cols: list[str],
    bucket_expr=None,
) -> DataFrame:
    """Real-time continuous aggregate: the committed materialized cells
    unioned with the unmaterialized TAIL rolled up on the fly from raw
    features — a query over this view is always current without waiting
    for the next rollup run.

    The tail is everything past the per-source high-water mark
    (:func:`source_watermarks` over ``materialized``); a source with no
    materialized cells contributes entirely from raw.  Requires the
    continuous-aggregate invariant the lineage layer maintains: cells
    are committed whole, in bucket order per source (``bucket`` must be
    a position/time bucketing, not a hash — new data only lands in
    buckets past the watermark).  Scale: the watermark join broadcasts
    ONE row per source (anti-joining the full committed-cell set would
    not broadcast at 10^9 cells), and with tiers range-partitioned on
    ``bucket`` the ``bucket > hwm`` predicate prunes the raw scan to
    the tail partitions."""
    b = bucket_expr if bucket_expr is not None else bucket_col(n_buckets)
    hwm = source_watermarks(materialized)
    tail = (
        features.withColumn("bucket", b)
        .join(F.broadcast(hwm), "source", "left")
        .where(F.col("hwm").isNull() | (F.col("bucket") > F.col("hwm")))
        .drop("hwm")
    )
    fresh = rollup_tier(
        tail, tier, n_buckets, feature_cols, bucket_expr=F.col("bucket")
    )
    return materialized.unionByName(fresh)


def route_range_realtime(
    fine: DataFrame,
    coarse: DataFrame,
    factor: int,
    lo: int,
    hi: int,
    feature_cols: list[str],
    features: DataFrame,
    tier: Tier,
    n_buckets: int,
    bucket_expr=None,
) -> DataFrame:
    """FRESH range query: :func:`route_range` is only sound where the
    coarse tier fully covers the interior — cells past the rollup
    watermark don't have coarse counterparts yet, and routing through
    them would silently drop the uncommitted region.  This composition
    answers ``[lo, hi)`` exactly against live data:

    * routed (coarse interior + fine edges) up to ``Wa`` — the
      watermark-aligned boundary, where ``Wa = min over sources of the
      max committed bucket + 1`` (every source is complete below it);
    * committed fine cells in ``[Wa, hi)`` (sources ahead of the
      global minimum);
    * the unmaterialized tail past each source's own watermark, rolled
      up on the fly from ``features`` (as in :func:`realtime_tier`)
      and filtered to ``[lo, hi)``.

    The three parts partition the range's documents exactly, so the
    algebraic merge is exact.  One tiny driver-side collect fetches the
    global watermark (an aggregate over cell metadata, never data)."""
    if not 0 <= lo < hi:
        raise ValueError(f"need 0 <= lo < hi, got [{lo}, {hi})")
    hwm = source_watermarks(fine)
    row = hwm.agg(F.min("hwm").alias("w")).collect()[0]
    wa = (int(row.w) + 1) if row.w is not None else 0
    parts = []
    if lo < min(hi, wa):
        parts.append(
            route_range(fine, coarse, factor, lo, min(hi, wa), feature_cols)
        )
    if wa < hi:
        ahead = _cell_payload(
            fine.where(
                (F.col("bucket") >= max(lo, wa)) & (F.col("bucket") < hi)
            ),
            feature_cols,
        )
        parts.append(_sql_agg(ahead, ["source"], reagg_exprs(feature_cols)))
    b = bucket_expr if bucket_expr is not None else bucket_col(n_buckets)
    tail_src = (
        features.withColumn("bucket", b)
        .join(F.broadcast(hwm), "source", "left")
        .where(F.col("hwm").isNull() | (F.col("bucket") > F.col("hwm")))
        .where((F.col("bucket") >= lo) & (F.col("bucket") < hi))
        .drop("hwm")
    )
    fresh = rollup_tier(
        tail_src, tier, n_buckets, feature_cols, bucket_expr=F.col("bucket")
    )
    parts.append(
        _sql_agg(
            _cell_payload(fresh, feature_cols),
            ["source"], reagg_exprs(feature_cols),
        )
    )
    merged = parts[0]
    for p in parts[1:]:
        merged = merged.unionByName(p)
    return _sql_agg(merged, ["source"], reagg_exprs(feature_cols))


def route_query_cells(
    fine: DataFrame,
    coarse: DataFrame,
    factor: int,
    lo: int,
    hi: int,
    feature_cols: list[str],
) -> DataFrame:
    """The spark-submit READ surface's exact plan
    (``jobs/route_query.py``), as a library function so the job and the
    correctness gate share one implementation:

    * dedupe at-least-once data rows on the cell key ``(run, source,
      bucket)`` — ``commit_cells`` appends data before manifest, so a
      crash + ``--resume`` can re-append byte-identical cells;
    * refuse to answer if the two tiers hold different run sets (a
      half-retired hierarchy would double- or under-count);
    * aggregate cells from every live run together via
      :func:`route_range` (runs partition the corpus and the payload is
      algebraic, so cross-run merge is exact).

    Inputs must carry a string ``run`` column (the job casts the
    partition value)."""
    fine = fine.dropDuplicates(["run", "source", "bucket"])
    coarse = coarse.dropDuplicates(["run", "source", "bucket"])
    runs_f = {r.run for r in fine.select("run").distinct().collect()}
    runs_c = {r.run for r in coarse.select("run").distinct().collect()}
    if runs_f != runs_c:
        raise ValueError(
            f"tier run sets differ: t_fine={sorted(runs_f)} "
            f"t_coarse={sorted(runs_c)}"
        )
    return route_range(fine, coarse, factor, lo, hi, feature_cols)


def retention_filter(
    tier_df: DataFrame, tier: Tier, current_run: int, run_col: str = "run_id"
) -> DataFrame:
    """Partition-drop semantics: keep only the last ``retention_runs``
    runs of a tier (on storage this is a partition delete, expressed here
    as the equivalent filter)."""
    if tier.retention_runs < 0:
        return tier_df
    cutoff = current_run - tier.retention_runs
    return tier_df.where(F.col(run_col) > F.lit(cutoff))
