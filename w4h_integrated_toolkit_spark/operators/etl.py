"""ImportHub ETL re-expressed (SURVEY §3.3): wide CSV -> narrow GeoMTS facts.

- **melt** — the per-feature-column unpivot the reference loops over in
  pandas (w4h_db_utils.py:184-189), as a single ``stack()`` projection: one
  scan of the wide input produces all narrow facts.
- **fuzzy_map_columns** — the column auto-mapping (import_hub_main.py:34-55,
  fuzzywuzzy threshold 60) with a dependency-free normalized-Levenshtein
  scorer. Runs driver-side over df.columns (metadata, not data).
- **upsert_users** — anti-join append of unseen users
  (w4h_db_utils.py:160-173).
- **ingest_fact** — dedup on the composite PK + append
  (w4h_db_utils.py:192-200).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "melt",
    "fuzzy_map_columns",
    "normalize_name",
    "upsert_users",
    "ingest_fact",
    "merge_upsert",
    "stratified_sample",
    "mixture_sample",
    "temperature_mixture_rates",
    "weighted_priority_sample",
    "debounce_events",
    "blocked_edit_distance_pairs",
    "table_diff",
    "scd2_intervals",
    "scd2_apply",
    "kfold_assignment",
    "agg_state_from_batch",
    "merge_agg_state",
]


def melt(
    df: DataFrame,
    id_cols: list[str],
    value_cols: list[str],
    var_name: str = "feature",
    value_name: str = "value",
) -> DataFrame:
    """Unpivot value columns into (feature, value) rows via ``stack`` — the
    Spark-native melt (one projection, no shuffle, no per-column loop)."""
    pairs = ", ".join(f"'{c}', cast(`{c}` as double)" for c in value_cols)
    stack_expr = f"stack({len(value_cols)}, {pairs}) as ({var_name}, {value_name})"
    return df.selectExpr(*id_cols, stack_expr)


def normalize_name(name: str) -> str:
    """Lowercase, underscores->spaces, word tokens only
    (import_hub_main.py:14-31)."""
    s = re.sub(r"_", " ", name.lower())
    return " ".join(re.findall(r"\b\w+\b", s))


def _lev(a: str, b: str) -> int:
    """Plain Levenshtein distance (dependency-free)."""
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def _ratio(a: str, b: str) -> float:
    """Fuzzy score in [0,100]: max of full Levenshtein ratio, token-SORT
    ratio (Levenshtein over alphabetically-sorted tokens), and a token-set
    overlap (Sørensen) — approximating fuzzywuzzy's default WRatio scorer
    (import_hub_main.py:34-55 uses process.extractOne, whose token-sort arm
    makes reordered names like 'rate heart' ≈ 'heart rate' score ~100;
    plain Levenshtein alone lands such pairs near the 60 threshold and can
    flip the mapping decision)."""
    if not a and not b:
        return 100.0
    full = 100.0 * (1 - _lev(a, b) / max(len(a), len(b)))
    sa, sb = " ".join(sorted(a.split())), " ".join(sorted(b.split()))
    tsort = 100.0 * (1 - _lev(sa, sb) / max(len(sa), len(sb))) if (sa or sb) else 0.0
    ta, tb = set(a.split()), set(b.split())
    tok = 100.0 * 2 * len(ta & tb) / (len(ta) + len(tb)) if (ta or tb) else 0.0
    return max(full, tsort, tok)


def fuzzy_map_columns(
    columns: list[str], targets: dict[str, str], threshold: float = 60.0
) -> dict[str, str | None]:
    """For each canonical target (name -> descriptive hint string), pick the
    best-matching input column by normalized-Levenshtein ratio, or None below
    ``threshold`` (import_hub_main.py:34-55 semantics: unmapped columns are
    simply ignored)."""
    out: dict[str, str | None] = {}
    for target, hint in targets.items():
        best, best_score = None, -1.0
        for col in columns:
            score = _ratio(normalize_name(col), normalize_name(hint))
            if score > best_score:
                best, best_score = col, score
        out[target] = best if best_score >= threshold else None
    return out


def upsert_users(incoming: DataFrame, existing: DataFrame, key: str = "user_id") -> DataFrame:
    """New-user rows only (anti join), ready to append
    (w4h_db_utils.py:160-173)."""
    return (
        incoming.select(key)
        .distinct()
        .join(existing.select(key).distinct(), key, "left_anti")
    )


def ingest_fact(df: DataFrame, user: str = "user_id", ts: str = "timestamp") -> DataFrame:
    """Composite-PK dedup before append (w4h_db_utils.py:192) — keeps the
    first row per key deterministically by taking min over the rest via
    dropDuplicates after an orderBy-free shuffle; for strict determinism on
    conflicting values, prefer groupBy().agg(first(...)) on sorted input."""
    return df.dropDuplicates([user, ts])


def merge_upsert(
    spark,
    path: str,
    incoming: DataFrame,
    user: str = "user_id",
    ts: str = "timestamp",
) -> None:
    """Idempotent MERGE into a date-partitioned fact table — the scale-ready
    upgrade of the reference's append+dedup (SURVEY §3.3): incoming rows win
    on composite-key conflicts, and ONLY the date partitions containing
    incoming keys are rewritten (dynamic partition overwrite). At 100 TB a
    daily increment touches a handful of `dt=` directories, never the table.

    Plan: derive the incoming date set (tiny; broadcast), semi-join the
    existing table down to affected partitions, anti-join those rows against
    incoming keys (existing loses conflicts), union with incoming, overwrite
    dynamically. Without a txn log (Delta/Iceberg) the overwrite is not
    atomic across partitions — swap the writer for a Delta MERGE when a log
    is available; the plan shape is identical.
    """
    import os

    from pyspark.sql import functions as F

    inc = incoming.dropDuplicates([user, ts]).withColumn("dt", F.to_date(ts))
    prev_mode = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        if os.path.exists(path):
            existing = spark.read.parquet(path)
            touched = inc.select("dt").distinct()
            keep = (
                existing.join(F.broadcast(touched), "dt", "left_semi")
                .join(inc.select(user, ts), [user, ts], "left_anti")
            )
            out = keep.unionByName(inc)
        else:
            out = inc
        (
            out.repartition("dt")
            .sortWithinPartitions(user, ts)
            .write.mode("overwrite")
            .partitionBy("dt")
            .parquet(path)
        )
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev_mode)


def stratified_sample(
    df: DataFrame,
    strata: list[str],
    k: int,
    id_col: str = "doc_id",
    salt: str = "w4h",
) -> DataFrame:
    """Deterministic stratified sample: top-``k`` rows per stratum by a
    portable hash priority over (salt, id).

    The reproducible-sampling idiom of training-data pipelines: membership
    depends only on the row's id and the salt — never on partitioning, scan
    order, engine, or run — so a pipeline re-run (or a different engine
    entirely) selects the identical sample, and changing the salt redraws
    it. Plan: one hash projection map-side, one shuffle on the strata for
    the per-group top-k (rank via row_number; at extreme per-stratum
    cardinality swap in a bounded per-partition pre-top-k before the final
    window — partial top-k is associative, same answer).
    """
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from ..functions import portable_hash32

    pri = portable_hash32(F.concat(F.lit(salt), F.col(id_col).cast("string")))
    w = Window.partitionBy(*strata).orderBy(pri.asc(), F.col(id_col).asc())
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .drop("_rn")
    )


def mixture_sample(
    df: DataFrame,
    key: str,
    rates: dict[str, float],
    default_rate: float = 0.0,
    id_col: str = "doc_id",
    salt: str = "mix",
) -> DataFrame:
    """Deterministic per-group RATE sampling — the data-mixture rebalancing
    primitive (keep 100% of group A, 25% of group B, ...) of training-data
    pipelines.

    A row survives iff ``portable_hash32(salt || id) % 1e6 < rate(group) *
    1e6``: membership depends only on (salt, id, its group's rate), never
    on partitioning, scan order, or engine — so re-runs and downstream
    engines reproduce the identical subset, and raising a group's rate
    strictly grows its sample (nested samples, the property that makes
    mixture ablations comparable). Map-side filter only — ZERO shuffles at
    any scale; unlike :func:`stratified_sample` (exact top-k per stratum,
    one window shuffle) this trades exact counts for a fully parallel plan.
    """
    from pyspark.sql import functions as F

    from ..functions import portable_hash32

    rate = F.lit(float(default_rate))
    for group, r in rates.items():
        rate = F.when(F.col(key) == group, F.lit(float(r))).otherwise(rate)
    pri = portable_hash32(F.concat(F.lit(salt), F.col(id_col).cast("string"))) % 1_000_000
    return df.filter(pri < rate * 1_000_000.0)


def temperature_mixture_rates(
    df: DataFrame,
    key: str,
    temperature: float,
    max_groups: int = 10_000,
) -> dict[str, float]:
    """Per-group KEEP RATES implementing temperature-scaled mixture
    rebalancing (the mT5/multilingual sampling rule, Xue et al. 2021):
    sampling shares q_g ∝ p_g^(1/T) flatten the group distribution as
    T grows (T=1 keeps natural proportions; T→∞ → uniform shares),
    boosting low-resource groups. Rate sampling can only DROP rows, so
    the shares are scaled to the largest feasible subsample — the
    group with the highest q_g/n_g keeps 100% and every other group
    downsamples proportionally: ``r_g = (q_g/n_g) / max_h(q_h/n_h)``,
    giving kept counts exactly proportional to the q shares. Feed the
    returned dict straight into :func:`mixture_sample` (deterministic,
    nested, zero-shuffle membership).

    Driver-side math on ONE group-count aggregate — the collect is
    O(groups), guarded by ``max_groups`` (a mixture key with 10k+
    distinct values is a bug, not a mixture; fail loud, never a silent
    driver OOM). NULL group keys are excluded (they'd silently claim a
    share; filter or fillna upstream if NULL is a real group).

    At 100 TB: the aggregate is one map-side-combined exchange over
    (key) — group counts, never rows, reach the driver; the sampling
    pass it feeds is a map-side filter with zero exchanges.
    """
    if temperature <= 0:
        raise ValueError(f"temperature must be positive, got {temperature}")
    rows = (
        df.filter(F.col(key).isNotNull())
        .groupBy(key)
        .agg(F.count(F.lit(1)).alias("_n"))
        .limit(max_groups + 1)
        .collect()
    )
    if len(rows) > max_groups:
        raise ValueError(
            f"mixture key {key!r} has more than {max_groups} distinct "
            "groups — that is an id-like column, not a mixture key; "
            "raise max_groups only if this is intentional"
        )
    if not rows:
        raise ValueError(
            f"no non-NULL {key!r} groups — a mixture over nothing is "
            "meaningless"
        )
    counts = {r[key]: int(r["_n"]) for r in rows}
    total = sum(counts.values())
    # q_g ∝ p_g^(1/T); the normalizer cancels in the r_g ratio below,
    # but compute it anyway so callers can log the shares
    q = {g: (n / total) ** (1.0 / temperature) for g, n in counts.items()}
    z = sum(q.values())
    q = {g: v / z for g, v in q.items()}
    scale = max(q[g] / counts[g] for g in counts)
    return {g: min(1.0, (q[g] / counts[g]) / scale) for g in counts}


def weighted_priority_sample(
    df: DataFrame,
    weight: str,
    k: int,
    id_col: str = "doc_id",
    salt: str = "wsample",
) -> DataFrame:
    """Deterministic weight-biased top-k sample: each row gets priority
    ``portable_hash31(salt || id) / weight`` and the k smallest
    priorities win — heavier rows draw smaller priorities more often, so
    selection probability is MONOTONE in weight but not proportional to
    it (a uniform u/w priority gives weights 2:1 a ~0.75 pick rate for
    k=1, not 2/3; true A-Res proportionality needs ``u^(1/w)``, whose
    pow/log would break cross-engine determinism). The
    quality-weighted corpus subsampling primitive; cf. mixture_sample,
    which is per-GROUP rates, not per-ROW weights.

    Determinism across engines: the hash is integer, and IEEE division
    is correctly rounded, so hash/weight is the bit-identical double in
    any engine — unlike the classic A-Res key ``u^(1/w)`` whose pow/log
    are libm-dependent. Ties (identical priority) break by id.

    Plan: priority is map-side; the global k-smallest is
    TakeOrderedAndProject (per-partition top-k heaps + one k-row merge
    on the driver — no global sort, no single-task window), the same
    shape Spark plans for ORDER BY .. LIMIT. Rows with weight <= 0 or
    NULL are excluded (they'd divide to infinity/undefined).
    """
    from ..functions import portable_hash31

    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    pri = portable_hash31(
        F.concat(F.lit(salt + "|"), F.col(id_col).cast("string"))
    ).cast("double") / F.col(weight).cast("double")
    return (
        df.filter(F.col(weight).isNotNull() & (F.col(weight) > 0))
        .withColumn("priority", pri)
        .orderBy("priority", id_col)
        .limit(k)
    )


def debounce_events(
    df: DataFrame,
    ts: str = "ts",
    keys: tuple[str, ...] = ("user_id", "event_type"),
    cooldown_seconds: int = 300,
    order_tiebreak: str = "event_id",
) -> DataFrame:
    """Event debouncing: keep a row iff it is the first of its key group
    or at least ``cooldown_seconds`` after the PREVIOUS event of that
    group (lag rule) — the duplicate-burst suppressor for click storms /
    sensor chatter / retry floods.

    The rule is deliberately "gap from previous EVENT", not "gap from
    previous KEPT event": the lag formulation is order-theoretically
    identical in any engine (one window lag), needs O(1) state per key
    when run streaming (last seen ts — see streaming.stateful), and both
    formulations drop the same sustained bursts; the kept-anchor variant
    additionally drops stragglers of bursts LONGER than the cooldown,
    which for suppression purposes is a tuning difference, not a
    correctness one.

    Exact integer µs comparison; ties at identical ts order by
    ``order_tiebreak``. Plan: ONE exchange on the keys for the lag
    window; the filter is map-side after it.
    """
    from pyspark.sql import Window

    w = Window.partitionBy(*keys).orderBy(ts, order_tiebreak)
    t_us = F.round(F.col(ts).cast("double") * 1e6, 0).cast("long")
    prev_us = F.lag(t_us).over(w)
    return (
        df.withColumn("_gap_ok", prev_us.isNull()
                      | (t_us - prev_us >= int(cooldown_seconds) * 1_000_000))
        .filter(F.col("_gap_ok"))
        .drop("_gap_ok")
    )


def blocked_edit_distance_pairs(
    df: DataFrame,
    name: str,
    max_dist: int = 3,
    block=None,
) -> DataFrame:
    """Record-linkage candidate pairs: distinct names whose edit distance
    is <= ``max_dist``, compared only WITHIN a blocking key (default: the
    last whitespace token — for "adjective noun"-style names, candidates
    share the noun). Blocking is part of the contract, not an
    optimization hint: cross-block near-matches are by definition not
    candidates, which is what makes the operator scale — the self-join is
    per-block, never corpus x corpus.

    Plan: distinct names once (one agg), then a per-block self-join
    (one exchange on the block key; AQE handles block skew) with the
    JVM levenshtein in the join filter; ``a < b`` halves the pairs and
    drops self-matches. Output (name_a, name_b, edit_dist).
    """
    if block is None:
        block = F.element_at(F.split(F.trim(F.col(name)), r"\s+"), -1)
    # block is evaluated against the ORIGINAL frame (it references the
    # name column); _b is a pure function of _n so the distinct dedups
    # names, not (name, block) combinations
    names = (
        df.filter(F.col(name).isNotNull())
        .select(F.col(name).alias("_n"), block.alias("_b"))
        .distinct()
    )
    # reuse one distinct pass for both sides; the optimizer dedups the scan
    a = names.select(F.col("_b"), F.col("_n").alias("name_a"))
    b = names.select(F.col("_b").alias("_b2"), F.col("_n").alias("name_b"))
    return (
        a.join(b, (F.col("_b") == F.col("_b2")) & (F.col("name_a") < F.col("name_b")))
        .withColumn("edit_dist", F.levenshtein("name_a", "name_b"))
        .filter(F.col("edit_dist") <= int(max_dist))
        .select("name_a", "name_b", "edit_dist")
    )


def table_diff(
    old: DataFrame,
    new: DataFrame,
    keys: list[str],
    compare_cols: list[str],
) -> DataFrame:
    """Snapshot reconciliation (CDC-style diff): per key, whether it was
    added, removed, or changed between two table versions, with the list
    of changed columns — the audit pass before promoting a rebuilt table
    or accepting an upstream refresh.

    Null-safe comparison (``<=>``): NULL -> value and value -> NULL are
    changes, NULL -> NULL is not. Unchanged keys are absent from the
    output, so the result is |churn|-sized, not |table|-sized.

    NULL key components are treated as ordinary key values: the join is
    null-safe (``<=>``) and presence on each side is tracked with literal
    markers, so a NULL-keyed row matches its NULL-keyed counterpart and
    is classified added/removed/changed exactly like any other key
    (rather than silently falling through the equi join as a phantom
    "changed" row with no matching side).

    Plan: ONE full-outer equi join on the keys (the two scans' only
    exchange; with both snapshots bucketed on the keys even that
    disappears); the per-column flags and the changed-column list are
    map-side expressions after it. The raw non-key payload crosses the
    join once — there is no per-column join or repeated scan however
    many columns are compared.
    """
    if not keys or not compare_cols:
        raise ValueError("keys and compare_cols must be non-empty")
    o = old.select(*keys, *compare_cols)
    n = new.select(*keys, *compare_cols)
    o = o.select(
        *[F.col(k).alias(f"_ko_{k}") for k in keys],
        *[F.col(c).alias(f"_o_{c}") for c in compare_cols],
        F.lit(True).alias("_in_old"),
    )
    n = n.select(
        *[F.col(k).alias(f"_kn_{k}") for k in keys],
        *[F.col(c).alias(f"_n_{c}") for c in compare_cols],
        F.lit(True).alias("_in_new"),
    )
    cond = None
    for k in keys:
        c = F.col(f"_ko_{k}").eqNullSafe(F.col(f"_kn_{k}"))
        cond = c if cond is None else (cond & c)
    j = o.join(n, cond, "full_outer")
    in_old = F.coalesce(F.col("_in_old"), F.lit(False))
    in_new = F.coalesce(F.col("_in_new"), F.lit(False))
    changed_flags = [
        F.when(
            ~F.col(f"_o_{c}").eqNullSafe(F.col(f"_n_{c}")), F.lit(c)
        )
        for c in compare_cols
    ]
    changed_arr = F.array_sort(
        F.filter(F.array(*changed_flags), lambda x: x.isNotNull())
    )
    change_type = (
        F.when(in_old & ~in_new, F.lit("removed"))
        .when(~in_old & in_new, F.lit("added"))
        .when(F.size(changed_arr) > 0, F.lit("changed"))
    )
    key_out = [
        F.coalesce(F.col(f"_ko_{k}"), F.col(f"_kn_{k}")).alias(k) for k in keys
    ]
    return (
        j.select(
            *key_out,
            change_type.alias("change_type"),
            F.when(in_old & in_new, F.size(changed_arr))
            .otherwise(F.lit(0))
            .cast("long")
            .alias("n_changed_cols"),
            F.when(
                in_old & in_new, F.array_join(changed_arr, ",")
            ).alias("changed_cols"),
        )
        .filter(F.col("change_type").isNotNull())
    )


def scd2_intervals(
    df: DataFrame,
    key: str,
    attr: str,
    ts: str = "ts",
    order_tiebreak: str = "event_id",
) -> DataFrame:
    """Slowly-changing-dimension (type 2) history build: collapse a
    per-key attribute event stream into validity intervals — one row per
    CONSECUTIVE run of the same attribute value, [valid_from, valid_to)
    with NULL valid_to on the current (open) version, plus a per-key
    version ordinal. The warehouse history table a point-in-time join
    (asof_join) then reads.

    Plan: ONE exchange on the key shared by the change-detection lag,
    the open-interval lead, and the version cumsum (same single-window
    discipline as merge_intervals). Exact integer µs boundaries.
    """
    from pyspark.sql import Window

    w = Window.partitionBy(key).orderBy(ts, order_tiebreak)
    t_us = F.round(F.col(ts).cast("double") * 1e6, 0).cast("long")
    prev = F.lag(F.col(attr)).over(w)
    # first-row detection must NOT be prev.isNull() — that conflates "no
    # previous row" with "previous attr is NULL" and would open a new
    # version per event inside a NULL run; lag over a literal is NULL
    # exactly on the partition's first row.
    first = F.lag(F.lit(1)).over(w).isNull()
    flagged = df.select(
        key,
        F.col(attr),
        t_us.alias("_t_us"),
        F.col(order_tiebreak),
        (first | ~prev.eqNullSafe(F.col(attr)))
        .cast("int")
        .alias("_chg"),
    ).filter(F.col("_chg") == 1)
    w2 = Window.partitionBy(key).orderBy("_t_us", order_tiebreak)
    return flagged.select(
        key,
        F.col(attr),
        F.col("_t_us").alias("valid_from_us"),
        F.lead("_t_us").over(w2).alias("valid_to_us"),
        F.row_number().over(w2).cast("long").alias("version"),
    )


def scd2_apply(
    dim: DataFrame,
    batch: DataFrame,
    key: str,
    attr: str,
    ts: str = "ts",
    order_tiebreak: str = "event_id",
) -> DataFrame:
    """Apply a batch of new change events to an existing SCD2 dimension
    (the :func:`scd2_intervals` shape) in ONE pass: expire each open
    version whose attribute changes, insert the new versions with
    continued ordinals, and pass closed history through untouched — the
    write half of every warehouse dimension load (reference analog: the
    ingest upsert, script/w4h_db_utils.py:160-205), where rebuilding the
    history from the full event log each load would rescan 100 TB.

    Equivalence law (the oracle):
    ``scd2_apply(scd2_intervals(history), batch) ==
    scd2_intervals(history ∪ batch)`` whenever every batch event is
    strictly later than every history event of its key (the append
    contract). The detectable half of a violation — a batch event at or
    before the OPEN version's valid_from — raises in-plan; events
    landing between older history rows are undetectable from the
    folded dim alone and are the caller's contract.

    Plan: one key exchange for the batch's change-detection window, a
    key equi join against the |keys|-sized open slice, and a key-grouped
    expiry aggregate — closed history streams scan→union with no
    exchange. With the dim and batch bucketed on the key, every
    exchange disappears. No interval explosion, nothing driver-side.
    """
    from pyspark.sql import Window

    t_us = F.round(F.col(ts).cast("double") * 1e6, 0).cast("long")
    b = batch.select(
        F.col(key),
        F.col(attr),
        t_us.alias("_t_us"),
        F.col(order_tiebreak).alias("_tb"),
    )
    open_slice = dim.filter(F.col("valid_to_us").isNull()).select(
        F.col(key).alias("_k"),
        F.col(attr).alias("_open_attr"),
        F.col("valid_from_us").alias("_open_from"),
        F.col("version").alias("_open_version"),
        F.lit(True).alias("_has_open"),
    )
    j = b.join(open_slice, F.col(key).eqNullSafe(F.col("_k")), "left").drop("_k")

    w = Window.partitionBy(key).orderBy("_t_us", "_tb")
    rn = F.row_number().over(w)
    prev_attr = F.lag(F.col(attr)).over(w)
    # rn == 1 chains change detection off the open version's attribute
    # (or unconditionally opens v1 for a brand-new key); later rows lag
    # within the batch. eqNullSafe keeps NULL attrs one version.
    first_chg = F.when(F.col("_has_open").isNull(), F.lit(1)).otherwise(
        (~F.col("_open_attr").eqNullSafe(F.col(attr))).cast("int")
    )
    chg = F.when(rn == 1, first_chg).otherwise(
        (~prev_attr.eqNullSafe(F.col(attr))).cast("int")
    )
    # append-contract guard, evaluated for EVERY batch row (it feeds the
    # filter input, so column pruning cannot drop it)
    chg_checked = F.when(
        F.col("_has_open").isNotNull() & (F.col("_t_us") <= F.col("_open_from")),
        F.raise_error(
            F.concat(
                F.lit("scd2_apply: batch event at t_us="),
                F.col("_t_us").cast("string"),
                F.lit(" is not after the open version's valid_from_us="),
                F.col("_open_from").cast("string"),
                F.lit(" — the append contract requires batch events "),
                F.lit("strictly later than all dimension history"),
            )
        ).cast("int"),
    ).otherwise(chg)

    changes = j.select(
        F.col(key),
        F.col(attr),
        "_t_us",
        "_tb",
        "_open_version",
        chg_checked.alias("_chg"),
    ).filter(F.col("_chg") == 1)

    w2 = Window.partitionBy(key).orderBy("_t_us", "_tb")
    new_rows = changes.select(
        F.col(key),
        F.col(attr),
        F.col("_t_us").alias("valid_from_us"),
        F.lead("_t_us").over(w2).alias("valid_to_us"),
        (F.coalesce(F.col("_open_version"), F.lit(0)) + F.row_number().over(w2))
        .cast("long")
        .alias("version"),
    )

    expire = changes.groupBy(F.col(key).alias("_k")).agg(
        F.min("_t_us").alias("_expire_at")
    )
    open_updated = (
        dim.filter(F.col("valid_to_us").isNull())
        .join(expire, F.col(key).eqNullSafe(F.col("_k")), "left")
        .select(
            F.col(key),
            F.col(attr),
            F.col("valid_from_us"),
            F.col("_expire_at").alias("valid_to_us"),
            F.col("version"),
        )
    )
    closed = dim.filter(F.col("valid_to_us").isNotNull()).select(
        F.col(key), F.col(attr), "valid_from_us", "valid_to_us", "version"
    )
    return closed.unionByName(open_updated).unionByName(new_rows)


def kfold_assignment(
    df: DataFrame,
    k: int = 5,
    id_col: str = "doc_id",
    salt: str = "kfold",
) -> DataFrame:
    """Deterministic k-fold cross-validation assignment: fold =
    ``portable_hash32(salt || id) % k`` — the same portable-hash
    membership family as :func:`stratified_sample` / `stable_split`, so
    the fold of a row is a pure function of its id: stable across runs,
    engines, partitionings, and corpus growth (new rows never move old
    rows between folds, unlike ntile/row_number folds). Change ``salt``
    to draw an independent fold assignment.

    Returns the input with a ``fold`` column appended (map-side only —
    callers filter ``fold != i`` / ``fold == i`` for train/eval; both
    predicates push into the scan when the assignment is materialized).
    """
    from ..functions import portable_hash32

    if k <= 1:
        raise ValueError(f"k must be >= 2, got {k}")
    fold = (
        portable_hash32(F.concat(F.lit(salt + "|"), F.col(id_col).cast("string")))
        % F.lit(k)
    ).cast("long")
    return df.withColumn("fold", fold)


def agg_state_from_batch(
    batch: DataFrame,
    keys: list[str],
    value: str,
) -> DataFrame:
    """Per-key mergeable aggregate state from a raw batch: (n, sum_us,
    min_us, max_us) over the µ-scaled value — the partial-aggregation
    shape Spark itself uses map-side, materialized as a TABLE so a
    100 TB rolling aggregate can be maintained by folding daily
    increments (:func:`merge_agg_state`) instead of rescanning history.
    All fields are exact integers, so merge order can never move a bit.
    """
    if not keys:
        raise ValueError("keys must be non-empty")
    v_us = F.round(F.col(value).cast("double") * 1e6, 0).cast("long")
    return batch.groupBy(*keys).agg(
        F.count(v_us).cast("long").alias("n"),
        F.sum(v_us).cast("long").alias("sum_us"),
        F.min(v_us).alias("min_us"),
        F.max(v_us).alias("max_us"),
    )


def merge_agg_state(
    state: DataFrame | None,
    increment: DataFrame,
    keys: list[str] | None = None,
) -> DataFrame:
    """Fold one state table into another: union + per-key merge with the
    aggregate's own merge functions (sum of n/sum, min of min, max of
    max — each field decomposable by construction). Associative and
    commutative, so any batching of history produces the identical
    state — the incremental-view-maintenance contract, tested as
    fold(batches) == one-shot. ONE exchange on the keys per fold; with
    the state table bucketed on the keys even that disappears.

    ``keys`` defaults to every column not named by the four metric
    fields — pass it explicitly (as :func:`agg_state_from_batch`
    requires) when a grouping column shares a metric name ("n",
    "sum_us", ...), which inference cannot distinguish. A state table
    that lacks any of the four metric columns, or an explicit key set
    that doesn't exactly partition ``state.columns`` alongside them,
    raises instead of silently folding a key as a metric.
    """
    if state is None:
        return increment
    metric_cols = ("n", "sum_us", "min_us", "max_us")
    missing = [c for c in metric_cols if c not in state.columns]
    if missing:
        raise ValueError(
            f"merge_agg_state: state table is missing metric columns "
            f"{missing} — not an agg_state_from_batch output?"
        )
    if keys is None:
        keys = [c for c in state.columns if c not in metric_cols]
    else:
        overlap = sorted(set(keys) & set(metric_cols))
        if overlap:
            raise ValueError(
                f"merge_agg_state: key columns {overlap} collide with "
                f"metric field names — rename them upstream; inference "
                f"would silently fold them as metrics"
            )
        if set(keys) | set(metric_cols) != set(state.columns):
            raise ValueError(
                f"merge_agg_state: keys {sorted(keys)} + metric fields "
                f"must exactly partition state.columns "
                f"{sorted(state.columns)}"
            )
    if not keys:
        raise ValueError("merge_agg_state: no grouping keys")
    if set(increment.columns) != set(state.columns):
        raise ValueError(
            f"merge_agg_state: increment columns "
            f"{sorted(increment.columns)} != state columns "
            f"{sorted(state.columns)}"
        )
    return (
        state.unionByName(increment)
        .groupBy(*keys)
        .agg(
            F.sum("n").cast("long").alias("n"),
            F.sum("sum_us").cast("long").alias("sum_us"),
            F.min("min_us").alias("min_us"),
            F.max("max_us").alias("max_us"),
        )
    )
