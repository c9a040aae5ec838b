"""Data-quality expectations: declarative constraint validation.

The dbt-test / Great-Expectations shape a 100 TB ingest gate needs:
declare constraints, get back one small report relation
``(rule STRING, violations BIGINT, passed BOOLEAN)`` — never a
per-row blowup. A pipeline asserts ``passed`` before promoting a
snapshot; the violation counts (not just booleans) make the report
diffable across loads.

Scale shape: every scalar rule (not-null, range, accepted-values)
FUSES into one aggregation over a single scan of the table — adding
rules adds expressions, not passes. Uniqueness is one
partial-combined groupBy per declared key; referential integrity is
one (broadcast-able) anti join per declared key. The report itself
is rule-cardinality-sized. Everything stays lazy — no driver
collects inside the operator.

Extension tier: the reference has no constraint surface (SURVEY §2.13).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def expectations_report(
    df: DataFrame,
    not_null: list[str] | None = None,
    unique: list[list[str]] | None = None,
    ranges: dict[str, tuple[float, float]] | None = None,
    accepted: dict[str, list] | None = None,
    foreign_keys: list[tuple[str, DataFrame, str]] | None = None,
) -> DataFrame:
    """Validate ``df`` against declared expectations.

    - ``not_null``: columns that must never be NULL.
    - ``unique``: key-column lists that must have no duplicate rows
      (violations = number of surplus rows beyond one per key).
    - ``ranges``: ``col -> (lo, hi)`` inclusive bounds (NULLs are the
      ``not_null`` rule's business and do not violate a range).
    - ``accepted``: ``col -> allowed values`` (again NULL-exempt).
    - ``foreign_keys``: ``(col, ref_df, ref_col)`` — every non-NULL
      value must exist in the reference relation.

    Returns ``(rule, violations, passed)``, one row per rule, ordered
    by rule name for deterministic presentation.
    """
    spark = df.sparkSession
    scalar_exprs = []
    for c in not_null or []:
        scalar_exprs.append(
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0))
            .cast("long")
            .alias(f"not_null:{c}")
        )
    for c, (lo, hi) in (ranges or {}).items():
        bad = F.col(c).isNotNull() & (
            (F.col(c) < F.lit(lo)) | (F.col(c) > F.lit(hi))
        )
        scalar_exprs.append(
            F.sum(F.when(bad, 1).otherwise(0))
            .cast("long")
            .alias(f"range:{c}")
        )
    for c, values in (accepted or {}).items():
        bad = F.col(c).isNotNull() & ~F.col(c).isin(values)
        scalar_exprs.append(
            F.sum(F.when(bad, 1).otherwise(0))
            .cast("long")
            .alias(f"accepted:{c}")
        )

    reports: list[DataFrame] = []
    if scalar_exprs:
        wide = df.agg(*scalar_exprs)
        stack = ", ".join(
            f"'{c}', `{c}`" for c in wide.columns
        )
        reports.append(
            wide.select(
                F.expr(
                    f"stack({len(wide.columns)}, {stack}) "
                    "AS (rule, violations)"
                )
            )
        )
    for keys in unique or []:
        surplus = (
            df.groupBy(*keys)
            .agg(F.count("*").alias("__n"))
            .agg(
                F.coalesce(
                    F.sum(F.col("__n") - 1), F.lit(0)
                )
                .cast("long")
                .alias("violations")
            )
            .select(
                F.lit("unique:" + ",".join(keys)).alias("rule"),
                "violations",
            )
        )
        reports.append(surplus)
    for col, ref_df, ref_col in foreign_keys or []:
        missing = (
            df.where(F.col(col).isNotNull())
            .join(
                ref_df.select(
                    F.col(ref_col).alias(col)
                ).distinct(),
                on=col,
                how="left_anti",
            )
            .agg(F.count("*").cast("long").alias("violations"))
            .select(
                F.lit(f"fk:{col}->{ref_col}").alias("rule"),
                "violations",
            )
        )
        reports.append(missing)

    if not reports:
        return spark.createDataFrame(
            [], "rule string, violations long, passed boolean"
        )
    out = reports[0]
    for r in reports[1:]:
        out = out.unionAll(r)
    return out.select(
        "rule",
        "violations",
        (F.col("violations") == 0).alias("passed"),
    ).orderBy("rule")


__all__ = ["expectations_report"]


def profile_columns(
    df: DataFrame,
    cols: list[str] | None = None,
    exact_distinct: bool = True,
) -> DataFrame:
    """Column profiler: one row per column with the ingest-triage
    stats every new 100 TB table gets asked for first::

        (column, n_rows, n_null, n_distinct,
         min_num, max_num, min_str, max_str)

    Numeric and timestamp columns populate ``min_num``/``max_num``
    (timestamps as whole-second epochs — the sessionize convention);
    string columns populate ``min_str``/``max_str``; ``n_distinct``
    counts non-NULL distincts.

    Plan: one UNION branch per column, each scanning ONLY its column
    (parquet column pruning makes n single-column scans ≈ one
    all-column scan in bytes) with a single partial-combined
    aggregation — no Expand, unlike a fused multi-count_distinct
    SELECT whose Expand multiplies the row stream by the column
    count. With ``exact_distinct=False`` the distinct count switches
    to ``approx_count_distinct`` (HLL, mergeable) — the true 100 TB
    default when exactness isn't contractual; the exact form is kept
    for oracle parity.
    """
    cols = list(cols) if cols is not None else list(df.columns)
    if not cols:
        raise ValueError("profile_columns: cols must be non-empty")
    dtypes = dict(df.dtypes)
    numeric = ("tinyint", "smallint", "int", "bigint", "float", "double")
    branches = []
    for c in cols:
        dt = dtypes[c]
        col = F.col(c)
        if dt.startswith("decimal") or dt in numeric:
            num = col.cast("double")
        elif dt == "timestamp":
            num = F.unix_timestamp(col).cast("double")
        elif dt == "timestamp_ntz":
            # Parquet fixture timestamps read as TIMESTAMP_NTZ; route
            # through the tz-free naive epoch (days since 1970 × 86400
            # + time of day) like relational._bucket_epoch —
            # unix_timestamp on NTZ would apply the session tz and
            # diverge from DuckDB's epoch() on naive timestamps.
            num = (
                F.unix_date(F.to_date(col)) * F.lit(86400).cast("long")
                + F.hour(col) * 3600
                + F.minute(col) * 60
                + F.second(col)
            ).cast("double")
        elif dt == "date":
            num = (
                F.unix_date(col) * F.lit(86400).cast("long")
            ).cast("double")
        else:
            num = None
        n_distinct = (
            F.count_distinct(col)
            if exact_distinct
            else F.approx_count_distinct(col)
        )
        branches.append(
            df.select(col).agg(
                F.lit(c).alias("column"),
                F.count(F.lit(1)).alias("n_rows"),
                (F.count(F.lit(1)) - F.count(col)).alias("n_null"),
                n_distinct.cast("long").alias("n_distinct"),
                (F.min(num) if num is not None else F.lit(None))
                .cast("double")
                .alias("min_num"),
                (F.max(num) if num is not None else F.lit(None))
                .cast("double")
                .alias("max_num"),
                (F.min(col) if dt == "string" else F.lit(None))
                .cast("string")
                .alias("min_str"),
                (F.max(col) if dt == "string" else F.lit(None))
                .cast("string")
                .alias("max_str"),
            )
        )
    out = branches[0]
    for b in branches[1:]:
        out = out.unionAll(b)
    return out


def benford_audit(df: DataFrame, value_col: str) -> DataFrame:
    """First-digit Benford's-law audit of a positive numeric column —
    the classic fabricated-data / broken-generator detector for
    financial-shaped values. Returns one row per leading digit
    ``(digit, n_obs, p_obs, p_benford, chi2)`` with the 8-dof χ²
    repeated on every row (the reader's verdict column).

    The leading digit comes from the INTEGER part's decimal string
    (``substr(cast(floor(x) as string), 1, 1)``) — floor and bigint
    formatting are bit-identical in every engine, where a
    ``log10``-based extraction can flip a digit on a ulp. Values < 1
    are excluded (their first significant digit needs log10). One
    pruned scan to the 9-row digit relation; χ² is a window over it.
    """
    x = F.col(value_col).cast("double")
    digit = F.substring(
        F.floor(x).cast("long").cast("string"), 1, 1
    ).cast("int")
    obs = (
        df.where(x >= 1)
        .select(digit.alias("digit"))
        .groupBy("digit")
        .agg(F.count("*").alias("n_obs"))
    )
    w = Window.partitionBy(F.lit(1))
    n = F.sum("n_obs").over(w).cast("double")
    p_obs = F.col("n_obs").cast("double") / n
    p_ben = F.log10(1.0 + 1.0 / F.col("digit"))
    dev = F.col("n_obs").cast("double") - n * p_ben
    chi2 = F.sum(dev * dev / (n * p_ben)).over(w)
    return obs.select(
        "digit",
        "n_obs",
        F.round(p_obs, 6).alias("p_obs"),
        F.round(p_ben, 6).alias("p_benford"),
        F.round(chi2, 6).alias("chi2"),
    )


def k_anonymity(
    df: DataFrame, quasi_cols: list[str], k: int = 5
) -> DataFrame:
    """k-anonymity audit over a quasi-identifier set — the privacy
    gate a dataset release runs: every row must share its
    quasi-identifier combination with at least ``k−1`` others.
    Returns one row ``(n_rows, n_groups, min_group, n_violating_groups,
    rows_at_risk, frac_at_risk)``.

    One corpus groupBy to the quasi-identifier relation; the summary
    is a second aggregate over THAT (group-space, tiny). At 100 TB
    the quasi-identifier relation is the only shuffle and it partial-
    aggregates map-side.
    """
    groups = df.groupBy(*quasi_cols).agg(F.count("*").alias("g"))
    return groups.agg(
        F.sum("g").cast("long").alias("n_rows"),
        F.count("*").alias("n_groups"),
        F.min("g").alias("min_group"),
        F.sum(F.when(F.col("g") < k, 1).otherwise(0)).alias(
            "n_violating_groups"
        ),
        F.sum(F.when(F.col("g") < k, F.col("g")).otherwise(0))
        .cast("long")
        .alias("rows_at_risk"),
        F.round(
            F.sum(F.when(F.col("g") < k, F.col("g")).otherwise(0))
            / F.sum("g"),
            6,
        ).alias("frac_at_risk"),
    )
