"""S4/S6 — JDBC database source (the reference's Prisma/Postgres reads).

Every Prisma read in the reference compiles to a WHERE-clause SQL
query evaluated in Postgres (/root/reference/src/queries.ts:12-121):
point lookups on charge (date, amount, customerId, seqNo), and
filtered findMany scans on departmentSales / charge by (date,
customerId, tranType) combos. The Spark-first counterpart is
``spark.read.format("jdbc")`` with:

- predicate + column pushdown (``pushDownPredicate`` /
  ``pushDownAggregate`` / ``pushDownLimit`` — Catalyst pushes
  ``.filter``/``.select`` into the remote SQL, so a post-load filter
  behaves like the Prisma WHERE);
- partitioned parallel reads for big tables: either numeric/temporal
  range splits (``partitionColumn``/``lowerBound``/``upperBound``/
  ``numPartitions``) or explicit per-partition ``predicates`` (e.g.
  one day per task for a date-keyed charge table);
- bounded fetch (``fetchsize``) so executors stream rows instead of
  buffering whole result sets.

The N+1 loop in fetchChargesfromDB (one findFirst per workbook row) is
deliberately NOT reproduced: the engine's reconciliation is the single
broadcast join in ``operators/reconcile.py`` — the JDBC source only
needs to deliver the charge table (or its pushed-down date slice).

This container ships no JDBC driver or database, so tests pin the
option assembly and the reader construction; the filter semantics are
shared with (and parity-tested against) the parquet path, which is
the same DataFrame once loaded.
"""

from __future__ import annotations

import datetime
import re
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class JdbcConfig:
    """Connection settings (the reference keeps these in Prisma's
    DATABASE_URL env; here they are explicit config — SURVEY §2 Q5
    classifies env validation as driver config)."""

    url: str
    driver: str | None = None
    user: str | None = None
    password: str | None = None
    fetchsize: int = 10_000
    extra: dict[str, str] = field(default_factory=dict)


def reader_options(
    cfg: JdbcConfig,
    table: str | None = None,
    query: str | None = None,
    partition_column: str | None = None,
    lower_bound: str | int | None = None,
    upper_bound: str | int | None = None,
    num_partitions: int | None = None,
) -> dict[str, str]:
    """Assemble the option map for ``spark.read.format("jdbc")``.

    Exactly one of ``table`` (pushdown-capable) or ``query`` (remote
    subquery — Spark wraps it as an aliased derived table) is
    required. Range partitioning needs all four partition options;
    asking for a subset is a config error caught here, not a silent
    single-task read.
    """
    if (table is None) == (query is None):
        raise ValueError("exactly one of table= or query= is required")
    opts: dict[str, str] = {"url": cfg.url, "fetchsize": str(cfg.fetchsize)}
    if table is not None:
        opts["dbtable"] = table
        # pushdown flags are only valid on the table form
        opts["pushDownPredicate"] = "true"
        opts["pushDownAggregate"] = "true"
        opts["pushDownLimit"] = "true"
    else:
        opts["query"] = query
    if cfg.driver:
        opts["driver"] = cfg.driver
    if cfg.user:
        opts["user"] = cfg.user
    if cfg.password:
        opts["password"] = cfg.password
    part_opts = (partition_column, lower_bound, upper_bound, num_partitions)
    if any(o is not None for o in part_opts):
        if any(o is None for o in part_opts):
            raise ValueError(
                "range partitioning requires ALL of partition_column, "
                "lower_bound, upper_bound, num_partitions — a partial spec "
                "would silently fall back to a single-task read"
            )
        if table is None:
            raise ValueError("range partitioning requires the table= form")
        opts.update(
            partitionColumn=str(partition_column),
            lowerBound=str(lower_bound),
            upperBound=str(upper_bound),
            numPartitions=str(num_partitions),
        )
    opts.update(cfg.extra)
    return opts


def read_table(
    spark: SparkSession,
    cfg: JdbcConfig,
    table: str,
    partition_column: str | None = None,
    lower_bound: str | int | None = None,
    upper_bound: str | int | None = None,
    num_partitions: int | None = None,
) -> DataFrame:
    """Load a table through JDBC with pushdown enabled. Filters and
    projections applied to the result are pushed into the remote SQL
    by Catalyst — the Prisma ``where``/``select`` equivalents."""
    return (
        spark.read.format("jdbc")
        .options(
            **reader_options(
                cfg,
                table=table,
                partition_column=partition_column,
                lower_bound=lower_bound,
                upper_bound=upper_bound,
                num_partitions=num_partitions,
            )
        )
        .load()
    )


def read_partitioned_by_predicates(
    spark: SparkSession,
    cfg: JdbcConfig,
    table: str,
    predicates: list[str],
) -> DataFrame:
    """Parallel read with one explicit WHERE clause per partition —
    the natural split for a date-keyed charge table (one day per
    task), mirroring how the reference's reads are all date-scoped."""
    props = {"fetchsize": str(cfg.fetchsize), **cfg.extra}
    if cfg.driver:
        props["driver"] = cfg.driver
    if cfg.user:
        props["user"] = cfg.user
    if cfg.password:
        props["password"] = cfg.password
    return spark.read.jdbc(cfg.url, table, predicates=predicates, properties=props)


_IDENT_RE = re.compile(r"^[A-Za-z_][A-Za-z0-9_.]*$")


def day_predicates(date_col: str, days: list[str]) -> list[str]:
    """One pushdown predicate per day — partition splits for
    date-scoped reads (every reference query filters on a date).

    Both inputs are interpolated into SQL pushed to the remote
    database, so both are validated: ``date_col`` must be a plain
    (possibly dotted) identifier and each day a real ISO date —
    a malformed or hostile string raises here instead of breaking or
    injecting into the remote WHERE clause.
    """
    if not _IDENT_RE.match(date_col):
        raise ValueError(f"day_predicates: invalid column name {date_col!r}")
    out = []
    for d in days:
        try:
            parsed = datetime.date.fromisoformat(str(d))
        except ValueError as exc:
            raise ValueError(
                f"day_predicates: {d!r} is not a YYYY-MM-DD date"
            ) from exc
        out.append(f"{date_col} = DATE '{parsed.isoformat()}'")
    return out
