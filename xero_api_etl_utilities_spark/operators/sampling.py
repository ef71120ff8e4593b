"""Deterministic sampling & dataset-split operators.

Training pipelines need REPRODUCIBLE sampling: ``df.sample()`` /
``sampleBy()`` draw from engine-and-partitioning-dependent RNG streams
— rerun the job, get a different corpus. These operators derive every
decision from a content hash (crosshash — md5-based, engine-portable),
so the same row lands in the same sample/split on any engine, any
partitioning, any rerun; membership is a pure scan predicate (no
shuffle, pushes into the row filter).

- ``systematic_sample``: keep rows whose key hashes into the first
  ``num/den`` fraction of hash space.
- ``assign_split``: label each row train/val/test by hash bucket —
  a disjoint, exhaustive, stable partition of the corpus. ``salt``
  decorrelates split assignment from any other hash use of the key
  (and from other experiments).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from xero_api_etl_utilities_spark.functions.crosshash import h32


def _bucket(key_col, salt: str, den: int):
    """Stable bucket in [0, den) from the salted key hash."""
    return h32(F.concat_ws("|", F.lit(salt), F.col(key_col).cast("string"))) % den


def systematic_sample(
    df: DataFrame, key_col: str, num: int, den: int, salt: str = "sample"
) -> DataFrame:
    """Keep ~num/den of rows, chosen by salted key hash — deterministic
    across engines, reruns and repartitioning."""
    if not 0 < num <= den:
        raise ValueError(f"need 0 < num <= den, got {num}/{den}")
    return df.filter(_bucket(key_col, salt, den) < num)


def stratified_sample(
    df: DataFrame,
    key_col: str,
    stratum_col: str,
    rates: dict[str, tuple[int, int]],
    salt: str = "stratified",
    default: tuple[int, int] | None = None,
) -> DataFrame:
    """Per-stratum deterministic sampling: each stratum value gets its
    own (num, den) keep-rate — the reproducible twin of
    ``df.sampleBy()``. A training pipeline uses this to rebalance a
    corpus (e.g. downsample the dominant language) without the
    rerun-instability of RNG sampling; membership stays a pure scan
    predicate.

    Strata not listed in ``rates`` are dropped unless ``default`` is
    given. The salt includes the stratum so the same key draws
    independently in different strata.
    """
    if not rates and default is None:
        raise ValueError("stratified_sample needs at least one rate or a default")
    for stratum, (num, den) in rates.items():
        if not 0 < num <= den:
            raise ValueError(f"need 0 < num <= den for {stratum!r}, got {num}/{den}")
    if default is not None and not 0 < default[0] <= default[1]:
        raise ValueError(f"need 0 < num <= den for default, got {default}")
    def b(den: int):
        # the stratum value joins the salt, so the same key draws an
        # independent coin in each stratum (and rebalancing one
        # stratum's rate never perturbs another's membership)
        return (
            h32(
                F.concat_ws(
                    "|",
                    F.lit(salt),
                    F.col(stratum_col).cast("string"),
                    F.col(key_col).cast("string"),
                )
            )
            % den
        )

    cond = None
    for stratum, (num, den) in rates.items():
        this = (F.col(stratum_col) == stratum) & (b(den) < num)
        cond = this if cond is None else cond | this
    if default is not None:
        num, den = default
        if rates:
            listed = [F.lit(s) for s in rates]
            dcond = ~F.col(stratum_col).isin(*listed) & (b(den) < num)
        else:
            dcond = b(den) < num
        cond = dcond if cond is None else cond | dcond
    return df.filter(cond)


def assign_split(
    df: DataFrame,
    key_col: str,
    train_pct: int = 80,
    val_pct: int = 10,
    salt: str = "split",
) -> DataFrame:
    """Attach a ``split`` column (train/val/test) by hash bucket out of
    100; test gets the remainder. Disjoint and exhaustive by
    construction."""
    if not (0 <= train_pct and 0 <= val_pct and train_pct + val_pct <= 100):
        raise ValueError("train_pct/val_pct must be >=0 and sum to <=100")
    b = _bucket(key_col, salt, 100)
    return df.withColumn(
        "split",
        F.when(b < train_pct, "train")
        .when(b < train_pct + val_pct, "val")
        .otherwise("test"),
    )
