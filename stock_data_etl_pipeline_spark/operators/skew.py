"""Skew-aware join: key salting.

AQE's skew-join splitting (on by default in session.py) handles most skew
at runtime; salting is the explicit fallback for joins AQE can't split —
e.g. a hot key against a medium-sized build side that's too big to
broadcast. Standard technique: explode the build side SALT ways, scatter
the probe side's hot keys across the salts, join on (key, salt):

    probe:  salt = hash(row) % SALT         (hot keys scatter)
    build:  replicated once per salt value  (SALT x build size)

The join result is identical to the unsalted equi-join; only the shuffle
distribution changes (the hot key's rows land on SALT reducers instead
of one).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(probe: DataFrame, build: DataFrame, key: str,
                salt: int = 8, how: str = "inner",
                salt_col: str = "_salt") -> DataFrame:
    """Equi-join on ``key`` with ``salt``-way hot-key scattering.
    ``build`` is replicated ``salt`` times — keep it the smaller side.
    Output columns = probe columns + build columns (minus its key copy).
    """
    if salt < 1:
        raise ValueError("salt must be >= 1")
    p = probe.withColumn(
        salt_col, F.pmod(F.xxhash64(*probe.columns), F.lit(salt)))
    b = (build.withColumn(salt_col, F.explode(
            F.array(*[F.lit(i) for i in range(salt)])))
         .withColumnRenamed(key, f"_{key}_b"))
    joined = p.join(b, (p[key] == b[f"_{key}_b"])
                    & (p[salt_col] == b[salt_col]), how)
    return joined.drop(salt_col).drop(f"_{key}_b")
