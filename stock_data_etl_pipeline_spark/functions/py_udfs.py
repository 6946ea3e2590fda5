"""The Python-side UDF taxonomy the engine supports, one exemplar each.

The repo's rule is native-first: every hot-path operator is Column
expressions or Arrow batches (SURVEY §2.11).  These exemplars document
the remaining two rungs of the ladder for the cases that genuinely need
per-row Python:

- ``WordNGrams`` — a UDTF (user-defined TABLE function, PySpark 4):
  one input row fans out to N output rows through a lateral join.  Use
  when the fan-out logic is imperative; for pure token windows the
  native ``sequence + posexplode`` (operators/corpus.chunk_documents)
  is strictly faster.
- ``gmean`` — a pandas GROUPED_AGG UDAF: Arrow-vectorized per-group
  reduction for aggregates Spark lacks natively.  Partial aggregation
  does NOT apply (the whole group ships to one executor), so keep the
  grouped columns narrow; here that's one double per row.

Tokenization matches functions/text.words exactly (whitespace split,
empties dropped) so UDTF output is comparable against the same SQL
oracle macros as the native operators.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql.functions import pandas_udf, udtf
from pyspark.sql.types import (DoubleType, LongType, StringType,
                               StructField, StructType)

# DataType instances, NOT DDL strings: string return types are parsed
# through the active SparkContext, which would make importing this
# module require a live session
_NGRAM_SCHEMA = StructType([StructField("pos", LongType()),
                            StructField("ngram", StringType())])


@udtf(returnType=_NGRAM_SCHEMA)
class WordNGrams:
    """Lateral word-n-gram expansion: (pos, ngram) per input row."""

    def eval(self, text: str, n: int):  # noqa: ANN201 — UDTF protocol
        if text is None or n is None or n < 1:
            return
        ws = [w for w in text.split(" ") if w != ""]
        for i in range(len(ws) - n + 1):
            yield i, " ".join(ws[i:i + n])


@pandas_udf(DoubleType())
def gmean(v: pd.Series) -> float:
    """Geometric mean (GROUPED_AGG): exp(mean(ln x)), NaN-safe for
    empty groups, defined for positive inputs."""
    import numpy as np
    arr = v.dropna().to_numpy(dtype="float64")
    if arr.size == 0:
        return float("nan")
    return float(np.exp(np.log(arr).mean()))
