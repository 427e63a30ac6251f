"""User-defined function surface (SURVEY.md §2.3 "UDF / UDAF / UDTF"):

- vectorized scalar pandas_udf (Arrow-batched — the only acceptable Python
  hot path, ~10-100× over row-at-a-time UDFs);
- registration via spark.udf.register so the same kernels are callable
  from the SQL surface;
- grouped-map (applyInPandas) and map-iterator (mapInPandas) variants live
  with their operators (matrix._multiply_blocked, multimodal.decode_features).

These are engine mechanisms, not oracle queries — exercised by
tests/test_udfs.py.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import SparkSession
from pyspark.sql.functions import pandas_udf


def make_udfs() -> dict:
    """Build the vectorized UDFs (lazily — pandas_udf creation needs an
    active SparkSession, so this can't run at import time)."""

    @pandas_udf("double")
    def vec_l2_norm(emb: pd.Series) -> pd.Series:
        """Vectorized L2 norm over an array<float> column (numpy per Arrow
        batch).  The built-in higher-order-function route
        (functions/vector.py) is preferred in queries; this exercises the
        pandas_udf path."""
        import numpy as np

        return emb.map(lambda v: float(np.sqrt(np.dot(v, v))))

    @pandas_udf("long")
    def token_count_udf(text: pd.Series) -> pd.Series:
        """Vectorized whitespace token count."""
        return text.str.split().str.len().astype("int64")

    return {"mmbd_l2_norm": vec_l2_norm, "mmbd_token_count": token_count_udf}


def register_udfs(spark: SparkSession) -> dict:
    """Expose the vectorized kernels to SQL: SELECT mmbd_l2_norm(embedding)."""
    udfs = make_udfs()
    for name, fn in udfs.items():
        spark.udf.register(name, fn)
    return udfs
