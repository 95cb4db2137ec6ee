"""Grouped-agg pandas UDFs (Arrow UDAFs).

NOTE: deliberately NO ``from __future__ import annotations`` here —
pandas_udf infers the UDAF eval type from the *evaluated* type hints,
and postponed (stringified) annotations break that inference with
UNSUPPORTED_SIGNATURE.
"""

import numpy as np
import pandas as pd
from pyspark.sql.functions import pandas_udf


@pandas_udf("array<double>")
def vec_mean(v: pd.Series) -> list:
    """Element-wise mean of an array column — the one aggregate in
    the surface that genuinely wants numpy (no built-in vector-mean
    aggregate). Rounded to 6dp for cross-engine comparability."""
    return np.round(np.mean(np.stack(v.to_numpy()), axis=0), 6).tolist()
