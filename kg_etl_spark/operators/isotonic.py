"""Isotonic regression per group — pool-adjacent-violators (PAV), the
score-calibration step (Zadrozny & Elkan, KDD'02; Robertson et al.,
"Order Restricted Statistical Inference") a ranking/classification
pipeline runs to turn raw model scores into calibrated probabilities.

PAV is inherently sequential over the x-sorted series (each pooling
decision depends on the previous pool), i.e. one of the documented
genuinely-non-relational kernels → `applyInPandas` per group (Arrow
batches, no row-at-a-time Python). The unit of parallelism is the
group key; series length per group is the memory bound — the same
contract as sessionization/union-find here.

Weighted PAV with exact in-pool means: pools carry (sum, count) so the
fitted value is a rational of exact sums, computed once per pool —
deterministic regardless of partition layout (the series order is
total: (x, tiebreak id)).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T


def _pav(y: list[float], w: list[float]) -> list[float]:
    """Classic PAV over a sequence: nondecreasing fit minimizing
    weighted squared error. Returns the fitted value per position."""
    # pools: (sum, weight, count)
    sums: list[float] = []
    wts: list[float] = []
    cnts: list[int] = []
    for yi, wi in zip(y, w):
        sums.append(yi * wi)
        wts.append(wi)
        cnts.append(1)
        # merge backwards while the mean decreases
        while len(sums) > 1 and sums[-2] * wts[-1] > sums[-1] * wts[-2]:
            sums[-2] += sums[-1]
            wts[-2] += wts[-1]
            cnts[-2] += cnts[-1]
            sums.pop(); wts.pop(); cnts.pop()
    out: list[float] = []
    for s, wt, c in zip(sums, wts, cnts):
        out.extend([s / wt] * c)
    return out


def isotonic_fit(
    df: DataFrame,
    group_col: str,
    x_col: str,
    y_col: str,
    id_col: str,
) -> DataFrame:
    """(group, x, y, y_fit) — nondecreasing y_fit(x) per group; rows
    ordered by (x, id) inside the kernel so ties are total-ordered."""
    schema = T.StructType(
        [
            T.StructField(group_col, df.schema[group_col].dataType),
            T.StructField(x_col, df.schema[x_col].dataType),
            T.StructField(y_col, T.DoubleType()),
            T.StructField("y_fit", T.DoubleType()),
        ]
    )

    def fit(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values([x_col, id_col]).reset_index(drop=True)
        ys = [float(v) for v in pdf[y_col]]
        fitted = _pav(ys, [1.0] * len(ys))
        return pd.DataFrame(
            {
                group_col: pdf[group_col],
                x_col: pdf[x_col],
                y_col: ys,
                "y_fit": [round(v, 6) for v in fitted],
            }
        )

    cols = list(dict.fromkeys([group_col, x_col, y_col, id_col]))
    return df.select(*cols).groupBy(group_col).applyInPandas(fit, schema)
