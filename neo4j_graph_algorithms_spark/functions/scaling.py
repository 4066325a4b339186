"""Feature scaling for node properties / embedding columns — the
pre-training normalization step (GDS-era ``gds.scaleProperties``
shape; the reference has no feature-engineering surface).

Scalers (all exact, all computed with one global aggregate + one lazy
projection — no windows, no per-row Python):

- ``minmax``:   (x − min) / (max − min); 0 when max = min
- ``stdscore``: (x − mean) / stddev_pop; 0 when stddev = 0
- ``center``:   x − mean
- ``max``:      x / max(|x|); 0 when all zero
- ``log``:      sign(x) · ln(1 + |x|)  (aggregate-free)
- ``l2norm``:   row-wise across the given columns: x / ‖row‖₂
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_AGG_SCALERS = {"minmax", "stdscore", "center", "max"}


def scale_properties(
    df: DataFrame,
    cols: list[str],
    scaler: str = "minmax",
    suffix: str = "_scaled",
) -> DataFrame:
    """Scale ``cols``, appending ``<col><suffix>`` columns (inputs are
    kept).  ``l2norm`` scales each row's vector across ``cols``
    jointly; every other scaler is per-column."""
    if scaler == "log":
        out = df
        for c in cols:
            out = out.withColumn(
                c + suffix,
                F.signum(c) * F.log1p(F.abs(F.col(c))),
            )
        return out
    if scaler == "l2norm":
        nrm = F.sqrt(sum(F.col(c) * F.col(c) for c in cols))
        out = df
        for c in cols:
            out = out.withColumn(
                c + suffix,
                F.when(nrm > 0.0, F.col(c) / nrm).otherwise(F.lit(0.0)),
            )
        return out
    if scaler not in _AGG_SCALERS:
        raise ValueError(
            f"scaler must be one of {sorted(_AGG_SCALERS | {'log', 'l2norm'})}, "
            f"got {scaler!r}"
        )
    aggs = []
    for c in cols:
        aggs += [
            F.min(c).alias(f"{c}__mn"),
            F.max(c).alias(f"{c}__mx"),
            F.avg(c).alias(f"{c}__mean"),
            F.stddev_pop(c).alias(f"{c}__sd"),
            F.max(F.abs(F.col(c))).alias(f"{c}__amax"),
        ]
    stats = df.agg(*aggs).collect()[0]
    out = df
    for c in cols:
        mn, mx = stats[f"{c}__mn"], stats[f"{c}__mx"]
        mean, sd = stats[f"{c}__mean"], stats[f"{c}__sd"]
        amax = stats[f"{c}__amax"]
        if scaler == "minmax":
            rng = (mx - mn) if (mx is not None and mn is not None) else None
            expr = (
                (F.col(c) - F.lit(mn)) / F.lit(rng)
                if rng
                else F.lit(0.0)
            )
        elif scaler == "stdscore":
            expr = (F.col(c) - F.lit(mean)) / F.lit(sd) if sd else F.lit(0.0)
        elif scaler == "center":
            expr = F.col(c) - F.lit(mean)
        else:  # max
            expr = F.col(c) / F.lit(amax) if amax else F.lit(0.0)
        out = out.withColumn(c + suffix, expr.cast("double"))
    return out
