from timeseriesutils_spark.functions.names import (  # noqa: F401
    lag_name,
    target_name,
    rollmean_name,
    taylor_name,
    domfreq_name,
    domfreq_logpow_name,
)
