from fiveg_spark.functions.stats import moment_exprs, pop_kurtosis_sql, pop_skewness_sql

__all__ = ["moment_exprs", "pop_skewness_sql", "pop_kurtosis_sql"]
