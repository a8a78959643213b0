from pedri_analysis_spark.plans.registry import all_oracle_sql, all_queries

__all__ = ["all_queries", "all_oracle_sql"]
