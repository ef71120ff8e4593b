"""Query catalog: every SURVEY.md §2 operator as a named
(spark, sf_dir) -> DataFrame plan with a DuckDB oracle."""
