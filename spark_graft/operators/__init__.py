"""Operator implementations, one module per operator family.

Each declared operator is a @query-registered callable
(spark, sf_dir) -> DataFrame plus its DuckDB oracle SQL. See
spark_graft.registry and SURVEY.md §2b for the contract.
"""
