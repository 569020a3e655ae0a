"""log_analysis_spark — a PySpark-native parse → enrich → route → aggregate
pipeline over multi-turn conversation/agent transcripts.

Built from scratch with the query capabilities of the reference log-analysis
toolchain (see SURVEY.md for the operator inventory with reference citations),
re-expressed Spark-first: DataFrame/SQL plans, broadcast enrich joins,
rule-driven multi-sink routing, window-stabilized turn ordering, and
vectorized Arrow-batched parse UDFs — no per-row Python anywhere.
"""

__version__ = "0.1.0"
