"""userportrait — a PySpark-native analytics engine with the query surface of
BigDataScholar/User-Portrait, rebuilt Spark-first.

The reference (mounted read-only at /root/reference/) was EMPTY at survey time
(SURVEY.md §0), so no reference file:line citations are possible; docstrings
cite SURVEY.md sections instead, which reconstruct the reference's public
surface (match/statistical/mining tag models over user+order+event data).

Architecture (SURVEY.md §3.2):
  - ``session``   : SparkSession conventions (nanos parquet conf, AQE, UTC).
  - ``catalog``   : explicit schemas for the ten driver tables, ``load()`` with
                    the ns->us timestamp fix applied once at the source
                    boundary, temp-view registration.
  - ``registry``  : the op contract — every SURVEY §2 op id registers a
                    ``(spark, sf_dir) -> DataFrame`` callable plus (when the
                    semantics are SQL-expressible) a DuckDB oracle SQL string.
  - ``ops/*``     : the operator implementations, one module per SURVEY §2
                    subsection. Pure DataFrame/SQL; pandas UDFs only where the
                    built-ins cannot express the semantics (SURVEY §4).
"""

__version__ = "0.2.0"
