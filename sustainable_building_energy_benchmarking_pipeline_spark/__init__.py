"""PySpark-native analytics engine with the query and data-processing
capabilities of shahabsalehi/Sustainable-Building-Energy-Benchmarking-Pipeline.

Spark-first re-expression of the reference's capability surface (see
SURVEY.md): DataFrame/SQL plans over explicit schemas, Catalyst-optimized,
partition-aware for 100 TB scale. No RDDs, no hand-scheduling.

Subpackages
-----------
- ``sources``   — readers/writers (csv/parquet/json/jdbc), schema registry,
                  alias-coalescing column resolver, synthetic generators.
- ``functions`` — scalar/text/vector column-expression helpers (JVM-side).
- ``operators`` — window toolkit (rolling/lag/ffill/runs), aggregates
                  (weighted avg, grouping-sets summary, top-k), joins,
                  dedup (exact/minhash/simhash), similarity search.
- ``plans``     — end-to-end pipelines: benchmarking medallion, HVAC
                  feature ETL, anomaly detection, serving queries, export.
- ``ml``        — sklearn-in-mapInPandas IsolationForest integration.
- ``streaming`` — Structured Streaming variants (extension, SURVEY §7.8).
"""

from sustainable_building_energy_benchmarking_pipeline_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
