"""PySpark-native analytics engine with the query and data-processing
capabilities of the reference real-time fraud-detection system
(EbEmad/Real-Time-Fraud-Detection-System), re-expressed Spark-first.

Layout:
    session     -- SparkSession factory (AQE on, UTC, sized shuffle partitions)
    catalog     -- testdata table loading / temp-view registration
    schemas     -- StructTypes for the reference data model (SURVEY.md section 1)
    functions/  -- scalar/text/vector helpers built on pyspark.sql.functions
    operators/  -- relational, metrics, dedup, similarity, sessionize, multimodal
    sources/    -- synthetic generators, kafka/jdbc connector builders
    ml/         -- MLlib training pipeline + scoring (heuristic fallback)
    streaming/  -- structured-streaming pipelines (EP1 hot path)
    plans/      -- plan-inspection helpers (pushdown / broadcast assertions)
"""

__version__ = "0.1.0"
