"""MLlib training + scoring: the reference's sklearn/MLflow surface
(training.py, fraud_service main.py) re-expressed as a native Spark
Pipeline with versioned model storage and a heuristic fallback scorer.
"""
