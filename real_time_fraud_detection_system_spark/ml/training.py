"""Training pipeline (M2-M7): assembler -> scaler -> logistic regression.

Reference parity (services/training/app/training.py):
  * StandardScaler fit on train, applied to train+test (lines 47-49)
    -> MLlib StandardScaler(withMean=True, withStd=True) inside ONE
    Pipeline, so scaling params always travel with the model (this also
    fixes the reference's signature-computed-with-refit-scaler bug at
    training.py:75 by construction).
  * LogisticRegression(max_iter=1000) (line 51) -> MLlib LogisticRegression.
  * ROC-AUC eval (line 53-55) -> BinaryClassificationEvaluator.
  * Registry promote-latest-to-Production (lines 100-110) -> versioned
    save dirs + a 'Production' pointer file (the intended semantics, not
    the reference's version-as-run-id bug at main.py:82).

Scale: MLlib LR trains via distributed L-BFGS over the assembled vector
column; nothing below collects the training frame to the driver.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.ml import Pipeline, PipelineModel
from pyspark.ml.classification import LogisticRegression
from pyspark.ml.evaluation import BinaryClassificationEvaluator
from pyspark.ml.feature import StandardScaler, VectorAssembler
from pyspark.sql import DataFrame

from ..sources.generators import FEATURE_ORDER

PRODUCTION_POINTER = "PRODUCTION"


def build_pipeline() -> Pipeline:
    assembler = VectorAssembler(
        inputCols=list(FEATURE_ORDER), outputCol="features_vec"
    )
    scaler = StandardScaler(
        inputCol="features_vec",
        outputCol="features_scaled",
        withMean=True,
        withStd=True,
    )
    lr = LogisticRegression(
        featuresCol="features_scaled",
        labelCol="label",
        maxIter=1000,
        probabilityCol="probability",
    )
    return Pipeline(stages=[assembler, scaler, lr])


def train(df: DataFrame, seed: int = 42) -> tuple[PipelineModel, float]:
    """Fit on a 75/25 split (training.py:45 uses stratified 0.25 test;
    randomSplit is the distributed equivalent at n >= 5000) and return
    (model, test AUC)."""
    train_df, test_df = df.randomSplit([0.75, 0.25], seed=seed)
    model = build_pipeline().fit(train_df)
    evaluator = BinaryClassificationEvaluator(
        labelCol="label",
        rawPredictionCol="rawPrediction",
        metricName="areaUnderROC",
    )
    auc = float(evaluator.evaluate(model.transform(test_df)))
    return model, auc


def save_version(model: PipelineModel, registry_dir: str, auc: float) -> int:
    """Save the model as the next version and return the version number."""
    os.makedirs(registry_dir, exist_ok=True)
    versions = [
        int(d[1:])
        for d in os.listdir(registry_dir)
        if d.startswith("v") and d[1:].isdigit()
    ]
    version = max(versions, default=0) + 1
    path = os.path.join(registry_dir, f"v{version}")
    model.write().overwrite().save(path)
    meta = {"version": version, "auc": auc, "created_at": time.time()}
    with open(os.path.join(registry_dir, f"v{version}.json"), "w") as f:
        json.dump(meta, f)
    return version


def promote_to_production(registry_dir: str, version: int) -> None:
    """Stage promotion: point 'Production' at a version (M7 intended
    semantics -- latest promoted wins, prior versions implicitly archived)."""
    with open(os.path.join(registry_dir, PRODUCTION_POINTER), "w") as f:
        f.write(str(version))


def load_production(spark, registry_dir: str) -> tuple[PipelineModel | None, str | None]:
    """S8: load the current Production model, or (None, None) when absent
    (callers then use the heuristic fallback -- main.py:100-104)."""
    pointer = os.path.join(registry_dir, PRODUCTION_POINTER)
    if not os.path.exists(pointer):
        return None, None
    with open(pointer) as f:
        version = f.read().strip()
    path = os.path.join(registry_dir, f"v{version}")
    if not os.path.isdir(path):
        return None, None
    return PipelineModel.load(path), version


def train_and_register(df: DataFrame, registry_dir: str, seed: int = 42) -> dict:
    """T9 'train_and_register' job: fit, eval, save, promote."""
    model, auc = train(df, seed=seed)
    version = save_version(model, registry_dir, auc)
    promote_to_production(registry_dir, version)
    return {"version": version, "auc": auc}
