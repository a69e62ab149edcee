"""sparkml_som_spark — a PySpark-native analytics engine with the full
capability surface of FlorentF9/sparkml-som (distributed batch
Self-Organizing Map), plus the relational / LLM-data-pipeline operator
surface needed to run it as a standalone analytics stack at scale.

Layout:
    som/        SOM Estimator/Model (the reference's entire capability)
    operators/  relational + extension operators (dedup, similarity, text, asof)
    sources/    table registry / parquet loaders
    functions/  reusable column expression helpers
    streaming/  Structured Streaming windowed aggregations
    plans/      plan inspection helpers (explain/pushdown checks)
"""

from sparkml_som_spark.som import SOM, SOMModel, SOMTrainingSummary

__version__ = "0.1.0"

__all__ = ["SOM", "SOMModel", "SOMTrainingSummary", "__version__"]
