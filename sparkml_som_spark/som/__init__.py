from sparkml_som_spark.som.estimator import SOM, SOMModel
from sparkml_som_spark.som.summary import SOMTrainingSummary

__all__ = ["SOM", "SOMModel", "SOMTrainingSummary"]
