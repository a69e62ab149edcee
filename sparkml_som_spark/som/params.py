"""Hyper-parameter surface of the SOM estimator/model.

Mirrors the param set + validators of the reference
(`SOMParams.scala:24-99,109,167`; defaults `SOM.scala:40-49`), expressed
as pyspark.ml Params so the estimator composes with ``pyspark.ml.Pipeline``.
"""

from __future__ import annotations

from pyspark.ml.param import Param, Params, TypeConverters
from pyspark.ml.param.shared import (
    HasFeaturesCol,
    HasMaxIter,
    HasPredictionCol,
    HasSeed,
    HasTol,
)

from sparkml_som_spark.som.kernel import VALID_DECAYS, VALID_KERNELS, VALID_TOPOLOGIES


class SOMParams(HasFeaturesCol, HasPredictionCol, HasMaxIter, HasSeed, HasTol):
    """Shared params for SOM and SOMModel."""

    height = Param(
        Params._dummy(),
        "height",
        "height of the SOM grid (> 0)",
        typeConverter=TypeConverters.toInt,
    )
    width = Param(
        Params._dummy(),
        "width",
        "width of the SOM grid (> 0)",
        typeConverter=TypeConverters.toInt,
    )
    tMax = Param(
        Params._dummy(),
        "tMax",
        "initial neighborhood temperature (> 0)",
        typeConverter=TypeConverters.toFloat,
    )
    tMin = Param(
        Params._dummy(),
        "tMin",
        "final neighborhood temperature (> 0)",
        typeConverter=TypeConverters.toFloat,
    )
    topology = Param(
        Params._dummy(),
        "topology",
        f"topology of the map grid, one of {VALID_TOPOLOGIES}",
        typeConverter=TypeConverters.toString,
    )
    neighborhoodKernel = Param(
        Params._dummy(),
        "neighborhoodKernel",
        f"neighborhood kernel, one of {VALID_KERNELS}",
        typeConverter=TypeConverters.toString,
    )
    temperatureDecay = Param(
        Params._dummy(),
        "temperatureDecay",
        f"temperature decay schedule, one of {VALID_DECAYS}",
        typeConverter=TypeConverters.toString,
    )
    distanceCol = Param(
        Params._dummy(),
        "distanceCol",
        "optional output column for the squared distance to the BMU "
        "(extension over the reference; empty string disables)",
        typeConverter=TypeConverters.toString,
    )

    def __init__(self) -> None:
        super().__init__()
        # Defaults mirror `SOM.scala:40-49` (maxIter=20, tol=1e-4 there too).
        self._setDefault(
            height=10,
            width=10,
            tMax=10.0,
            tMin=1.0,
            maxIter=20,
            tol=1e-4,
            topology="rectangular",
            neighborhoodKernel="gaussian",
            temperatureDecay="exponential",
            featuresCol="features",
            predictionCol="prediction",
            distanceCol="",
            seed=1234,  # reference derives a hash-based default; we pin a stable one
        )

    # --- getters (setters live on the estimator/model) ---
    def getHeight(self) -> int:
        return self.getOrDefault(self.height)

    def getWidth(self) -> int:
        return self.getOrDefault(self.width)

    def getTMax(self) -> float:
        return self.getOrDefault(self.tMax)

    def getTMin(self) -> float:
        return self.getOrDefault(self.tMin)

    def getTopology(self) -> str:
        return self.getOrDefault(self.topology)

    def getNeighborhoodKernel(self) -> str:
        return self.getOrDefault(self.neighborhoodKernel)

    def getTemperatureDecay(self) -> str:
        return self.getOrDefault(self.temperatureDecay)

    def getDistanceCol(self) -> str:
        return self.getOrDefault(self.distanceCol)

    def _validate(self) -> None:
        """Range/enum guards (reference: ParamValidators at SOMParams.scala:30-88)."""
        if self.getHeight() <= 0 or self.getWidth() <= 0:
            raise ValueError("height and width must be > 0")
        if self.getTMax() <= 0 or self.getTMin() <= 0:
            raise ValueError("tMax and tMin must be > 0")
        if self.getTMin() > self.getTMax():
            raise ValueError("tMin must be <= tMax")
        if self.getOrDefault(self.maxIter) <= 0:
            raise ValueError("maxIter must be > 0")
        if self.getOrDefault(self.tol) < 0:
            raise ValueError("tol must be >= 0")
        if self.getTopology() not in VALID_TOPOLOGIES:
            raise ValueError(f"topology must be one of {VALID_TOPOLOGIES}")
        if self.getNeighborhoodKernel() not in VALID_KERNELS:
            raise ValueError(f"neighborhoodKernel must be one of {VALID_KERNELS}")
        if self.getTemperatureDecay() not in VALID_DECAYS:
            raise ValueError(f"temperatureDecay must be one of {VALID_DECAYS}")
