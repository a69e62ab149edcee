"""Training summary record (reference: `SOMTrainingSummary.scala:5-18`)."""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame


@dataclass
class SOMTrainingSummary:
    predictions: DataFrame
    prediction_col: str
    features_col: str
    height: int
    width: int
    t_max: float
    t_min: float
    max_iter: int
    tol: float
    topology: str
    neighborhood_kernel: str
    temperature_decay: str
    training_cost: float
    objective_history: list[float] = field(default_factory=list)
    # rows the final training aggregation actually consumed (sum of
    # per-cell BMU counts) — a data-derived conservation anchor for
    # oracle checks; -1 when no iteration ran (maxIter=0)
    n_samples: int = -1

    @property
    def iterations(self) -> int:
        return len(self.objective_history)
