"""Public Hypothesis strategies for fuzzing code built on stackstac_spark —
the reference's ``stackstac.testing`` module (testing/strategies.py),
adapted to this engine's parameter space."""

from stackstac_spark.testing.strategies import (  # noqa: F401
    chunksizes,
    raster_dtypes,
    simple_bboxes,
)

__all__ = ["simple_bboxes", "raster_dtypes", "chunksizes"]
