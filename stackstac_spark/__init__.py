"""stackstac_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of gjoseph92/stackstac.

The reference (https://github.com/gjoseph92/stackstac) turns STAC item
metadata into a lazy, chunked 4-D ``(time, band, y, x)`` array and exposes an
xarray/dask query surface on top (filters, band select, temporal resample,
mosaic composites, NDVI arithmetic, map-tile rendering).

This engine re-expresses that model Spark-first:

- catalog / coordinates are plain DataFrames (``sources.stac``),
- the prepared IR is a sparse ``asset_table`` DataFrame + a broadcastable
  ``RasterSpec`` (``prepare``),
- the dask chunk grid becomes a generated ``tile_grid`` DataFrame joined to
  the asset table with an overlap predicate Catalyst can prune
  (``grid``),
- the leaf raster scan is an Arrow-batched ``mapInPandas`` UDF
  (``sources.raster``), with a deterministic fake-reader mode for tests,
- array compute (mosaic, resample, NDVI, percentiles) are DataFrame
  aggregations (``operators``),
- plus the large-scale training-data operators the reference never had:
  dedup (exact / minhash-LSH / simhash / n-gram Jaccard), similarity search,
  text analysis, multimodal binary columns.

Everything is designed for a 1000-executor cluster: sparse representations,
broadcast small sides, partial aggregation, predicate pushdown; tested on
``local[*]``.
"""

from stackstac_spark.raster_spec import RasterSpec
from stackstac_spark.session import get_spark
from stackstac_spark.sources.stac_api import search_items
from stackstac_spark.stack import RasterStack, stack

__version__ = "0.1.0"

__all__ = [
    "RasterSpec",
    "RasterStack",
    "get_spark",
    "search_items",
    "stack",
    "__version__",
]
