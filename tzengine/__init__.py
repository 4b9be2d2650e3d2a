"""tzengine — a from-scratch PySpark-native spatial-join + tiling engine.

Reproduces the query semantics of the reference timezone point-in-polygon
library (dustin-johnson/timezonemap, studied at /root/reference) as a
distributed broadcast-index join over Parquet/Iceberg-style tables of
geotagged image+caption rows, with deterministic tiling, resumable runs,
and vectorized Arrow/pandas probe kernels.
"""

__version__ = "0.1.0"

# Engine version gate for index artifacts, mirroring the reference's
# "<libver>:<mapver>" archive version marker (TimeZoneMap.kt:171-182).
INDEX_FORMAT_VERSION = "1"
