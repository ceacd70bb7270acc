"""res2df_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of equinor/res2df, re-expressed Spark-first.

Architecture (SURVEY.md §7.1): two layers.

* **Ingest layer** (``res2df_spark.sources``): the only code that knows
  file formats (Eclipse deck text, CSV, Parquet).  It produces schema'd
  DataFrames — ``deck_records``, ``summary_long``, ``grid_geometry`` … —
  with explicit index columns so no downstream code ever relies on row
  order (pandas row order is not a Spark concept).

* **Engine layer** (``res2df_spark.operators`` / ``functions`` / ``llm``):
  pure DataFrame/SQL transforms.  Every operator from SURVEY.md §2 is a
  composition of built-in pyspark.sql functions (JVM-side, codegen'd);
  Python UDFs appear only where sequential semantics force them
  (WLIST fold, deck parsing).

Nothing here is a translation of the reference implementation: the
reference (/root/reference, equinor/res2df) is single-node pandas; this
engine declares logical plans and lets Catalyst pick physical strategy.
"""

__version__ = "0.1.0"

from res2df_spark.session import get_spark  # noqa: F401
from res2df_spark.catalog import Catalog, TABLES  # noqa: F401
from res2df_spark.case import ResdataCase  # noqa: F401
