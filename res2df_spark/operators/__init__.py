"""Engine-layer operators: pure DataFrame transforms implementing the
operator inventory of SURVEY.md §2.  No file-format knowledge here."""

from res2df_spark.operators.windows import (  # noqa: F401
    ffill,
    dedup_keep,
    repair_duplicate_timestamps,
    status_changes,
)
from res2df_spark.operators.asof import asof_join  # noqa: F401
from res2df_spark.operators.reshape import (  # noqa: F401
    unroll_range,
    box_explode,
    melt,
)
from res2df_spark.operators.interpolate import interpolate_linear  # noqa: F401
from res2df_spark.operators.resample import date_spine, resample_asof  # noqa: F401
from res2df_spark.operators.sessionize import sessionize, session_stats  # noqa: F401
from res2df_spark.operators.eventanalytics import (  # noqa: F401
    rolling_agg,
    funnel_steps,
    funnel_counts,
    retention_cohorts,
)
