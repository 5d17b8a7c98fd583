"""Flat convenience API — the operator surface in one import.

>>> from pyhydroqc_spark import api as hq
>>> qc = hq.interpolate(hq.persistence(hq.range_check(df, 13, -2), 30))
"""

from .ingest import (  # noqa: F401
    collapse_to_tokens,
    explode_tokens,
    repartition_series,
    tokenize_long_table,
)
from .operators.calibration import (  # noqa: F401
    drift_correct,
    edge_candidates,
    edge_filter,
    find_gaps,
    lin_drift_ramp,
    overlap,
    persist_candidates,
)
from .operators.correct import correct_series, crossfade, generate_corrections  # noqa: F401
from .operators.detect import (  # noqa: F401
    arima_detect,
    arima_residuals,
    arima_residuals_sql,
)
from .operators.events import (  # noqa: F401
    anomaly_events,
    group_bools,
    run_ids,
    run_lengths,
    widen_flags,
)
from .operators.metrics import (  # noqa: F401
    aggregate_results,
    compare_events,
    event_metrics,
    point_metrics,
)
from .operators.rollup import (  # noqa: F401
    rollup_all_tiers,
    rollup_from_rollup,
    rollup_points,
)
from .operators.rules import (  # noqa: F401
    add_labels,
    anomaly_count,
    group_size,
    interpolate,
    mask_anomalies,
    persistence,
    range_check,
)
from .operators.threshold import (  # noqa: F401
    constant_threshold,
    constant_threshold_anomalies,
    detect_threshold_anomalies,
    dynamic_threshold,
)
from .params import CalibParams, SeriesParams, params_dim  # noqa: F401
from .pipeline import retention_sweep, run_pipeline  # noqa: F401
from .session import get_spark  # noqa: F401
from .sources import load_calib_dates, load_sensor_csv, write_table  # noqa: F401
from .tables import SnapshotTable  # noqa: F401
