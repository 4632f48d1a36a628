"""Custom stateful streaming operator: incremental stay-point collapse.

Keeps the last emitted cell id per trajectory key in state and emits only
points whose cell differs from it — the streaming twin of
staypoints.collapse_consecutive_cells (merc2cell2 semantics,
/root/reference/fedtraj/utils/traj.py:118-123), via
applyInPandasWithState. Within a micro-batch rows are processed in
(ts_ms, point_id) order; across batches the state carries the last cell.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "traj_id string, point_id long, ts_ms long, cell_id long"
STATE_SCHEMA = "last_cell long"


def _collapse(
    key: tuple,
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    last_cell = state.get[0] if state.exists else None
    out = []
    for pdf in pdfs:
        pdf = pdf.sort_values(["ts_ms", "point_id"], kind="mergesort")
        for row in pdf.itertuples(index=False):
            if last_cell is None or row.cell_id != last_cell:
                out.append((key[0], row.point_id, row.ts_ms, row.cell_id))
                last_cell = int(row.cell_id)
    if last_cell is not None:
        state.update((int(last_cell),))
    yield pd.DataFrame(out, columns=["traj_id", "point_id", "ts_ms", "cell_id"])


def streaming_stay_collapse(points_stream: DataFrame) -> DataFrame:
    """points_stream: streaming DataFrame with
    (traj_id, point_id, ts_ms, cell_id). Returns the collapsed stream."""
    return (
        points_stream.select("traj_id", "point_id", "ts_ms", "cell_id")
        .groupBy("traj_id")
        .applyInPandasWithState(
            _collapse,
            OUTPUT_SCHEMA,
            STATE_SCHEMA,
            "append",
            GroupStateTimeout.NoTimeout,
        )
    )
