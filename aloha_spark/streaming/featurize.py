"""Streaming featurization: the batch FeaturePipeline applied to a
transcript stream.

Composition, not reimplementation: ``streaming_turn_features``
(applyInPandasWithState) attaches the stateful per-turn features, and
``foreachBatch`` runs the SAME compiled ``FeaturePipeline`` the batch
engine uses over each micro-batch — so streaming and backfill vectors
come from one spec and one kernel tier (no drift between the streaming
tail and the batch recompute; the reference's "models are messages"
property carries over: swap the spec JSON, same job).

At scale this is the streaming-tail architecture: the batch engine owns
history (exact recompute over bounded slices), this path owns freshness;
both write the same output schema, so a reader unions them.
"""

from __future__ import annotations

from typing import Callable, Optional

from pyspark.sql import DataFrame

from ..plans.pipeline import FeaturePipeline
from ..plans.spec import PipelineSpec
from .stateful import streaming_turn_features


def streaming_feature_vectors(
    stream: DataFrame,
    spec_json: dict,
    gap_seconds: float = 1800.0,
    keep_cols: Optional[list] = None,
):
    """Returns (featurized_stream_writer_fn, pipeline).

    ``featurized_stream_writer_fn(sink_fn)`` starts a foreachBatch query
    where ``sink_fn(batch_df, batch_id)`` receives each micro-batch
    already converted to hashed sparse vectors."""
    pipe = FeaturePipeline(PipelineSpec.from_json(spec_json))
    keep = keep_cols or ["conv_id", "turn_idx", "session_id"]
    feats = streaming_turn_features(stream, gap_seconds=gap_seconds)

    def start(sink_fn: Callable,
              checkpoint: Optional[str] = None,
              query_name: Optional[str] = None,
              trigger: Optional[dict] = None):
        """Start the foreachBatch query.  ``checkpoint`` is the
        checkpointLocation (REQUIRED for restartable production runs —
        without it every restart reprocesses the source); ``trigger``
        is the DataStreamWriter.trigger kwargs (default
        availableNow=True)."""
        def process(batch_df: DataFrame, batch_id: int) -> None:
            if batch_df.isEmpty():
                return
            sink_fn(pipe.to_sparse_vectors(batch_df, keep_cols=keep),
                    batch_id)

        w = feats.writeStream.foreachBatch(process).outputMode("append")
        if checkpoint is not None:
            w = w.option("checkpointLocation", checkpoint)
        if query_name is not None:
            w = w.queryName(query_name)
        return w.trigger(**(trigger or {"availableNow": True})).start()

    return start, pipe
