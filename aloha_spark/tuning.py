"""Session tuning shared by every entry point.

One knob lives here so bench, the scaling evidence, the spark-submit
job, and tests derive it the same way instead of hardcoding a number
that is only right for one workload shape.
"""

from __future__ import annotations


def arrow_batch_rows(parallelism: int) -> int:
    """Arrow batch size (``spark.sql.execution.arrow.maxRecordsPerBatch``).

    Measured on the flagship featurize pipeline (fresh-JVM interleaved
    reps at widths 8 and 32, 2M and 16M turns):

    * The hard constraint is **batches per task**: the input lands in
      64 file partitions, so at 2M turns each task holds ~31k rows —
      a 30k batch means ONE batch per task, JVM production and Python
      consumption fully serialize, and the warm wall explodes ~5x
      (25-35s vs 4.2-5.3s).  At 16M turns (~250k rows/task) 30k
      batches pipeline fine and the 10k-vs-30k delta is inside the
      host's ±30% steal noise.
    * Within 4k-10k the warm 2M wall is flat (4.1-5.3s across widths);
      below 4k per-batch kernel/IPC overhead starts to show.

    So: a fixed 10k — the widest batch that still guarantees multiple
    batches per task at the small end of realistic partition sizes —
    is the robust choice at every measured (width, rows) cell.  The
    ``parallelism`` argument is kept so a future width-dependent rule
    slots in without touching call sites.
    """
    del parallelism
    return 10_000
