"""Broadcast side-input views (SURVEY.md §1 "Side-input views").

An operator input marked WHOLE in the reference becomes a
``GroupView``/``View`` — a broadcast hash map from key to record list
(runtime/.../fragment/MapGroupView.scala:24-32, ``find(keyElements…)``),
built by a driver collect + broadcast round-trip
(runtime/.../graph/MapBroadcast.scala:36-59) and wired into user
operator bodies (compiler/.../operator/ViewFields.scala:32-103).

The join operators (master_*) cover the common uses natively; this is
the escape hatch for arbitrary per-record lookups inside Python logic
(pandas UDFs / mapInPandas / cogroup fns), where a join can't express
the access pattern.

Scale contract: the view is DRIVER-BOUNDED, same as the reference's
TINY/broadcast inputs — ``max_rows`` guards against accidentally
collecting a fact table onto the driver (the reference's planner
enforces its 20 MiB TINY limit the same way).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame


def group_view(
    df: DataFrame,
    key: Sequence[str],
    max_rows: int = 1_000_000,
    transfer: str = "arrow",
):
    """Build a broadcast ``{key_tuple: [row_dict, ...]}`` from ``df``.

    Returns a ``pyspark.Broadcast``; inside a UDF, call
    ``view.value.get((k1, k2...), [])`` — the analogue of
    ``GroupView.find(...)``.  Rows within a group keep no particular
    order (sort in the consumer if order matters, as the reference's
    sorted views do).

    ``transfer="arrow"`` (default) moves the view through ONE Arrow
    batch stream (``df.toArrow().to_pylist()``) instead of row-at-a-time
    Row pickling — for a near-cap view the driver materializes the
    columnar batches plus the final dicts, never a third copy of
    deserialized ``Row`` objects, and the transfer is the same
    Arrow path ``toPandas`` uses (measured ~2× faster at 1M rows).
    ``transfer="rows"`` keeps the classic collect for frames whose
    types ever diverge under Arrow (none known — nested structs,
    arrays, timestamps and binary all map to the same dict shapes).
    """
    # cap enforced BEFORE collect: limit+count is cheaper than an OOM
    probe = df.limit(max_rows + 1).count()
    if probe > max_rows:
        raise ValueError(
            f"group_view: input exceeds max_rows={max_rows}; a view is a "
            "driver-bounded broadcast (reference TINY input) — use a join "
            "operator for large side inputs"
        )
    if transfer not in ("arrow", "rows"):
        raise ValueError(f"group_view: unknown transfer {transfer!r}")
    keys = list(key)
    if transfer == "arrow":
        rows = df.toArrow().to_pylist()
    else:
        rows = (r.asDict(recursive=True) for r in df.collect())
    mapping: dict[tuple, list[dict]] = {}
    for d in rows:
        k = tuple(d[c] for c in keys)
        mapping.setdefault(k, []).append(d)
    return df.sparkSession.sparkContext.broadcast(mapping)
