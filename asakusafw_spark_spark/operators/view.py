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
from datetime import datetime

from pyspark.sql import DataFrame
from pyspark.sql import types as T


def _arrow_normalizers(schema: T.StructType):
    """Per-column converters aligning Arrow ``to_pylist`` shapes with the
    classic ``Row.asDict(recursive=True)`` contract (recursively):

    - MapType: Arrow yields a list of (key, value) tuples → dict;
    - TimestampType: Arrow yields tz-aware UTC datetimes → naive local
      (what ``collect()`` returns).

    Returns ``{col: fn}`` for only the columns that need conversion, so
    a map/timestamp-free view pays nothing.  (Known benign residual:
    Arrow gives ``bytes`` where Rows give ``bytearray`` — equal under
    ``==`` and both buffer-protocol, so not converted.)
    """

    def conv(dt: T.DataType):
        if isinstance(dt, T.TimestampType):
            return lambda v: (
                v.astimezone().replace(tzinfo=None)
                if isinstance(v, datetime) and v.tzinfo is not None
                else v
            )
        if isinstance(dt, T.MapType):
            kf, vf = conv(dt.keyType), conv(dt.valueType)
            if kf is None and vf is None:
                return lambda v: dict(v) if v is not None else None
            kf = kf or (lambda x: x)
            vf = vf or (lambda x: x)
            return lambda v: (
                {kf(k): vf(x) for k, x in v} if v is not None else None
            )
        if isinstance(dt, T.ArrayType):
            ef = conv(dt.elementType)
            if ef is None:
                return None
            return lambda v: [ef(e) for e in v] if v is not None else None
        if isinstance(dt, T.StructType):
            fs = {f.name: conv(f.dataType) for f in dt.fields}
            fs = {n: f for n, f in fs.items() if f is not None}
            if not fs:
                return None
            return lambda v: (
                {n: (fs[n](x) if n in fs else x) for n, x in v.items()}
                if v is not None
                else None
            )
        return None

    out = {}
    for field in schema.fields:
        fn = conv(field.dataType)
        if fn is not None:
            out[field.name] = fn
    return out


def _normalize_dicts(dicts, normalizers):
    if not normalizers:
        yield from dicts
        return
    for d in dicts:
        for c, fn in normalizers.items():
            d[c] = fn(d[c])
        yield d


def group_view(
    df: DataFrame,
    key: Sequence[str],
    max_rows: int = 1_000_000,
    transfer: str = "arrow",
    distributed: bool = False,
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
    Two Arrow type shapes diverge from the classic Row contract and
    are normalized back (schema-driven, zero cost when absent):
    MapType values arrive as (key, value) tuple lists → dict, and
    timestamps arrive tz-aware UTC → naive local.  Residual: binary
    columns are ``bytes`` here vs ``bytearray`` under rows (equal
    under ``==``).  ``transfer="rows"`` keeps the classic collect.

    ``distributed=True`` builds the per-key dicts EXECUTOR-side
    (``mapInArrow`` partitions → pickled partial dicts → driver merges
    them one blob at a time via ``toLocalIterator``): the driver never
    holds the columnar batches or an un-grouped row list, only the
    final mapping plus one partition's partial at a time — for views
    near the cap this cuts driver peak memory roughly in half (see
    SCALING.md).  Same contract, same dict shapes (the executors run
    the same Arrow normalization), same ``max_rows`` guard.
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
    mapping: dict[tuple, list[dict]] = {}
    if distributed:
        import pickle

        import pyarrow as pa

        normalizers = _arrow_normalizers(df.schema)

        def build_partial(batches):
            part: dict[tuple, list[dict]] = {}
            for batch in batches:
                for d in _normalize_dicts(batch.to_pylist(), normalizers):
                    k = tuple(d[c] for c in keys)
                    part.setdefault(k, []).append(d)
            yield pa.RecordBatch.from_pylist(
                [{"blob": pickle.dumps(part)}],
                schema=pa.schema([("blob", pa.binary())]),
            )

        blobs = df.mapInArrow(build_partial, "blob binary")
        for row in blobs.toLocalIterator():
            for k, rows_ in pickle.loads(row.blob).items():
                mapping.setdefault(k, []).extend(rows_)
    else:
        if transfer == "arrow":
            rows = _normalize_dicts(
                df.toArrow().to_pylist(), _arrow_normalizers(df.schema)
            )
        else:
            rows = (r.asDict(recursive=True) for r in df.collect())
        for d in rows:
            k = tuple(d[c] for c in keys)
            mapping.setdefault(k, []).append(d)
    return df.sparkSession.sparkContext.broadcast(mapping)
