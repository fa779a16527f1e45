"""Output path-pattern grammar (SURVEY.md §2.5 DirectOutputPrepare Group).

The reference generates one output file path PER RECORD from a fragment
sequence — constant / natural ``{prop}`` / formatted number
``{prop:0000}`` / date ``{prop:yyyy-MM-dd}`` / datetime / random bucket
``[m..n]`` — then shuffles records by generated path and streams each
distinct path to its own file (runtime/.../directio/
OutputPatternGenerator.scala:25-197, DirectOutputPrepare.scala:201-258).

Our engine compiles the same pattern grammar to a native Spark ``Column``
(no UDF): constants fold, ``date_format`` handles date/datetime formats,
``format_string``/``lpad`` handle zero-padded numbers, and ``[m..n]``
lowers to a seeded ``rand``.  Pattern text:

    "sales/{o_orderdate:yyyy-MM}/part-[0..3].csv"

Flat (non-grouped) patterns may use ``*`` = Spark task/attempt id —
i.e. ordinary part-file naming, handled by the writer, not here.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, functions as F, types as T

_TOKEN = re.compile(r"\{([^}:]+)(?::([^}]+))?\}|\[(\d+)\.\.(\d+)\]")

_DATE_TYPES = (T.DateType, T.TimestampType, T.TimestampNTZType)
_INT_TYPES = (T.ByteType, T.ShortType, T.IntegerType, T.LongType)


@dataclass
class OutputPattern:
    """A parsed output path pattern bound at :meth:`column` time."""

    pattern: str
    seed: int = 42

    def column(self, df: DataFrame) -> Column:
        """Compile the pattern to a string Column over ``df``."""
        parts: list[Column] = []
        pos = 0
        rnd_index = 0
        dtypes = {f.name: f.dataType for f in df.schema.fields}
        for m in _TOKEN.finditer(self.pattern):
            if m.start() > pos:
                parts.append(F.lit(self.pattern[pos : m.start()]))
            pos = m.end()
            if m.group(3) is not None:  # [m..n] random bucket
                lo, hi = int(m.group(3)), int(m.group(4))
                if lo > hi:
                    raise ValueError(f"random bucket [{lo}..{hi}]: min > max")
                parts.append(
                    F.floor(F.rand(self.seed + rnd_index) * (hi - lo + 1) + lo).cast("string")
                )
                rnd_index += 1
                continue
            prop, fmt = m.group(1), m.group(2)
            if prop not in dtypes:
                raise ValueError(f"pattern property {prop!r} not in schema")
            col, dt = F.col(prop), dtypes[prop]
            if fmt is None:
                parts.append(col.cast("string"))
            elif isinstance(dt, _DATE_TYPES):
                parts.append(F.date_format(col, _java_date_format(fmt)))
            elif isinstance(dt, _INT_TYPES) or isinstance(
                dt, (T.FloatType, T.DoubleType, T.DecimalType)
            ):
                parts.append(_number_format(col, fmt))
            else:
                raise ValueError(f"format {fmt!r} unsupported for {dt.simpleString()}")
        if pos < len(self.pattern):
            parts.append(F.lit(self.pattern[pos:]))
        return F.concat(*parts) if parts else F.lit("")


def _java_date_format(fmt: str) -> str:
    """SimpleDateFormat → Spark datetime pattern (shared subset is
    identical: yyyy MM dd HH mm ss DDD EEE; reject unsupported)."""
    if re.search(r"[^yMdHmsSDE\-/_.: ']", fmt):
        raise ValueError(f"unsupported date format {fmt!r}")
    return fmt


def _number_format(col: Column, fmt: str) -> Column:
    """java.text.DecimalFormat subset → native expression.

    ``0``-runs → zero-padded integer (``0000`` → lpad 4); ``#`` → plain;
    ``0.00`` style → format_string with fixed decimals.
    """
    if re.fullmatch(r"0+", fmt):
        return F.format_string(f"%0{len(fmt)}d", col.cast("long"))
    if re.fullmatch(r"#+", fmt):
        return col.cast("long").cast("string")
    m = re.fullmatch(r"(0+)\.(0+)", fmt)
    if m:
        whole, frac = len(m.group(1)), len(m.group(2))
        return F.format_string(f"%0{whole + frac + 1}.{frac}f", col.cast("double"))
    raise ValueError(f"unsupported number format {fmt!r}")
