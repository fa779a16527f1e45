"""Fixed-schema record model.

The reference's unit of data is a flat, fixed-schema, all-nullable record
(``DataModel`` beans of ``*Option`` fields — runtime/.../serializer/
KryoRegistrator.scala:42-52 lists the closed value-type set).  Our engine
models a record type as a Spark ``StructType`` with every field nullable,
held in a :class:`SchemaRegistry` so flows are schema-checked up front the
way the reference compiler checks ``DataModel`` classes at compile time.

Type mapping (SURVEY.md §1):

==============  =======================
reference       Spark
==============  =======================
BooleanOption   BooleanType
ByteOption      ByteType
ShortOption     ShortType
IntOption       IntegerType
LongOption      LongType
FloatOption     FloatType
DoubleOption    DoubleType
DecimalOption   DecimalType(38, 18) by default
StringOption    StringType
DateOption      DateType
DateTimeOption  TimestampType (sub-second truncated at the I/O boundary)
==============  =======================
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import types as T

#: The closed scalar-type vocabulary of the reference
#: (runtime/.../serializer/KryoRegistrator.scala:42-52).
OPTION_TYPES: dict[str, T.DataType] = {
    "boolean": T.BooleanType(),
    "byte": T.ByteType(),
    "short": T.ShortType(),
    "int": T.IntegerType(),
    "long": T.LongType(),
    "float": T.FloatType(),
    "double": T.DoubleType(),
    "decimal": T.DecimalType(38, 18),
    "string": T.StringType(),
    "date": T.DateType(),
    "datetime": T.TimestampType(),
    # Engine extensions beyond the reference's closed set (SURVEY.md §2.8):
    "binary": T.BinaryType(),
    "float_array": T.ArrayType(T.FloatType()),
}


def record_type(fields: dict[str, T.DataType | str]) -> T.StructType:
    """Build an all-nullable flat record StructType.

    ``fields`` maps column name to a Spark DataType or one of the
    :data:`OPTION_TYPES` shorthand names.
    """
    out = []
    for name, dt in fields.items():
        if isinstance(dt, str):
            dt = OPTION_TYPES[dt]
        out.append(T.StructField(name, dt, nullable=True))
    return T.StructType(out)


@dataclass
class SchemaRegistry:
    """Named record types, the analogue of the reference's compiled
    ``DataModel`` class space (compiler/.../DataModelLoaderProvider.scala)."""

    types: dict[str, T.StructType] = field(default_factory=dict)

    def register(self, name: str, schema: T.StructType | dict) -> T.StructType:
        if isinstance(schema, dict):
            schema = record_type(schema)
        self.types[name] = schema
        return schema

    def __getitem__(self, name: str) -> T.StructType:
        return self.types[name]

    def __contains__(self, name: str) -> bool:
        return name in self.types
