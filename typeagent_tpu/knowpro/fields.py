"""Pydantic dataclass shim with automatic camelCase JSON aliases.

All persisted objects serialize camelCase for format parity with the
reference's files/DB (its per-field ``CamelCaseField`` helper,
`knowpro/field_helpers.py:11-85`). Here aliases come from a config-level
alias generator instead of per-field plumbing.
"""

from __future__ import annotations

from typing import Any, TypeVar, dataclass_transform

import pydantic
import pydantic.dataclasses
from pydantic import ConfigDict, Field
from pydantic.alias_generators import to_camel

T = TypeVar("T")

CAMEL_CONFIG = ConfigDict(
    alias_generator=to_camel,
    populate_by_name=True,
    validate_by_name=True,
    validate_by_alias=True,
)


@dataclass_transform(field_specifiers=(Field, pydantic.fields.FieldInfo))
def dataclass(cls: type | None = None, /, **kwargs: Any) -> Any:
    """A pydantic dataclass that (de)serializes with camelCase aliases."""

    def wrap(c):
        return pydantic.dataclasses.dataclass(c, config=CAMEL_CONFIG, **kwargs)

    if cls is None:
        return wrap
    return wrap(cls)


def serialize_object(obj: Any, *, exclude_none: bool = True) -> Any:
    """Serialize a pydantic dataclass to plain camelCase data."""
    return obj.__pydantic_serializer__.to_python(
        obj, by_alias=True, exclude_none=exclude_none
    )


def deserialize_object(cls: type[T], data: Any) -> T:
    """Validate plain camelCase data into a pydantic dataclass."""
    return cls.__pydantic_validator__.validate_python(data)
