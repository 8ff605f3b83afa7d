"""SQLite storage backend (device-resident embeddings, BLOB write-through)."""

from .collections import SqliteMessageCollection, SqliteSemanticRefCollection
from .indexes import (
    SqlitePropertyIndex,
    SqliteTermToSemanticRefIndex,
    SqliteTimestampToTextRangeIndex,
)
from .messageindex import SqliteMessageTextIndex
from .provider import SqliteStorageProvider
from .reltermsindex import (
    SqliteRelatedTermsAliases,
    SqliteRelatedTermsFuzzy,
    SqliteRelatedTermsIndex,
)

__all__ = [
    "SqliteMessageCollection",
    "SqliteMessageTextIndex",
    "SqlitePropertyIndex",
    "SqliteRelatedTermsAliases",
    "SqliteRelatedTermsFuzzy",
    "SqliteRelatedTermsIndex",
    "SqliteSemanticRefCollection",
    "SqliteStorageProvider",
    "SqliteTermToSemanticRefIndex",
    "SqliteTimestampToTextRangeIndex",
]
