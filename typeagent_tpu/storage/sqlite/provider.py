"""SQLite storage provider: WAL + manual BEGIN IMMEDIATE transactions.

(Parity: reference storage/sqlite/provider.py — PRAGMAs, embedding-model
consistency checks against stored metadata, embedding-size cross-table check,
metadata key-value table, ingestion + chunk-failure tracking. Conversation
threads reuse the memory implementation, as in the reference.)
"""

from __future__ import annotations

import sqlite3
from datetime import datetime, timezone

from ...knowpro import interfaces
from ...knowpro.convsettings import MessageTextIndexSettings, RelatedTermIndexSettings
from ...knowpro.interfaces import (
    STATUS_INGESTED,
    ChunkFailure,
    ConversationMetadata,
)
from ...knowpro.universal_message import format_timestamp_utc
from ...vectorstore import TextEmbeddingIndexSettings
from ..memory.indexes import ConversationThreads
from .collections import SqliteMessageCollection, SqliteSemanticRefCollection
from .indexes import (
    SqlitePropertyIndex,
    SqliteTermToSemanticRefIndex,
    SqliteTimestampToTextRangeIndex,
)
from .messageindex import SqliteMessageTextIndex
from .reltermsindex import SqliteRelatedTermsIndex
from .schema import (
    CONVERSATION_SCHEMA_VERSION,
    deserialize_embedding,
    get_db_schema_version,
    init_db_schema,
    set_conversation_metadata,
)


class SqliteStorageProvider[TMessage: interfaces.IMessage](
    interfaces.IStorageProvider[TMessage]
):
    """SQLite-backed provider with consistency checks at open."""

    def __init__(
        self,
        db_path: str = ":memory:",
        message_type: type[TMessage] = None,  # type: ignore[assignment]
        semantic_ref_type: type[interfaces.SemanticRef] = None,  # type: ignore[assignment]
        message_text_index_settings: MessageTextIndexSettings | None = None,
        related_term_index_settings: RelatedTermIndexSettings | None = None,
        metadata: ConversationMetadata | None = None,
    ):
        self.db_path = db_path
        self.message_type = message_type
        self.semantic_ref_type = semantic_ref_type
        self._metadata = metadata

        # isolation_level=None => manual BEGIN/COMMIT control.
        self.db = sqlite3.connect(db_path, isolation_level=None)
        self.db.execute("PRAGMA foreign_keys = ON")
        self.db.execute("PRAGMA synchronous = NORMAL")
        self.db.execute("PRAGMA journal_mode = WAL")
        self.db.execute("PRAGMA cache_size = -64000")  # 64MB
        self.db.execute("PRAGMA temp_store = MEMORY")
        self.db.execute("PRAGMA mmap_size = 268435456")  # 256MB

        init_db_schema(self.db)

        self.message_text_index_settings, self.related_term_index_settings = (
            self._resolve_embedding_settings(
                message_text_index_settings, related_term_index_settings
            )
        )
        self._check_embedding_consistency()

        self._message_collection = SqliteMessageCollection(self.db, self.message_type)
        self._semantic_ref_collection = SqliteSemanticRefCollection(self.db)
        self._semref_index = SqliteTermToSemanticRefIndex(self.db)
        self._property_index = SqlitePropertyIndex(self.db)
        self._timestamp_index = SqliteTimestampToTextRangeIndex(self.db)
        self._message_text_index = SqliteMessageTextIndex(
            self.db, self.message_text_index_settings, self._message_collection
        )
        self._related_terms_index = SqliteRelatedTermsIndex(
            self.db, self.related_term_index_settings.embedding_index_settings
        )
        self._conversation_threads = ConversationThreads(
            self.message_text_index_settings.embedding_index_settings
        )
        self._message_collection.set_message_text_index(self._message_text_index)

    # -- settings/consistency checks -----------------------------------------

    def _metadata_value(self, key: str) -> str | None:
        cursor = self.db.cursor()
        cursor.execute("SELECT value FROM ConversationMetadata WHERE key = ?", (key,))
        rows = cursor.fetchall()
        return rows[0][0] if rows else None

    def _metadata_exists(self) -> bool:
        cursor = self.db.cursor()
        cursor.execute("SELECT 1 FROM ConversationMetadata LIMIT 1")
        return cursor.fetchone() is not None

    def _resolve_embedding_settings(
        self,
        provided_message_settings: MessageTextIndexSettings | None,
        provided_related_settings: RelatedTermIndexSettings | None,
    ) -> tuple[MessageTextIndexSettings, RelatedTermIndexSettings]:
        """The stored embedding_name metadata must match the configured model."""
        metadata_exists = self._metadata_exists()
        stored_name = self._metadata_value("embedding_name")

        if provided_message_settings is None:
            if stored_name is not None:
                from ...models.adapters import create_embedding_model

                spec = stored_name
                if spec and ":" not in spec:
                    spec = f"openai:{spec}"
                base = TextEmbeddingIndexSettings(
                    embedding_model=create_embedding_model(spec)
                )
            else:
                base = TextEmbeddingIndexSettings()
            message_settings = MessageTextIndexSettings(base)
        else:
            message_settings = provided_message_settings
            base = message_settings.embedding_index_settings
            provided_name = base.embedding_model.model_name
            if stored_name is not None and stored_name != provided_name:
                raise ValueError(
                    f"Conversation metadata embedding_model ({stored_name}) does "
                    f"not match provided embedding model ({provided_name})."
                )

        if provided_related_settings is None:
            related_settings = RelatedTermIndexSettings(base)
        else:
            related_settings = provided_related_settings
            related_name = (
                related_settings.embedding_index_settings.embedding_model.model_name
            )
            if related_name != base.embedding_model.model_name:
                raise ValueError(
                    "Related term index embedding_model does not match message "
                    "text index embedding_model"
                )

        actual_name = base.embedding_model.model_name
        if self._metadata is not None:
            if self._metadata.embedding_model is None:
                self._metadata.embedding_model = actual_name
            elif self._metadata.embedding_model != actual_name:
                raise ValueError(
                    "Conversation metadata embedding_model does not match provider settings"
                )

        if metadata_exists and stored_name is None:
            set_conversation_metadata(self.db, embedding_name=actual_name)

        return message_settings, related_settings

    def _check_embedding_consistency(self) -> None:
        """Stored embedding sizes must agree across tables."""
        cursor = self.db.cursor()
        message_size: int | None = None
        cursor.execute("SELECT embedding FROM MessageTextIndex LIMIT 1")
        row = cursor.fetchone()
        if row and row[0]:
            message_size = len(deserialize_embedding(row[0]))
        related_size: int | None = None
        cursor.execute("SELECT term_embedding FROM RelatedTermsFuzzy LIMIT 1")
        row = cursor.fetchone()
        if row and row[0]:
            related_size = len(deserialize_embedding(row[0]))
        if (
            message_size is not None
            and related_size is not None
            and message_size != related_size
        ):
            raise ValueError(
                f"Embedding size mismatch: message text index has size "
                f"{message_size}, but related terms index has size "
                f"{related_size}. The database may be corrupted."
            )

    def _init_conversation_metadata_if_needed(self) -> None:
        """First write transaction seeds the metadata table (no own commit)."""
        cursor = self.db.cursor()
        cursor.execute("SELECT 1 FROM ConversationMetadata LIMIT 1")
        if cursor.fetchone() is not None:
            return
        current_time = datetime.now(timezone.utc)
        if self._metadata:
            name_tag = self._metadata.name_tag or "conversation"
            tags = self._metadata.tags
            extras = self._metadata.extra or {}
        else:
            name_tag = "conversation"
            tags = None
            extras = {}
        actual_name = (
            self.message_text_index_settings.embedding_index_settings.embedding_model.model_name
        )
        embedding_name = (
            self._metadata.embedding_model
            if self._metadata and self._metadata.embedding_model is not None
            else actual_name
        )
        extras = {
            k: v
            for k, v in extras.items()
            if k not in {"embedding_size", "embedding_name"}
        }
        set_conversation_metadata(
            self.db,
            name_tag=name_tag,
            schema_version=str(get_db_schema_version(self.db)),
            created_at=format_timestamp_utc(current_time),
            updated_at=format_timestamp_utc(current_time),
            tag=tags,
            embedding_name=embedding_name,
            **extras,
        )

    # -- transactions -----------------------------------------------------------

    async def __aenter__(self) -> "SqliteStorageProvider[TMessage]":
        if self.db.in_transaction:
            raise RuntimeError(
                "Cannot start a new transaction: a transaction is already in "
                "progress (nested 'async with storage:', an uncommitted prior "
                "transaction, or an inconsistent database state)."
            )
        self.db.execute("BEGIN IMMEDIATE")
        self._init_conversation_metadata_if_needed()
        return self

    async def __aexit__(self, exc_type, exc_val, exc_tb) -> None:
        if exc_type is None:
            self.db.commit()
        else:
            self.db.rollback()

    async def close(self) -> None:
        """Close (COMMITS first)."""
        if hasattr(self, "db"):
            self.db.commit()
            self.db.close()
            del self.db

    def __del__(self) -> None:
        """GC close (ROLLS BACK)."""
        if hasattr(self, "db"):
            self.db.rollback()
            self.db.close()
            del self.db

    # -- collections + indexes ----------------------------------------------------

    @property
    def messages(self) -> SqliteMessageCollection[TMessage]:
        return self._message_collection

    @property
    def semantic_refs(self) -> SqliteSemanticRefCollection:
        return self._semantic_ref_collection

    @property
    def semantic_ref_index(self) -> SqliteTermToSemanticRefIndex:
        return self._semref_index

    @property
    def property_index(self) -> SqlitePropertyIndex:
        return self._property_index

    @property
    def timestamp_index(self) -> SqliteTimestampToTextRangeIndex:
        return self._timestamp_index

    @property
    def message_text_index(self) -> SqliteMessageTextIndex:
        return self._message_text_index

    @property
    def related_terms_index(self) -> SqliteRelatedTermsIndex:
        return self._related_terms_index

    @property
    def conversation_threads(self) -> ConversationThreads:
        return self._conversation_threads

    # -- metadata --------------------------------------------------------------------

    async def get_conversation_metadata(self) -> ConversationMetadata:
        cursor = self.db.cursor()
        cursor.execute("SELECT key, value FROM ConversationMetadata")
        rows = cursor.fetchall()
        if not rows:
            return ConversationMetadata()
        metadata_dict: dict[str, list[str]] = {}
        for key, value in rows:
            metadata_dict.setdefault(key, []).append(value)

        def get_single(key: str) -> str | None:
            values = metadata_dict.get(key)
            if values is None:
                return None
            if len(values) > 1:
                raise ValueError(
                    f"Expected single value for key '{key}', got {len(values)}"
                )
            return values[0]

        def parse_datetime(value_str: str) -> datetime:
            if value_str.endswith("Z"):
                value_str = value_str[:-1] + "+00:00"
            try:
                return datetime.fromisoformat(value_str)
            except ValueError:
                return datetime.now(timezone.utc)

        schema_version_str = get_single("schema_version")
        created_at_str = get_single("created_at")
        updated_at_str = get_single("updated_at")
        standard_keys = {
            "name_tag", "schema_version", "created_at", "updated_at",
            "tag", "embedding_size", "embedding_name",
        }
        extra = {
            key: ", ".join(values)
            for key, values in metadata_dict.items()
            if key not in standard_keys
        }
        return ConversationMetadata(
            name_tag=get_single("name_tag"),
            schema_version=int(schema_version_str) if schema_version_str else None,
            created_at=parse_datetime(created_at_str) if created_at_str else None,
            updated_at=parse_datetime(updated_at_str) if updated_at_str else None,
            embedding_model=get_single("embedding_name"),
            tags=metadata_dict.get("tag"),
            extra=extra if extra else None,
        )

    async def set_conversation_metadata(self, **kwds: str | list[str] | None) -> None:
        set_conversation_metadata(self.db, **kwds)

    async def update_conversation_timestamps(
        self,
        created_at: datetime | None = None,
        updated_at: datetime | None = None,
    ) -> None:
        cursor = self.db.cursor()
        cursor.execute("SELECT 1 FROM ConversationMetadata LIMIT 1")
        if not cursor.fetchone():
            name_tag = self._metadata.name_tag if self._metadata else "conversation"
            actual_name = (
                self.message_text_index_settings.embedding_index_settings.embedding_model.model_name
            )
            metadata_kwds: dict[str, str | None] = {
                "name_tag": name_tag or "conversation",
                "schema_version": str(CONVERSATION_SCHEMA_VERSION),
                "embedding_name": actual_name,
            }
        else:
            metadata_kwds = {}
        if created_at is not None:
            metadata_kwds["created_at"] = format_timestamp_utc(created_at)
        if updated_at is not None:
            metadata_kwds["updated_at"] = format_timestamp_utc(updated_at)
        if metadata_kwds:
            set_conversation_metadata(self.db, **metadata_kwds)

    def get_db_version(self) -> int:
        return get_db_schema_version(self.db)

    # -- ingestion tracking ------------------------------------------------------------

    async def is_source_ingested(self, source_id: str) -> bool:
        cursor = self.db.cursor()
        cursor.execute(
            "SELECT status FROM IngestedSources WHERE source_id = ?", (source_id,)
        )
        row = cursor.fetchone()
        return row is not None and row[0] == STATUS_INGESTED

    async def are_sources_ingested(self, source_ids: list[str]) -> set[str]:
        if not source_ids:
            return set()
        cursor = self.db.cursor()
        result: set[str] = set()
        chunk_size = 500  # stay under SQLITE_MAX_VARIABLE_NUMBER
        for i in range(0, len(source_ids), chunk_size):
            chunk = source_ids[i : i + chunk_size]
            placeholders = ",".join("?" for _ in chunk)
            cursor.execute(
                f"SELECT source_id FROM IngestedSources "
                f"WHERE source_id IN ({placeholders}) AND status = ?",
                [*chunk, STATUS_INGESTED],
            )
            result.update(row[0] for row in cursor.fetchall())
        return result

    async def get_source_status(self, source_id: str) -> str | None:
        cursor = self.db.cursor()
        cursor.execute(
            "SELECT status FROM IngestedSources WHERE source_id = ?", (source_id,)
        )
        row = cursor.fetchone()
        return row[0] if row else None

    async def mark_source_ingested(
        self, source_id: str, status: str = STATUS_INGESTED
    ) -> None:
        self.db.cursor().execute(
            "INSERT OR REPLACE INTO IngestedSources (source_id, status) VALUES (?, ?)",
            (source_id, status),
        )

    async def mark_sources_ingested_batch(
        self, source_ids: list[str], status: str = STATUS_INGESTED
    ) -> None:
        if not source_ids:
            return
        self.db.cursor().executemany(
            "INSERT OR REPLACE INTO IngestedSources (source_id, status) VALUES (?, ?)",
            [(sid, status) for sid in source_ids],
        )

    # -- chunk-failure tracking ------------------------------------------------------------

    async def record_chunk_failure(
        self,
        message_ordinal: int,
        chunk_ordinal: int,
        error_class: str,
        error_message: str,
    ) -> None:
        failed_at = datetime.now(timezone.utc).isoformat()
        self.db.cursor().execute(
            "INSERT OR REPLACE INTO ChunkFailures "
            "(msg_id, chunk_ordinal, error_class, error_message, failed_at) "
            "VALUES (?, ?, ?, ?, ?)",
            (message_ordinal, chunk_ordinal, error_class, error_message, failed_at),
        )

    async def clear_chunk_failure(
        self, message_ordinal: int, chunk_ordinal: int
    ) -> None:
        self.db.cursor().execute(
            "DELETE FROM ChunkFailures WHERE msg_id = ? AND chunk_ordinal = ?",
            (message_ordinal, chunk_ordinal),
        )

    async def get_chunk_failures(self) -> list[ChunkFailure]:
        cursor = self.db.cursor()
        cursor.execute(
            "SELECT msg_id, chunk_ordinal, error_class, error_message, failed_at "
            "FROM ChunkFailures ORDER BY msg_id, chunk_ordinal"
        )
        return [
            ChunkFailure(
                message_ordinal=row[0],
                chunk_ordinal=row[1],
                error_class=row[2],
                error_message=row[3],
                failed_at=datetime.fromisoformat(row[4]),
            )
            for row in cursor.fetchall()
        ]
