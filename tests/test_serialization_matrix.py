"""File-format matrix: sidecar splitting, header validation, typed
(de)serialization errors.

Reference parity: /root/reference/tests/test_serialization.py (header
version checks, embedding sidecar split/reassembly, knowledge deserialize
per type, error paths).
"""

import numpy as np
import pytest

from typeagent_tpu.knowpro import kplib, serialization
from typeagent_tpu.knowpro.interfaces import Tag, TextLocation, Topic
from typeagent_tpu.knowpro.serialization import (
    ConversationBinaryData,
    ConversationFileData,
    DeserializationError,
    deserialize_knowledge,
    deserialize_object,
    from_conversation_file_data,
    read_conversation_data_from_file,
    serialize_object,
    to_conversation_file_data,
    write_conversation_data_to_file,
)


def make_data(related_emb=None, message_emb=None):
    data = dict(nameTag="conv", messages=[], tags=["t1"], semanticRefs=[])
    if related_emb is not None:
        data["relatedTermsIndexData"] = {
            "textEmbeddingData": {
                "textItems": [f"w{i}" for i in range(len(related_emb))],
                "embeddings": related_emb,
            }
        }
    if message_emb is not None:
        data["messageIndexData"] = {
            "indexData": {"textLocations": [], "embeddings": message_emb}
        }
    return data


def emb(n, d=4, seed=0):
    return np.random.default_rng(seed).standard_normal((n, d)).astype(np.float32)


# ---------------------------------------------------------------------------
# to_conversation_file_data: sidecar split
# ---------------------------------------------------------------------------


class TestSidecarSplit:
    def test_file_header_stamped(self):
        fd = to_conversation_file_data(make_data())
        assert fd["jsonData"]["fileHeader"] == {"version": "0.1"}

    def test_both_embedding_blocks_split_in_order(self):
        rel, msg = emb(3, seed=1), emb(5, seed=2)
        fd = to_conversation_file_data(make_data(rel, msg))
        header = fd["jsonData"]["embeddingFileHeader"]
        assert header["relatedCount"] == 3
        assert header["messageCount"] == 5
        assert header["modelMetadata"] == {"embeddingSize": 4}
        # related first, then message embeddings
        lst = fd["binaryData"]["embeddingsList"]
        assert len(lst) == 2
        np.testing.assert_array_equal(lst[0], rel)
        np.testing.assert_array_equal(lst[1], msg)
        # embeddings removed from the JSON tree
        assert (
            fd["jsonData"]["relatedTermsIndexData"]["textEmbeddingData"]["embeddings"]
            is None
        )
        assert fd["jsonData"]["messageIndexData"]["indexData"]["embeddings"] is None

    def test_no_embeddings_yields_empty_sidecar(self):
        fd = to_conversation_file_data(make_data())
        assert fd["binaryData"]["embeddingsList"] == []
        assert "modelMetadata" not in fd["jsonData"]["embeddingFileHeader"]


# ---------------------------------------------------------------------------
# from_conversation_file_data: validation + reassembly
# ---------------------------------------------------------------------------


def file_data(json_data, embeddings=None):
    return ConversationFileData(
        jsonData=json_data,
        binaryData=ConversationBinaryData(
            embeddingsList=[embeddings] if embeddings is not None else []
        ),
    )


class TestFromFileData:
    def test_missing_file_header_raises(self):
        jd = make_data()
        jd["embeddingFileHeader"] = {}
        with pytest.raises(DeserializationError, match="file header"):
            from_conversation_file_data(file_data(jd))

    def test_bad_version_raises(self):
        jd = make_data()
        jd["fileHeader"] = {"version": "9.9"}
        jd["embeddingFileHeader"] = {}
        with pytest.raises(DeserializationError, match="version"):
            from_conversation_file_data(file_data(jd))

    def test_missing_embedding_header_raises(self):
        jd = make_data()
        jd["fileHeader"] = {"version": "0.1"}
        with pytest.raises(DeserializationError, match="embedding file header"):
            from_conversation_file_data(file_data(jd))

    def test_multiple_embedding_arrays_raises(self):
        jd = make_data()
        jd["fileHeader"] = {"version": "0.1"}
        jd["embeddingFileHeader"] = {}
        fd = ConversationFileData(
            jsonData=jd,
            binaryData=ConversationBinaryData(embeddingsList=[emb(1), emb(1)]),
        )
        with pytest.raises(ValueError, match="length 1"):
            from_conversation_file_data(fd)

    def test_empty_success(self):
        jd = make_data()
        jd["fileHeader"] = {"version": "0.1"}
        jd["embeddingFileHeader"] = {}
        out = from_conversation_file_data(file_data(jd))
        assert out["nameTag"] == "conv"

    def test_slices_reassigned_at_offsets(self):
        rel, msg = emb(2, seed=3), emb(4, seed=4)
        fd = to_conversation_file_data(make_data(rel, msg))
        flat = np.concatenate(fd["binaryData"]["embeddingsList"])
        out = from_conversation_file_data(file_data(fd["jsonData"], flat))
        np.testing.assert_array_equal(
            out["relatedTermsIndexData"]["textEmbeddingData"]["embeddings"], rel
        )
        np.testing.assert_array_equal(
            out["messageIndexData"]["indexData"]["embeddings"], msg
        )

    def test_count_overrun_raises(self):
        rel = emb(3, seed=5)
        fd = to_conversation_file_data(make_data(rel))
        truncated = fd["binaryData"]["embeddingsList"][0][:2]
        with pytest.raises(DeserializationError, match="Expected 3"):
            from_conversation_file_data(file_data(fd["jsonData"], truncated))


# ---------------------------------------------------------------------------
# Full write/read file round-trip
# ---------------------------------------------------------------------------


class TestFileRoundTrip:
    def test_embeddings_bitwise_preserved(self, tmp_path):
        rel, msg = emb(3, seed=6), emb(2, seed=7)
        base = str(tmp_path / "conv")
        write_conversation_data_to_file(make_data(rel, msg), base)
        out = read_conversation_data_from_file(base)
        np.testing.assert_array_equal(
            out["relatedTermsIndexData"]["textEmbeddingData"]["embeddings"], rel
        )
        np.testing.assert_array_equal(
            out["messageIndexData"]["indexData"]["embeddings"], msg
        )

    def test_no_embeddings_writes_json_only(self, tmp_path):
        base = str(tmp_path / "plain")
        write_conversation_data_to_file(make_data(), base)
        import os

        assert os.path.exists(base + "_data.json")
        assert not os.path.exists(base + "_embeddings.bin")
        out = read_conversation_data_from_file(base)
        assert out["tags"] == ["t1"]

    def test_explicit_embedding_size_override(self, tmp_path):
        rel = emb(3, d=8, seed=8)
        base = str(tmp_path / "dim8")
        write_conversation_data_to_file(make_data(rel), base)
        out = read_conversation_data_from_file(base, embedding_size=8)
        got = out["relatedTermsIndexData"]["textEmbeddingData"]["embeddings"]
        assert got.shape == (3, 8)


# ---------------------------------------------------------------------------
# Typed object (de)serialization
# ---------------------------------------------------------------------------


class TestObjectSerialization:
    def test_none_passes_through(self):
        assert serialize_object(None) is None

    def test_non_pydantic_raises_type_error(self):
        with pytest.raises(TypeError, match="Pydantic dataclass"):
            serialize_object({"plain": "dict"})

    def test_deserialize_validation_error_wrapped(self):
        with pytest.raises(DeserializationError, match="Validation failed"):
            deserialize_object(TextLocation, {"messageOrdinal": "not an int!"})

    def test_deserialize_union_with_none(self):
        assert deserialize_object(int | None, None) is None
        assert deserialize_object(int | None, 5) == 5

    def test_deserialize_list_of_int(self):
        assert deserialize_object(list[int], [1, 2, 3]) == [1, 2, 3]
        with pytest.raises(DeserializationError):
            deserialize_object(list[int], ["a"])


KNOWLEDGE_CASES = [
    (
        "entity",
        {"name": "Bach", "type": ["person"], "facets": None},
        kplib.ConcreteEntity,
    ),
    (
        "action",
        {
            "verbs": ["compose"],
            "verbTense": "past",
            "subjectEntityName": "Bach",
            "objectEntityName": "fugue",
            "indirectObjectEntityName": "none",
        },
        kplib.Action,
    ),
    ("topic", {"text": "music"}, Topic),
    ("tag", {"text": "history"}, Tag),
]


class TestDeserializeKnowledge:
    @pytest.mark.parametrize("ktype,data,cls", KNOWLEDGE_CASES)
    def test_each_type(self, ktype, data, cls):
        obj = deserialize_knowledge(ktype, data)
        assert isinstance(obj, cls)
        assert obj.knowledge_type == ktype

    def test_unknown_type_raises(self):
        with pytest.raises(KeyError):
            deserialize_knowledge("nonsense", {})
