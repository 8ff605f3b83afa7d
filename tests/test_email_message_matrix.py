"""EmailMessage metadata-knowledge matrix.

Reference parity: /root/reference/tests/test_email_message.py — which
entities/actions/topics an email's headers generate (display-name entities
carry an email_address facet; bare addresses become email_address/alias
entities; sent/received action pairs per recipient with object='email').
"""

from typeagent_tpu.emails.email_message import EmailMessage, EmailMessageMeta


def meta(**kw):
    defaults = dict(sender="Alice Johnson <alice@example.com>", recipients=["bob@example.com"])
    defaults.update(kw)
    return EmailMessageMeta(**defaults)


def entity_names(knowledge):
    return {e.name for e in knowledge.entities}


class TestHeaderEntities:
    def test_display_name_entity_has_email_facet(self):
        k = meta().get_knowledge()
        alice = next(e for e in k.entities if e.name == "Alice Johnson")
        assert alice.type == ["person"]
        assert alice.facets and alice.facets[0].name == "email_address"
        assert alice.facets[0].value == "alice@example.com"

    def test_bare_address_entity(self):
        k = meta().get_knowledge()
        addr = next(e for e in k.entities if e.name == "alice@example.com")
        assert addr.type == ["email_address", "alias"]

    def test_plain_address_no_person_entity(self):
        k = meta(sender="plain@example.com").get_knowledge()
        assert "plain@example.com" in entity_names(k)
        assert not any(e.type == ["person"] and "plain" in e.name for e in k.entities)

    def test_display_name_only_treated_as_address(self):
        # parseaddr("Alice") -> ("", "Alice"): becomes an address-style
        # entity, not a person (reference test_email_message.py:62-68).
        k = meta(sender="Alice", recipients=[]).get_knowledge()
        alice = next(e for e in k.entities if e.name == "Alice")
        assert alice.type == ["email_address", "alias"]

    def test_cc_and_bcc_entities_included(self):
        k = meta(
            cc=["Carol <carol@example.com>"], bcc=["dave@example.com"]
        ).get_knowledge()
        names = entity_names(k)
        assert "Carol" in names and "carol@example.com" in names
        assert "dave@example.com" in names

    def test_email_message_entity_always_present(self):
        k = meta().get_knowledge()
        assert any(e.name == "email" and "message" in e.type for e in k.entities) or (
            "email" in entity_names(k)
        )


class TestHeaderActions:
    def test_sent_and_received_pairs(self):
        k = meta().get_knowledge()
        verbs = [v for a in k.actions for v in a.verbs]
        assert verbs.count("sent") >= 1 and verbs.count("received") >= 1

    def test_action_shape_subject_object_indirect(self):
        k = meta().get_knowledge()
        sent = next(a for a in k.actions if a.verbs == ["sent"])
        assert sent.object_entity_name == "email"
        assert sent.subject_entity_name in ("Alice Johnson", "alice@example.com")
        assert sent.indirect_object_entity_name == "bob@example.com"
        assert sent.verb_tense == "past"

    def test_name_form_cross_product(self):
        # sender has display+address (2 forms) x recipient 1 form = 2 'sent'
        k = meta().get_knowledge()
        sent = [a for a in k.actions if a.verbs == ["sent"]]
        assert {a.subject_entity_name for a in sent} == {
            "Alice Johnson",
            "alice@example.com",
        }

    def test_no_recipients_no_actions(self):
        k = meta(recipients=[]).get_knowledge()
        assert k.actions == []

    def test_multiple_recipients_multiply_actions(self):
        k1 = meta().get_knowledge()
        k2 = meta(recipients=["bob@example.com", "eve@example.com"]).get_knowledge()
        assert len(k2.actions) == 2 * len(k1.actions)


class TestTopicsAndBody:
    def test_subject_becomes_topic(self):
        k = meta(subject="Quarterly report").get_knowledge()
        assert k.topics == ["Quarterly report"]

    def test_no_subject_no_topics(self):
        assert meta().get_knowledge().topics == []

    def test_add_content_appends_to_first_chunk(self):
        msg = EmailMessage(text_chunks=["hello "], metadata=meta())
        msg.add_content("world")
        assert msg.text_chunks == ["hello world"]

    def test_add_content_creates_chunk_when_empty(self):
        msg = EmailMessage(text_chunks=[], metadata=meta())
        msg.add_content("body")
        assert msg.text_chunks == ["body"]

    def test_add_timestamp(self):
        msg = EmailMessage(text_chunks=["x"], metadata=meta())
        msg.add_timestamp("2024-05-06T10:30:00Z")
        assert msg.timestamp == "2024-05-06T10:30:00Z"

    def test_serialize_round_trip(self):
        msg = EmailMessage(
            text_chunks=["body"],
            metadata=meta(subject="Hi"),
            timestamp="2024-05-06T10:30:00Z",
            source_id="<id@x>",
        )
        data = msg.serialize()
        restored = EmailMessage.deserialize(data)
        assert restored.text_chunks == ["body"]
        assert restored.metadata.sender == msg.metadata.sender
        assert restored.metadata.subject == "Hi"
        assert restored.timestamp == msg.timestamp
        assert restored.source_id == "<id@x>"
