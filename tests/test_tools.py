"""CLI tools driven in-process: ingest_email flow, query history, mbox dump."""

import json
import mailbox
import os

import pytest

from typeagent_tpu.models.adapters import create_test_embedding_model
from typeagent_tpu.tools.ingest_email import ingest_emails
from typeagent_tpu.tools.mail.dump_mbox import dump_mbox, safe_filename
from typeagent_tpu.tools.query import ConversationHistory

TESTDATA = os.path.join(os.path.dirname(__file__), "testdata")


async def test_ingest_emails_dedupes_and_filters(tmp_path, monkeypatch):
    # Offline embedding model for ConversationSettings() inside the tool.
    monkeypatch.setenv("OPENAI_EMBEDDING_MODEL", "test:16")
    mail_dir = tmp_path / "mail"
    mail_dir.mkdir()
    with open(os.path.join(TESTDATA, "sample.eml")) as f:
        sample = f.read()
    (mail_dir / "a.eml").write_text(sample)
    (mail_dir / "b.eml").write_text(
        sample.replace("<abc123@example.com>", "<def456@example.com>").replace(
            "06 May 2024", "06 May 2020"
        )
    )

    db = str(tmp_path / "mail.db")
    memory = await ingest_emails(
        str(mail_dir), dbname=db, auto_extract=False, after="2024-01-01"
    )
    # Date filter keeps only the 2024 message.
    assert await memory.messages.size() == 1
    await memory.storage_provider.close()

    # Second run: the remaining source is already ingested -> nothing added.
    memory2 = await ingest_emails(
        str(mail_dir), dbname=db, auto_extract=False, after="2024-01-01"
    )
    assert await memory2.messages.size() == 1
    await memory2.storage_provider.close()


def test_conversation_history_rolls_and_prompts():
    history = ConversationHistory(max_size=2)
    assert history.to_prompt_section() is None
    for i in range(4):
        history.add(f"q{i}", f"a{i}", True)
    assert [e.question for e in history.entries] == ["q2", "q3"]
    section = history.to_prompt_section()
    assert section["role"] == "system"
    assert "q3" in section["content"]
    history.clear()
    assert history.to_prompt_section() is None


def test_dump_mbox_roundtrip(tmp_path):
    box_path = str(tmp_path / "test.mbox")
    box = mailbox.mbox(box_path)
    for i in range(3):
        msg = mailbox.mboxMessage()
        msg["From"] = f"sender{i}@example.com"
        msg["To"] = "dest@example.com"
        msg["Subject"] = f"Message {i}"
        msg["Message-ID"] = f"<id-{i}@example.com>"
        msg.set_payload(f"Body of message {i}")
        box.add(msg)
    box.flush()

    out_dir = str(tmp_path / "eml")
    count = dump_mbox(box_path, out_dir)
    assert count == 3
    files = sorted(os.listdir(out_dir))
    assert len(files) == 3
    assert any("id-0_example.com" in f for f in files)
    content = open(os.path.join(out_dir, files[0])).read()
    assert "Subject:" in content

    # Duplicate messages are skipped by content hash.
    count = dump_mbox(box_path, str(tmp_path / "eml2"))
    assert count == 3


def test_safe_filename():
    assert safe_filename("<abc/def>", 0) == "abc_def.eml"
    assert safe_filename(None, 7) == "message_000007.eml"
    assert safe_filename("", 3) == "message_000003.eml"


async def test_stage_debug_commands(capsys):
    """@translate shows the SearchQuery JSON; @compile adds the expr tree;
    batch_loop routes @-commands instead of sending them to the LLM."""
    from tests.test_query_pipeline import build_conversation
    from typeagent_tpu.knowpro import searchlang
    from typeagent_tpu.models.adapters import FakeChatModel
    from typeagent_tpu.tools.query import QueryContext, handle_command

    conv = await build_conversation()
    search_query_json = json.dumps(
        {
            "searchExpressions": [
                {
                    "rewrittenQuery": "What did Bach write?",
                    "filters": [
                        {
                            "entitySearchTerms": [
                                {"name": "Bach", "isNamePronoun": False}
                            ]
                        }
                    ],
                }
            ]
        }
    )
    conv._query_translator = searchlang.create_search_query_translator(
        FakeChatModel([search_query_json, search_query_json])
    )
    context = QueryContext(conv)

    await handle_command(context, "@translate What did Bach write?")
    out = capsys.readouterr().out
    assert '"rewrittenQuery": "What did Bach write?"' in out
    assert '"name": "Bach"' in out

    await handle_command(context, "@compile What did Bach write?")
    out = capsys.readouterr().out
    assert "-- expr 0 select 0 --" in out
    assert "bach" in out.lower()

    await handle_command(context, "@translate")
    assert "usage" in capsys.readouterr().out


async def test_stage_3_and_4_commands(capsys):
    """@stage 3 shows materialized search results + the engine route taken
    (+ router EMA when auto-routing); @stage 4 adds the answer-context
    JSON. Fully offline: the stage-1 LLM is a canned FakeChatModel and no
    answer model is needed (stage 4 stops at the context)."""
    from tests.test_query_pipeline import build_conversation
    from typeagent_tpu.knowpro import searchlang
    from typeagent_tpu.models.adapters import FakeChatModel
    from typeagent_tpu.tools.query import QueryContext, handle_command

    conv = await build_conversation()
    search_query_json = json.dumps(
        {
            "searchExpressions": [
                {
                    "rewrittenQuery": "What did Bach write?",
                    "filters": [
                        {
                            "entitySearchTerms": [
                                {"name": "Bach", "isNamePronoun": False}
                            ]
                        }
                    ],
                }
            ]
        }
    )
    conv._query_translator = searchlang.create_search_query_translator(
        FakeChatModel([search_query_json, search_query_json])
    )
    context = QueryContext(conv)

    await handle_command(context, "@stage 3 What did Bach write?")
    out = capsys.readouterr().out
    assert "-- stage 1: SearchQuery --" in out
    assert "-- stage 2: expr 0 select 0 --" in out
    assert "-- stage 3: search results --" in out
    assert "engine route:" in out
    assert "semref matches" in out
    assert "messages:" in out
    assert "-- stage 4" not in out

    await handle_command(context, "@stage 4 What did Bach write?")
    out = capsys.readouterr().out
    assert "-- stage 4: answer context --" in out
    assert '"entities"' in out or '"messages"' in out

    await handle_command(context, "@stage 9 nope")
    assert "usage" in capsys.readouterr().out


async def test_batch_loop_routes_commands(tmp_path, capsys):
    from tests.test_query_pipeline import build_conversation
    from typeagent_tpu.tools.query import QueryContext, batch_loop

    conv = await build_conversation()
    batch = tmp_path / "cmds.txt"
    batch.write_text("@stats\n@search bach\n")
    out_file = str(tmp_path / "out.json")
    await batch_loop(QueryContext(conv), str(batch), out_file)
    out = capsys.readouterr().out
    assert "messages:" in out  # @search output, not an LLM error
    # Command lines produce no Q&A entries.
    assert json.load(open(out_file)) == []


def test_compare_evals_grid(tmp_path, capsys):
    from typeagent_tpu.tools.compare_evals import compare

    r1 = tmp_path / "r1.json"
    r2 = tmp_path / "r2.json"
    r1.write_text(json.dumps([
        {"question": "Q1", "answer": "A", "hasNoAnswer": False},
        {"question": "Q2", "answer": "nope", "hasNoAnswer": True},
    ]))
    r2.write_text(json.dumps([
        {"question": "Q1", "answer": "A changed", "hasNoAnswer": False},
    ]))
    compare([str(r1), str(r2)], color=False)
    out = capsys.readouterr().out
    assert "✓ diff" in out        # answer changed between runs
    assert "no-ans" in out        # unanswered flagged
    assert "N/A" in out           # missing question flagged
    assert "all-answered rows: 0" in out


async def test_chat_sessions_parse_and_ingest(tmp_path, monkeypatch):
    from typeagent_tpu.tools.chat_sessions import (
        ingest_session, parse_session, session_to_messages)

    session_file = tmp_path / "s.json"
    session_file.write_text(json.dumps({
        "sessionId": "sess-1",
        "customTitle": "t",
        "creationDate": 1723800000000,
        "requests": [
            {"message": {"text": "hello there"},
             "timestamp": 1723800001000,
             "response": [
                 {"kind": "thinking", "value": "SECRET"},
                 {"value": "general kenobi"},
                 {"kind": "toolInvocationSerialized", "toolId": "x"},
             ]},
        ],
    }))
    session = parse_session(session_file)
    assert session["turns"][0]["assistant"] == "general kenobi"
    assert "SECRET" not in json.dumps(session)  # thinking excluded
    messages = session_to_messages(session)
    assert [m.metadata.speaker for m in messages] == ["user", "assistant"]
    assert messages[0].source_id == "sess-1#0.user"
    assert messages[0].timestamp.endswith("Z")

    monkeypatch.setenv("OPENAI_EMBEDDING_MODEL", "test:16")
    db = str(tmp_path / "chat.db")
    await ingest_session(session, db, None)
    await ingest_session(session, db, None)  # dedupe by source_id
    import sqlite3

    con = sqlite3.connect(db)
    assert con.execute("SELECT COUNT(*) FROM Messages").fetchone()[0] == 2
    con.close()


def test_chat_sessions_rejects_non_sessions(tmp_path):
    from typeagent_tpu.tools.chat_sessions import parse_session

    bad = tmp_path / "bad.json"
    bad.write_text("{not json")
    assert parse_session(bad) is None
    other = tmp_path / "other.json"
    other.write_text(json.dumps({"something": "else"}))
    assert parse_session(other) is None


# ---------------------------------------------------------------------------
# Gmail / Outlook dumpers (REST over mocked transports)
# ---------------------------------------------------------------------------

EML_A = (
    b"From: alice@example.com\r\nTo: bob@example.com\r\n"
    b"Subject: quarterly report\r\nMessage-ID: <a1@example.com>\r\n\r\n"
    b"Numbers are up.\r\n"
)
EML_B = (
    b"From: carol@example.com\r\nTo: bob@example.com\r\n"
    b"Subject: lunch\r\nMessage-ID: <b2@example.com>\r\n\r\nNoodles?\r\n"
)


def test_dump_gmail_roundtrip(tmp_path):
    import base64

    import httpx

    from typeagent_tpu.emails.email_import import import_email_from_file
    from typeagent_tpu.tools.mail.dump_gmail import dump_gmail

    pages = {
        None: {
            "messages": [{"id": "m1"}],
            "nextPageToken": "p2",
        },
        "p2": {"messages": [{"id": "m2"}]},
    }
    raws = {"m1": EML_A, "m2": EML_B}

    def handler(request):
        if request.url.path.endswith("/messages"):
            token = request.url.params.get("pageToken")
            assert request.url.params.get("q") == "from:alice"
            assert request.headers["Authorization"] == "Bearer tok"
            return httpx.Response(200, json=pages[token])
        message_id = request.url.path.rsplit("/", 1)[-1]
        assert request.url.params["format"] == "raw"
        raw = base64.urlsafe_b64encode(raws[message_id]).decode().rstrip("=")
        return httpx.Response(200, json={"id": message_id, "raw": raw})

    client = httpx.Client(transport=httpx.MockTransport(handler))
    out = tmp_path / "gmail"
    count = dump_gmail(
        str(out), max_results=10, query="from:alice", access_token="tok",
        client=client,
    )
    assert count == 2
    msg = import_email_from_file(str(out / "m1.eml"))
    assert msg.metadata.sender == "alice@example.com"
    assert msg.metadata.subject == "quarterly report"
    msg2 = import_email_from_file(str(out / "m2.eml"))
    assert msg2.metadata.sender == "carol@example.com"


def test_dump_gmail_token_refresh(tmp_path):
    import json

    import httpx

    from typeagent_tpu.tools.mail.dump_gmail import resolve_access_token

    creds_dir = tmp_path / "creds"
    creds_dir.mkdir()
    (creds_dir / "token.json").write_text(
        json.dumps(
            {
                "refresh_token": "rt",
                "client_id": "cid",
                "client_secret": "cs",
            }
        )
    )

    def handler(request):
        assert request.url.host == "oauth2.googleapis.com"
        body = dict(
            pair.split("=") for pair in request.content.decode().split("&")
        )
        assert body["grant_type"] == "refresh_token"
        assert body["refresh_token"] == "rt"
        return httpx.Response(
            200, json={"access_token": "fresh-tok", "expires_in": 1200}
        )

    client = httpx.Client(transport=httpx.MockTransport(handler))
    token = resolve_access_token(None, str(creds_dir), client)
    assert token == "fresh-tok"
    # Cached into the file; a second resolve skips the network.
    cached = json.loads((creds_dir / "token.json").read_text())
    assert cached["access_token"] == "fresh-tok"
    token2 = resolve_access_token(None, str(creds_dir), None)  # no client
    assert token2 == "fresh-tok"


def test_dump_outlook_roundtrip(tmp_path):
    import httpx

    from typeagent_tpu.emails.email_import import import_email_from_file
    from typeagent_tpu.tools.mail.dump_outlook import dump_outlook

    raws = {"AAA-1": EML_A, "BBB=2": EML_B}

    def handler(request):
        if request.url.path.endswith("/$value"):
            message_id = httpx.URL(str(request.url)).path.split("/")[-2]
            import urllib.parse

            return httpx.Response(
                200, content=raws[urllib.parse.unquote(message_id)]
            )
        assert request.url.path.endswith("/me/messages")
        assert request.url.params["$filter"] == "isRead eq false"
        if "$skiptoken" in str(request.url):
            return httpx.Response(200, json={"value": [{"id": "BBB=2"}]})
        return httpx.Response(
            200,
            json={
                "value": [{"id": "AAA-1"}],
                "@odata.nextLink": str(request.url) + "&$skiptoken=x",
            },
        )

    client = httpx.Client(transport=httpx.MockTransport(handler))
    out = tmp_path / "outlook"
    count = dump_outlook(
        str(out),
        max_results=5,
        filter="isRead eq false",
        access_token="tok",
        client=client,
    )
    assert count == 2
    files = sorted(p.name for p in out.iterdir())
    assert files == ["AAA-1.eml", "BBB_2.eml"]  # ids sanitized
    msg = import_email_from_file(str(out / "AAA-1.eml"))
    assert msg.metadata.subject == "quarterly report"


def test_outlook_device_code_flow():
    import httpx

    from typeagent_tpu.tools.mail.dump_outlook import DeviceCodeAuth

    polls = {"n": 0}

    def handler(request):
        if request.url.path.endswith("/devicecode"):
            return httpx.Response(
                200,
                json={
                    "device_code": "dc",
                    "user_code": "ABCD-EFGH",
                    "verification_uri": "https://microsoft.com/devicelogin",
                    "interval": 0,
                    "expires_in": 900,
                },
            )
        polls["n"] += 1
        if polls["n"] < 3:
            return httpx.Response(
                400, json={"error": "authorization_pending"}
            )
        return httpx.Response(200, json={"access_token": "graph-tok"})

    client = httpx.Client(transport=httpx.MockTransport(handler))
    auth = DeviceCodeAuth("app-id", client=client, sleeper=lambda s: None)
    assert auth.acquire_token() == "graph-tok"
    assert polls["n"] == 3


def test_query_batch_golden_compare(tmp_path, capsys):
    from typeagent_tpu.tools.query import compare_results

    golden = [
        {"question": "Q1?", "answer": "The answer is A."},
        {"question": "Q2?", "answer": "B"},
        {"question": "Q3?", "answer": "never asked"},
    ]
    golden_file = tmp_path / "golden.json"
    golden_file.write_text(json.dumps(golden))

    results = [
        {"question": "Q1?", "answer": "The  answer is   A."},  # ws-insensitive
        {"question": "Q2?", "answer": "C"},  # mismatch
        {"question": "Q4?", "answer": "extra"},  # not in golden
    ]
    mismatches = compare_results(results, str(golden_file))
    out = capsys.readouterr().out
    assert mismatches == 3  # Q2 diff + Q4 extra + Q3 missing
    assert "ok: Q1?" in out
    assert "MISMATCH: Q2?" in out and "-B" in out and "+C" in out
    assert "EXTRA" in out and "MISSING" in out

    # A clean run is a clean exit.
    assert compare_results([{"question": "Q1?", "answer": "The answer is A."},
                            {"question": "Q2?", "answer": "B"},
                            {"question": "Q3?", "answer": "never asked"}],
                           str(golden_file)) == 0


def test_gmail_cached_token_respects_short_expiry(tmp_path):
    """A short server-reported expires_in must not be outlived by the cache."""
    import httpx
    import time as time_mod

    from typeagent_tpu.tools.mail.dump_gmail import resolve_access_token

    creds_dir = tmp_path / "creds"
    creds_dir.mkdir()
    (creds_dir / "token.json").write_text(
        json.dumps(
            {"refresh_token": "rt", "client_id": "cid", "client_secret": "cs"}
        )
    )
    calls = {"n": 0}

    def handler(request):
        calls["n"] += 1
        return httpx.Response(
            200,
            json={"access_token": f"tok-{calls['n']}", "expires_in": 200},
        )

    client = httpx.Client(transport=httpx.MockTransport(handler))
    token = resolve_access_token(None, str(creds_dir), client)
    assert token == "tok-1"
    # expires_in 200 with a 300s safety margin -> never cached as valid:
    # the next resolve refreshes again instead of serving a stale token.
    token2 = resolve_access_token(None, str(creds_dir), client)
    assert token2 == "tok-2"
    assert calls["n"] == 2


def test_outlook_safe_name_no_collisions_on_long_ids():
    from typeagent_tpu.tools.mail.dump_outlook import _safe_name

    prefix = "AAMkAD" + "x" * 140
    a = _safe_name(prefix + "AAA=")
    b = _safe_name(prefix + "BBB=")
    assert a != b
    assert len(a) <= 120 and len(b) <= 120
    short = _safe_name("simple-id")
    assert short == "simple-id"


def test_print_timestamps_hex(tmp_path, capsys):
    from typeagent_tpu.tools.mail.print_timestamps import hex_timestamp, main
    import sys

    ts = hex_timestamp("Mon, 06 May 2024 10:30:00 +0000")
    assert len(ts) == 16 and int(ts, 16) == 1714991400000 << 20
    assert hex_timestamp(None) == "????????"
    assert hex_timestamp("not a date") == "????????"

    eml = tmp_path / "m.eml"
    eml.write_text("Date: Mon, 06 May 2024 10:30:00 +0000\n\nbody\n")
    old_argv = sys.argv
    sys.argv = ["pt", str(eml)]
    try:
        main()
    finally:
        sys.argv = old_argv
    out = capsys.readouterr().out
    assert ts in out and str(eml) in out


async def test_batch_search_results_record_and_compare(tmp_path, capsys):
    """--search-results records stage-3 ordinals + the stage-1 SearchQuery;
    --compare-search diffs a later run against the recording with set
    semantics (reference driver's --search-results flow)."""
    import json as _json

    from tests.test_conversation import FakeExtractor, make_settings, msg
    from typeagent_tpu.knowpro import answers, searchlang
    from typeagent_tpu.knowpro.factory import create_conversation
    from typeagent_tpu.knowpro.universal_message import ConversationMessage
    from typeagent_tpu.models.adapters import FakeChatModel
    from typeagent_tpu.tools.query import QueryContext, batch_loop

    async def build():
        conv = await create_conversation(
            None, ConversationMessage, settings=make_settings(FakeExtractor())
        )
        await conv.add_messages_with_indexing(
            [msg("Bach wrote the Goldberg Variations", ts="2024-01-01T10:00:00Z")]
        )
        search_query_json = _json.dumps(
            {
                "searchExpressions": [
                    {
                        "rewrittenQuery": "What did Bach write?",
                        "filters": [
                            {"searchTerms": ["Bach", "Goldberg Variations"]}
                        ],
                    }
                ]
            }
        )
        answer_json = _json.dumps({"type": "Answered", "answer": "The Variations."})
        conv._query_translator = searchlang.create_search_query_translator(
            FakeChatModel([search_query_json])
        )
        conv._answer_translator = answers.create_answer_translator(
            FakeChatModel([answer_json])
        )
        return conv

    batch = tmp_path / "q.txt"
    batch.write_text("What did Bach write?\n")
    recording = tmp_path / "search.json"

    failures = await batch_loop(
        QueryContext(await build()),
        str(batch),
        None,
        search_results_file=str(recording),
    )
    assert failures == 0
    recorded = _json.loads(recording.read_text())
    assert recorded[0]["question"] == "What did Bach write?"
    sets = recorded[0]["searchResults"]
    assert sets and sets[0]["messageMatches"] == [0]
    assert "entityMatches" in sets[0] or "topicMatches" in sets[0]
    assert recorded[0]["searchQuery"]["searchExpressions"]

    # A fresh identical run compares clean against the recording.
    failures = await batch_loop(
        QueryContext(await build()),
        str(batch),
        None,
        compare_search_file=str(recording),
    )
    assert failures == 0
    assert "all match" in capsys.readouterr().out

    # Tampered golden produces a list diff and a nonzero count.
    tampered = _json.loads(recording.read_text())
    tampered[0]["searchResults"][0]["messageMatches"] = [41]
    bad = tmp_path / "bad.json"
    bad.write_text(_json.dumps(tampered))
    failures = await batch_loop(
        QueryContext(await build()), str(batch), None, compare_search_file=str(bad)
    )
    assert failures == 1
    out = capsys.readouterr().out
    assert "MISMATCH" in out and "-[41]" in out


async def test_doctor_healthy_and_corrupted(tmp_path):
    """The index doctor passes a healthy store and flags dangling postings,
    bad timestamps, and out-of-range semref ordinals in a corrupted one."""
    import sqlite3

    from tests.test_conversation import FakeExtractor, make_settings, msg
    from typeagent_tpu.knowpro.factory import create_conversation
    from typeagent_tpu.knowpro.universal_message import ConversationMessage
    from typeagent_tpu.tools.doctor import check_conversation

    db_path = str(tmp_path / "doc.db")
    conv = await create_conversation(
        db_path, ConversationMessage, settings=make_settings(FakeExtractor())
    )
    await conv.add_messages_with_indexing(
        [
            msg("Bach wrote the Goldberg Variations", ts="2024-01-01T10:00:00Z"),
            msg("Gould recorded them twice", ts="2024-01-02T10:00:00Z"),
        ]
    )
    report = await check_conversation(conv)
    assert report.failures == 0, report.checks
    names = [name for name, _, _ in report.checks]
    assert "semref-index postings resolve" in names
    assert "property-index postings resolve" in names
    await conv.storage_provider.close()

    # Corrupt: dangling posting + unparseable timestamp.
    db = sqlite3.connect(db_path)
    db.execute(
        "INSERT INTO SemanticRefIndex(term, semref_id) VALUES ('phantom', 999)"
    )
    db.execute("UPDATE Messages SET start_timestamp='nope' WHERE msg_id=0")
    db.commit()
    db.close()

    conv2 = await create_conversation(
        db_path, ConversationMessage, settings=make_settings(FakeExtractor())
    )
    report = await check_conversation(conv2)
    failed = {name for name, ok, _ in report.checks if not ok}
    assert "semref-index postings resolve" in failed
    assert "timestamps ISO-8601 & non-decreasing" in failed
    assert report.failures >= 2


async def test_doctor_json_snapshot_mode(tmp_path):
    """The doctor also checks JSON+bin snapshots (the -i load path)."""
    from typeagent_tpu.knowpro.convsettings import ConversationSettings
    from typeagent_tpu.models.adapters import create_test_embedding_model
    from typeagent_tpu.podcasts.podcast import Podcast
    from typeagent_tpu.podcasts.podcast_ingest import ingest_podcast
    from typeagent_tpu.tools.doctor import check_conversation

    fixture = os.path.join(
        os.path.dirname(__file__), "testdata", "mini_podcast.txt"
    )
    settings = ConversationSettings(model=create_test_embedding_model(16))
    settings.semantic_ref_index_settings.auto_extract_knowledge = False
    pod = await ingest_podcast(fixture, settings)
    prefix = str(tmp_path / "snap")
    await pod.write_to_file(prefix)

    settings2 = ConversationSettings(model=create_test_embedding_model(16))
    reloaded = await Podcast.read_from_file(prefix, settings2)
    report = await check_conversation(reloaded)
    assert report.failures == 0, report.checks
